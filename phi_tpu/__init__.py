"""PHI-TPU: TPU-native pangenome haplotype inference.

A from-scratch JAX/XLA implementation with the capabilities of at-cg/PHI
(see /root/reference): GFA/VCF pangenome graph ingest, minimizer sketching,
anchor matching, and an exact expanded-graph path solver that replaces the
reference's Gurobi ILP/IQP with parallel prefix-min relaxation sweeps.
"""

__version__ = "0.1.0"


def _tune_malloc() -> None:
    """Keep large allocations on the reusable heap instead of per-block
    mmaps. The pipeline's hot host phases (spectrum dedup, anchor tables,
    credit arrays) churn through 50-200 MB numpy temporaries; glibc serves
    those via mmap and munmaps them on free, so every round re-faults every
    page — and on virtualized hosts a fault storm can cost 10-60x the
    compute itself. Raising the mmap threshold (and disabling trim) makes
    freed blocks reusable: the fault cost is paid once per high-water mark.
    Best-effort; only meaningful on glibc/Linux."""
    import ctypes
    import sys
    if not sys.platform.startswith("linux"):
        return
    try:
        libc = ctypes.CDLL(None)
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, -1)       # M_TRIM_THRESHOLD
    except Exception:
        pass


_tune_malloc()

# Backend hardening: only when the remote-TPU plugin is present (then
# sitecustomize already imported jax, so this costs nothing; elsewhere the
# gate keeps `import phi_tpu` jax-free).
from phi_tpu.backend import _plugin_present as _bk_plugin_present  # noqa: E402
if _bk_plugin_present():
    from phi_tpu.backend import configure_backend as _configure_backend
    _configure_backend()

from phi_tpu.config import Options  # noqa: F401,E402
