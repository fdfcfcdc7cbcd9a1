"""PHI-TPU: TPU-native pangenome haplotype inference.

A from-scratch JAX/XLA implementation with the capabilities of at-cg/PHI
(see /root/reference): GFA/VCF pangenome graph ingest, minimizer sketching,
anchor matching, and an exact expanded-graph path solver that replaces the
reference's Gurobi ILP/IQP with parallel prefix-min relaxation sweeps.
"""

__version__ = "0.1.0"

from phi_tpu.config import Options  # noqa: F401
