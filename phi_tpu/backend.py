"""Backend selection hardening: honor user platform intent, never hang
on a dead remote-TPU tunnel.

This deployment registers a remote-TPU ("axon") PJRT plugin from
``sitecustomize`` at interpreter start whenever ``PALLAS_AXON_POOL_IPS``
is set, and that registration clobbers ``jax_platforms`` to
``"axon,cpu"`` — even when the user explicitly exported
``JAX_PLATFORMS=cpu``. The first jax backend initialization then dials
the remote tunnel, which blocks for minutes when the tunnel is dead
(observed 36–151 s sleeps on runs that wanted the CPU backend).

:func:`configure_backend` runs once, on ``import phi_tpu`` (gated on
the plugin env actually being present, so it costs nothing elsewhere):

1. If the user's ``JAX_PLATFORMS`` excludes the remote plugin, re-apply
   it over the sitecustomize clobber — a CPU-intent run never dials.
2. Otherwise TCP-probe the tunnel relay with a bounded timeout and fall
   back to CPU (with a ``[W::]`` line) if the relay is unreachable.

Reference robustness posture: fail fast with a clear message instead of
hanging (main.cpp:102-105 prints ``[E::main]`` and exits on bad input).

Env knobs:
  PHI_TPU_AXON_PROBE_PORT     relay port to probe [8083]
  PHI_TPU_AXON_PROBE_TIMEOUT  connect timeout seconds [2.0]
  PHI_TPU_NO_BACKEND_PROBE=1  skip the probe (trust the tunnel)
"""

from __future__ import annotations

import os
import socket
import sys

_configured = False
_effective: str | None = None


def effective_platforms() -> str | None:
    """The platform list configure_backend() settled on (None = jax
    defaults untouched)."""
    return _effective


def _plugin_present() -> bool:
    """True when the remote plugin is (or will be) registered in this
    process. The env var alone is not enough: sitecustomize runs at
    interpreter start, so a program that clears PALLAS_AXON_POOL_IPS
    afterwards still has the plugin registered (and AXON_COMPAT_VERSION /
    PJRT_LIBRARY_PATH exported by register())."""
    import sys
    return bool(os.environ.get("PALLAS_AXON_POOL_IPS")
                or os.environ.get("AXON_COMPAT_VERSION")
                or ("axon" in os.environ.get("PJRT_LIBRARY_PATH", "")
                    and "jax" in sys.modules))


def _probe_relay() -> bool:
    """Bounded TCP connect to the tunnel relay. True = reachable."""
    host = os.environ.get("AXON_POOL_SVC_OVERRIDE") \
        or os.environ.get("PALLAS_AXON_POOL_IPS", "").split(",")[0]
    if not host:
        return False
    port = int(os.environ.get("PHI_TPU_AXON_PROBE_PORT", "8083"))
    timeout = float(os.environ.get("PHI_TPU_AXON_PROBE_TIMEOUT", "2"))
    try:
        with socket.create_connection((host, port), timeout=timeout):
            return True
    except OSError:
        return False


def configure_backend() -> str | None:
    """Idempotent; safe to call before any jax device use. Returns the
    effective jax_platforms string (None if left at jax defaults)."""
    global _configured, _effective
    if _configured:
        return _effective
    _configured = True
    if not _plugin_present():
        return None  # no remote plugin in play; nothing to fix

    # sitecustomize already imported jax to register the plugin, so this
    # import is free here.
    import jax

    def _set(platforms: str) -> None:
        global _effective
        try:
            jax.config.update("jax_platforms", platforms)
            _effective = platforms
        except Exception:  # backends already initialized; too late
            pass

    want = os.environ.get("JAX_PLATFORMS", "")
    plats = [p for p in want.split(",") if p]
    if plats and "axon" not in plats:
        # The user asked for specific platforms that exclude the remote
        # plugin; undo the sitecustomize clobber so jax never dials.
        _set(want)
        return _effective

    if os.environ.get("PHI_TPU_NO_BACKEND_PROBE") == "1":
        return None
    if not _probe_relay():
        sys.stderr.write(
            "[W::backend] remote TPU tunnel unreachable "
            "(probe timed out); falling back to the host-CPU backend\n")
        _set("cpu")
    return _effective
