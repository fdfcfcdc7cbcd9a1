"""Cross-process compiled-executable cache.

The platform's persistent XLA compile cache is keyed per-process by this
TPU plugin (DESIGN.md "cross-process executable cache is broken"), so every
fresh `phi` process pays minutes of remote compiles for programs compiled a
thousand times before. This layer serializes the compiled PJRT executable
itself (jax.experimental.serialize_executable) to disk after the first
compile and loads it directly in later processes — turning a minutes-long
remote compile into a sub-second file read.

Scope: opt-out via PHI_TPU_EXEC_CACHE=0; a directory override via the same
variable. Keys cover jax version, backend, device kind, program name,
static signature, and the shape/dtype of every dynamic argument. All
failures (plugin without executable serialization, version drift, corrupt
files) fall back silently to the normal jit path — correctness never
depends on this cache.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import threading

_lock = threading.Lock()           # guards the two dicts only
_key_locks: dict[str, threading.Lock] = {}
_loaded: dict[str, object] = {}
_disabled = False


def _lock_for(key: str) -> threading.Lock:
    # Per-key locks: a compile of one program (minutes through the remote
    # tunnel, e.g. the solver prewarm thread) must not serialize loads or
    # compiles of OTHER programs on concurrent threads.
    with _lock:
        lk = _key_locks.get(key)
        if lk is None:
            lk = _key_locks[key] = threading.Lock()
    return lk


def _cache_dir() -> str | None:
    v = os.environ.get("PHI_TPU_EXEC_CACHE", "")
    if v == "0":
        return None
    return v or "/root/.cache/phi_tpu_exec"


def _describe(x) -> str:
    shape = getattr(x, "shape", None)
    if shape is not None:
        return f"{getattr(x, 'dtype', '?')}{tuple(shape)}"
    return repr(x)


def _key(name: str, dyn_args: tuple, static_kw: dict) -> str:
    import jax
    dev = jax.devices()[0]
    parts = [jax.__version__, jax.default_backend(),
             getattr(dev, "device_kind", "?"), name]
    parts += [_describe(a) for a in dyn_args]
    parts += [f"{k}={static_kw[k]!r}" for k in sorted(static_kw)]
    return name + "-" + hashlib.sha1("|".join(parts).encode()).hexdigest()[:20]


def cached_call(jitted, name: str, dyn_args: tuple, static_kw: dict):
    """jitted(*dyn_args, **static_kw) through the executable cache.

    On the first call of a (program, signature) in this process: load the
    serialized executable from disk if present, else compile via
    jitted.lower(...).compile() and serialize it. Returns the call result;
    any cache failure transparently reverts to the plain jit call."""
    global _disabled
    cdir = _cache_dir()
    if _disabled or cdir is None:
        return jitted(*dyn_args, **static_kw)
    import jax
    if jax.default_backend() == "cpu" \
            and os.environ.get("PHI_TPU_EXEC_CACHE_CPU") != "1":
        # CPU compiles are fast and locally-AOT'd executables are machine-
        # feature sensitive; the cache only pays on tunnel-attached TPUs
        return jitted(*dyn_args, **static_kw)
    try:
        key = _key(name, dyn_args, static_kw)
    except Exception:
        return jitted(*dyn_args, **static_kw)
    fn = _loaded.get(key)
    if fn is None:
        with _lock_for(key):
            fn = _loaded.get(key)
            if fn is None:
                fn = _load_or_compile(jitted, key, dyn_args, static_kw)
                if fn is None:
                    return jitted(*dyn_args, **static_kw)
                with _lock:
                    _loaded[key] = fn
    try:
        return fn(*dyn_args)
    except Exception:
        # stale/incompatible executable: drop it and recompile normally
        _loaded.pop(key, None)
        try:
            os.unlink(os.path.join(_cache_dir() or "", key + ".jex"))
        except OSError:
            pass
        return jitted(*dyn_args, **static_kw)


def _load_or_compile(jitted, key: str, dyn_args: tuple, static_kw: dict):
    global _disabled
    from jax.experimental import serialize_executable as se
    cdir = _cache_dir()
    path = os.path.join(cdir, key + ".jex")
    try:
        with open(path, "rb") as f:
            payload, in_tree, out_tree = pickle.load(f)
        return se.deserialize_and_load(payload, in_tree, out_tree)
    except FileNotFoundError:
        pass
    except Exception:
        pass  # corrupt entry: recompile below and overwrite
    try:
        compiled = jitted.lower(*dyn_args, **static_kw).compile()
    except Exception:
        return None  # let the caller run the normal path
    try:
        payload, in_tree, out_tree = se.serialize(compiled)
        os.makedirs(cdir, exist_ok=True)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump((payload, in_tree, out_tree), f)
        os.replace(tmp, path)
    except Exception:
        # plugin without executable serialization: stop trying this process
        _disabled = True
    return compiled
