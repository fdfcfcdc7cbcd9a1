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

_lock = threading.Lock()           # guards the dicts only
_key_locks: dict[str, threading.Lock] = {}
_loaded: dict[str, object] = {}
# memo pins the function object: id() alone can be reused after GC
# (observed as a stale fingerprint when tests reload modules)
_fingerprints: dict[int, tuple[object, str]] = {}
_disabled = False


def _log(msg: str) -> None:
    import sys
    import time
    print(f"[M::execache::{time.strftime('%H:%M:%S')}] {msg}",
          file=sys.stderr, flush=True)


def _code_fingerprint(jitted) -> str:
    """Hash of the traced code: the jitted function's source plus,
    transitively, the source of every `phi_tpu` function it references by
    global name (and the repr of referenced scalar/tuple module constants).
    A compiled executable embeds the traced program, so an edit to any of
    this must invalidate the cache entry — shapes alone would silently
    serve the stale program. Function-closure granularity (not whole-file):
    editing host orchestration in the same module must NOT throw away the
    10-minute remote compiles of untouched kernels. Function-local
    `from phi_tpu.x import y` imports are resolved from the source text.
    Not covered: dynamically resolved references (getattr/dict dispatch) —
    don't use those inside traced code."""
    fid = id(jitted)
    hit = _fingerprints.get(fid)
    if hit is not None and hit[0] is jitted:
        return hit[1]
    import importlib
    import inspect
    import re
    root = inspect.unwrap(getattr(jitted, "__wrapped__", jitted))
    pkg = root.__module__.split(".")[0]
    parts: list[str] = []
    seen: set[int] = set()
    stack = [root]

    def all_names(code) -> set:
        # every global name referenced by the code object or any code
        # object nested in it, to any depth (fn inside fn inside fn)
        names = set(code.co_names)
        for const in code.co_consts:
            if hasattr(const, "co_names"):
                names |= all_names(const)
        return names

    try:
        while stack:
            fn = stack.pop()
            if id(fn) in seen:
                continue
            seen.add(id(fn))
            src = inspect.getsource(fn)
            parts.append(src)
            # function-local `from pkg.mod import name` (the codebase's
            # dominant style for cycle-avoiding imports) binds locals, not
            # globals — resolve those dependencies from the source text so
            # edits to them invalidate the cache too
            for m in re.finditer(
                    rf"from\s+({pkg}[\w.]*)\s+import\s+"
                    r"(\([^)]*\)|[^\n]+)", src):
                try:
                    mod = importlib.import_module(m.group(1))
                except Exception:
                    continue
                for item in m.group(2).strip("()").split(","):
                    nm = item.split(" as ")[0].strip()
                    ref = getattr(mod, nm, None) if nm.isidentifier() else None
                    if callable(ref) and hasattr(ref, "__code__"):
                        stack.append(inspect.unwrap(ref))
                    elif isinstance(ref, (int, float, str, bytes, tuple)):
                        parts.append(f"{m.group(1)}.{nm}={ref!r}")
            code = getattr(fn, "__code__", None)
            g = getattr(fn, "__globals__", None)
            if code is None or g is None:
                continue
            names = all_names(code)
            for name in sorted(names):
                ref = g.get(name)
                if ref is None:
                    continue
                mod = getattr(ref, "__module__", None)
                if callable(ref) and isinstance(mod, str) \
                        and mod.split(".")[0] == root.__module__.split(".")[0]:
                    stack.append(inspect.unwrap(ref))
                elif isinstance(ref, (int, float, str, bytes, tuple)):
                    parts.append(f"{name}={ref!r}")
                elif hasattr(ref, "shape") \
                        and isinstance(getattr(ref, "size", None), int) \
                        and ref.size <= 64:
                    parts.append(f"{name}={ref!r}")  # scalar jnp/np constants
        fp = hashlib.sha1("\n".join(sorted(parts)).encode()).hexdigest()[:12]
    except Exception:
        # fallback: whole defining file
        try:
            with open(inspect.getsourcefile(root), "rb") as f:
                fp = hashlib.sha1(f.read()).hexdigest()[:12]
        except Exception:
            fp = "nosrc"
    _fingerprints[fid] = (jitted, fp)
    return fp


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


def _key(name: str, jitted, dyn_args: tuple, static_kw: dict) -> str:
    import jax
    dev = jax.devices()[0]
    parts = [jax.__version__, jax.default_backend(),
             getattr(dev, "device_kind", "?"), name,
             _code_fingerprint(jitted)]
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
        key = _key(name, jitted, dyn_args, static_kw)
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


def ensure_compiled(jitted, name: str, dyn_args: tuple,
                    static_kw: dict) -> bool:
    """Compile-only prewarm: make sure the serialized executable for this
    (program, signature) exists on disk WITHOUT executing anything on the
    device. Returns True if it was already cached (nothing to do). Used by
    background prewarm threads — a dummy *execution* would contend with
    the pipeline's own device work (observed: a concurrent prewarm solve
    inflating the first join loop by minutes through the shared tunnel)."""
    cdir = _cache_dir()
    if _disabled or cdir is None:
        return True
    import jax
    if jax.default_backend() == "cpu" \
            and os.environ.get("PHI_TPU_EXEC_CACHE_CPU") != "1":
        return True
    try:
        key = _key(name, jitted, dyn_args, static_kw)
    except Exception:
        return True
    path = os.path.join(cdir, key + ".jex")
    if os.path.exists(path) or key in _loaded:
        return True
    with _lock_for(key):
        if os.path.exists(path):
            return True
        fn = _load_or_compile(jitted, key, dyn_args, static_kw)
        if fn is not None:
            with _lock:
                _loaded[key] = fn
    return False


def _load_or_compile(jitted, key: str, dyn_args: tuple, static_kw: dict):
    global _disabled
    import time
    from jax.experimental import serialize_executable as se
    cdir = _cache_dir()
    path = os.path.join(cdir, key + ".jex")
    t0 = time.time()
    try:
        with open(path, "rb") as f:
            payload, in_tree, out_tree = pickle.load(f)
        fn = se.deserialize_and_load(payload, in_tree, out_tree)
        _log(f"loaded {key} ({time.time() - t0:.1f} s)")
        return fn
    except FileNotFoundError:
        pass
    except Exception as e:
        _log(f"stale/corrupt {key} ({type(e).__name__}); recompiling")
    _log(f"compiling {key} ...")
    t0 = time.time()
    try:
        compiled = jitted.lower(*dyn_args, **static_kw).compile()
    except Exception as e:
        _log(f"compile via cache failed for {key} ({type(e).__name__}); "
             "normal jit path")
        return None  # let the caller run the normal path
    _log(f"compiled {key} ({time.time() - t0:.1f} s)")
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
