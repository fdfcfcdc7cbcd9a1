"""Executable cache: serialize/deserialize round trip (forced on CPU)."""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np


def test_execache_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("PHI_TPU_EXEC_CACHE", str(tmp_path))
    monkeypatch.setenv("PHI_TPU_EXEC_CACHE_CPU", "1")
    import phi_tpu.execache as ec
    ec._loaded.clear()
    ec._disabled = False

    @functools.partial(jax.jit, static_argnames=("n",))
    def f(x, n):
        return x * n + 1

    x = jnp.arange(8.0)
    out1 = ec.cached_call(f, "t", (x,), {"n": 3})
    assert np.allclose(np.asarray(out1), np.arange(8.0) * 3 + 1)
    files = [p for p in os.listdir(tmp_path) if p.endswith(".jex")]
    assert len(files) == 1, "executable must be serialized to disk"
    # simulate a fresh process: drop the in-memory entry, keep the disk file
    ec._loaded.clear()
    out2 = ec.cached_call(f, "t", (x + 1,), {"n": 3})
    assert np.allclose(np.asarray(out2), (np.arange(8.0) + 1) * 3 + 1)
    files = [p for p in os.listdir(tmp_path) if p.endswith(".jex")]
    if files:
        # deserialized executable ran: the cross-process path works here.
        # A different static arg must produce a second cache entry.
        ec.cached_call(f, "t", (x,), {"n": 4})
        files = [p for p in os.listdir(tmp_path) if p.endswith(".jex")]
        assert len(files) == 2
    else:
        # Some hosts refuse to re-load their own XLA:CPU AOT image
        # (machine-feature strictness); cached_call must then have dropped
        # the stale entry and fallen back to plain jit — verified by the
        # correct out2 above and the empty cache dir here. (The TPU
        # backend, the cache's actual target, has no such sensitivity.)
        out3 = ec.cached_call(f, "t", (x,), {"n": 3})
        assert np.allclose(np.asarray(out3), np.arange(8.0) * 3 + 1)


def test_execache_key_tracks_source_file(tmp_path, monkeypatch):
    """Editing the module that defines a cached program must change the
    cache key — otherwise a stale compiled executable would silently serve
    the OLD program after a kernel edit (shapes alone can't tell)."""
    import importlib
    import sys

    import phi_tpu.execache as ec
    mod_path = tmp_path / "ec_probe_mod.py"
    mod_path.write_text(
        "import jax\n\n@jax.jit\ndef probe(x):\n    return x * 2\n")
    monkeypatch.syspath_prepend(str(tmp_path))
    mod = importlib.import_module("ec_probe_mod")
    x = jnp.arange(4.0)
    key1 = ec._key("probe", mod.probe, (x,), {})
    # same everything -> same key (and the per-function memo is warm)
    assert key1 == ec._key("probe", mod.probe, (x,), {})
    mod_path.write_text(
        "import jax\n\n@jax.jit\ndef probe(x):\n    return x * 3\n")
    mod = importlib.reload(mod)
    key2 = ec._key("probe", mod.probe, (x,), {})
    assert key1 != key2, "source edit must invalidate the executable cache"
    sys.modules.pop("ec_probe_mod", None)


def test_execache_fingerprint_scope(tmp_path, monkeypatch):
    """Function-closure granularity: editing an UNRELATED function in the
    same module must not invalidate (10-minute kernel recompiles); editing a
    referenced same-package helper or constant must."""
    import importlib
    import sys

    import phi_tpu.execache as ec
    mod_path = tmp_path / "ec_scope_mod.py"
    base = ("import jax\nSCALE = 2\n\n"
            "def helper(x):\n    return x * SCALE\n\n"
            "@jax.jit\ndef probe(x):\n    return helper(x) + 1\n\n"
            "def unrelated():\n    return {}\n")
    mod_path.write_text(base.format(1))
    monkeypatch.syspath_prepend(str(tmp_path))
    mod = importlib.import_module("ec_scope_mod")
    x = jnp.arange(4.0)
    key1 = ec._key("probe", mod.probe, (x,), {})
    # unrelated edit -> same key
    mod_path.write_text(base.format(999))
    mod = importlib.reload(mod)
    assert ec._key("probe", mod.probe, (x,), {}) == key1
    # referenced helper edit -> new key
    mod_path.write_text(base.format(1).replace("x * SCALE", "x * SCALE * 2"))
    mod = importlib.reload(mod)
    key_h = ec._key("probe", mod.probe, (x,), {})
    assert key_h != key1
    # referenced module-constant edit -> new key
    mod_path.write_text(base.format(1).replace("SCALE = 2", "SCALE = 3"))
    mod = importlib.reload(mod)
    assert ec._key("probe", mod.probe, (x,), {}) not in (key1, key_h)
    sys.modules.pop("ec_scope_mod", None)


def test_execache_disabled_by_default_on_cpu(tmp_path, monkeypatch):
    monkeypatch.setenv("PHI_TPU_EXEC_CACHE", str(tmp_path))
    monkeypatch.delenv("PHI_TPU_EXEC_CACHE_CPU", raising=False)
    import phi_tpu.execache as ec
    ec._loaded.clear()
    ec._disabled = False

    @functools.partial(jax.jit, static_argnames=("n",))
    def g(x, n):
        return x + n

    out = ec.cached_call(g, "u", (jnp.ones(4),), {"n": 2})
    assert np.allclose(np.asarray(out), 3.0)
    assert not os.listdir(tmp_path), "CPU backend must bypass the disk cache"


def test_execache_fingerprint_local_imports(tmp_path, monkeypatch):
    """Function-LOCAL `from pkg.mod import helper` (the codebase's dominant
    cycle-avoiding style) must be part of the fingerprint: editing the
    helper has to invalidate cached executables of every jitted caller."""
    import importlib
    import sys

    import phi_tpu.execache as ec
    pkg = tmp_path / "ec_lpkg"
    pkg.mkdir()
    (pkg / "__init__.py").write_text("")
    helper_path = pkg / "helper.py"
    helper_path.write_text("def helper(x):\n    return x * 2\n")
    (pkg / "main.py").write_text(
        "import jax\n\n@jax.jit\ndef probe(x):\n"
        "    from ec_lpkg.helper import helper\n"
        "    return helper(x) + 1\n")
    monkeypatch.syspath_prepend(str(tmp_path))
    mod = importlib.import_module("ec_lpkg.main")
    x = jnp.arange(4.0)
    key1 = ec._key("probe", mod.probe, (x,), {})
    helper_path.write_text("def helper(x):\n    return x * 3\n")
    importlib.reload(importlib.import_module("ec_lpkg.helper"))
    mod = importlib.reload(mod)
    key2 = ec._key("probe", mod.probe, (x,), {})
    assert key1 != key2, "local-import helper edit must invalidate the cache"
    for name in ("ec_lpkg.main", "ec_lpkg.helper", "ec_lpkg"):
        sys.modules.pop(name, None)


def test_execache_fingerprint_deep_nesting(tmp_path, monkeypatch):
    """Globals referenced only from a doubly-nested function (body inside
    sweep inside the jitted fn) must be fingerprinted too."""
    import importlib
    import sys

    import phi_tpu.execache as ec
    mod_path = tmp_path / "ec_deep_mod.py"
    base = ("import jax\nDEEP_CONST = {}\n\n"
            "@jax.jit\ndef probe(x):\n"
            "    def outer(y):\n"
            "        def inner(z):\n"
            "            return z * DEEP_CONST\n"
            "        return inner(y)\n"
            "    return outer(x)\n")
    mod_path.write_text(base.format(2))
    monkeypatch.syspath_prepend(str(tmp_path))
    mod = importlib.import_module("ec_deep_mod")
    x = jnp.arange(4.0)
    key1 = ec._key("probe", mod.probe, (x,), {})
    mod_path.write_text(base.format(3))
    mod = importlib.reload(mod)
    assert ec._key("probe", mod.probe, (x,), {}) != key1
    sys.modules.pop("ec_deep_mod", None)
