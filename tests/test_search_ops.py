import jax.numpy as jnp
import numpy as np

from phi_tpu.ops.search import (make_search_buckets, pair_isin,
                                pair_isin_bucketed, pair_searchsorted)


def _mk(rng, n):
    keys = np.unique(rng.integers(0, 1 << 62, n).astype(np.uint64))
    return (keys >> np.uint64(32)).astype(np.uint32), keys.astype(np.uint32)


def test_pair_searchsorted_matches_numpy():
    rng = np.random.default_rng(0)
    hi, lo = _mk(rng, 5000)
    key = hi.astype(np.uint64) << np.uint64(32) | lo
    qhi, qlo = _mk(rng, 800)
    # mix in exact members
    qhi = np.concatenate([qhi, hi[::7]])
    qlo = np.concatenate([qlo, lo[::7]])
    qkey = qhi.astype(np.uint64) << np.uint64(32) | qlo
    want = np.searchsorted(key, qkey)
    got = np.asarray(pair_searchsorted(jnp.asarray(hi), jnp.asarray(lo),
                                       jnp.asarray(qhi), jnp.asarray(qlo)))
    assert np.array_equal(got, want)


def test_bucketed_matches_plain():
    rng = np.random.default_rng(1)
    hi, lo = _mk(rng, 20000)
    qhi, qlo = _mk(rng, 3000)
    qhi = np.concatenate([qhi, hi[::11]])
    qlo = np.concatenate([qlo, lo[::11]])
    f0, i0 = pair_isin(jnp.asarray(hi), jnp.asarray(lo),
                       jnp.asarray(qhi), jnp.asarray(qlo))
    off, rounds = make_search_buckets(hi)
    f1, i1 = pair_isin_bucketed(jnp.asarray(hi), jnp.asarray(lo),
                                jnp.asarray(off),
                                jnp.asarray(qhi), jnp.asarray(qlo), rounds)
    assert np.array_equal(np.asarray(f0), np.asarray(f1))
    # indices must agree wherever found
    same = np.asarray(f0)
    assert np.array_equal(np.asarray(i0)[same], np.asarray(i1)[same])


def test_bucketed_skewed_distribution():
    # heavy skew into one bucket (lots of identical hi prefixes)
    rng = np.random.default_rng(2)
    hi = np.zeros(5000, np.uint32)
    lo = np.unique(rng.integers(0, 1 << 31, 5000).astype(np.uint32))
    hi = hi[:len(lo)]
    qlo = lo[::3]
    qhi = np.zeros(len(qlo), np.uint32)
    off, rounds = make_search_buckets(hi)
    f, i = pair_isin_bucketed(jnp.asarray(hi), jnp.asarray(lo),
                              jnp.asarray(off), jnp.asarray(qhi),
                              jnp.asarray(qlo), rounds)
    assert np.asarray(f).all()
    assert np.array_equal(lo[np.asarray(i)], qlo)
