"""merge_upper_native == np.searchsorted(side='right'), and decode's cached
lazy-B lookup (_b_at_esrc) == the dense/binary-search B_at on random data."""

import numpy as np

from phi_tpu.native import merge_upper_native


def test_merge_upper_matches_searchsorted():
    rng = np.random.default_rng(3)
    for trial in range(20):
        keys = np.sort(rng.integers(0, 1000, rng.integers(0, 50)).astype(np.uint64))
        queries = np.sort(rng.integers(0, 1000, rng.integers(0, 80)).astype(np.uint64))
        idx = merge_upper_native(keys, queries)
        if idx is None:  # library unavailable: nothing to compare
            return
        np.testing.assert_array_equal(
            idx, np.searchsorted(keys, queries, side="right"))


def test_merge_upper_duplicates_and_bounds():
    keys = np.array([5, 5, 5, 9], np.uint64)
    queries = np.array([0, 5, 6, 9, 10], np.uint64)
    idx = merge_upper_native(keys, queries)
    if idx is None:
        return
    np.testing.assert_array_equal(idx, [0, 3, 3, 4, 4])


def test_b_at_esrc_matches_b_at():
    """Lazy-B merge path vs B_at binary-search path vs dense B on the tiny
    instance's solver tables."""
    from phi_tpu.testing import tiny_instance
    import dataclasses

    graph, _, _, _, anchors, tables = tiny_instance()
    from phi_tpu.solve.decode import _b_at_esrc

    t = tables
    eh = t.esrc_h.astype(np.int64)
    ep = np.minimum(t.esrc_p.astype(np.int64), t.P - 1)
    # lazy tables: drop dense B if present so the merge path runs
    t_lazy = dataclasses.replace(t, B=None) if t.B is not None else t
    got = _b_at_esrc(t_lazy, graph, eh, ep)
    want = t_lazy.B_at(eh, ep)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)
    # cache reuse: second call must return identical values
    got2 = _b_at_esrc(t_lazy, graph, eh, ep)
    np.testing.assert_array_equal(got, got2)
