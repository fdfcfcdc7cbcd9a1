import numpy as np

from phi_tpu.parallel.dist import initialize, merge_spectra, read_shard_bounds


def test_initialize_single_process():
    idx, cnt = initialize()
    assert idx == 0 and cnt >= 1


def test_read_shard_bounds():
    assert read_shard_bounds(10, 0, 3) == (0, 4)
    assert read_shard_bounds(10, 1, 3) == (4, 8)
    assert read_shard_bounds(10, 2, 3) == (8, 10)
    assert read_shard_bounds(3, 2, 4) == (2, 3)
    assert read_shard_bounds(0, 1, 4) == (0, 0)


def test_merge_spectra_single_process():
    hi = np.array([2, 1, 1], np.uint32)
    lo = np.array([5, 9, 3], np.uint32)
    mh, ml = merge_spectra(hi, lo)
    key = (mh.astype(np.uint64) << np.uint64(32)) | ml
    assert np.array_equal(key, np.sort(key))
    assert len(key) == 3
