"""Chunked sketching must be bit-identical to the monolithic path."""

import numpy as np

import phi_tpu.sketch.minimizer as m
from phi_tpu.io.gfa import encode_seq


def test_chunked_equals_monolithic(monkeypatch):
    import random
    rng = random.Random(5)
    seq = "".join(rng.choice("ACGT") for _ in range(5000))
    # inject some Ns to exercise gap dedup across chunk boundaries
    seq = seq[:1203] + "N" * 8 + seq[1211:]
    codes = encode_seq(seq)
    k, w = 11, 7
    ref = m.sketch_sequence(codes, k, w)
    monkeypatch.setattr(m, "CHUNK", 512)
    got = m.sketch_sequence(codes, k, w)
    assert np.array_equal(ref[0], got[0])
    assert np.array_equal(ref[1], got[1])
    assert np.array_equal(ref[2], got[2])


def test_chunk_boundary_dedup(monkeypatch):
    # homopolymer spanning a chunk boundary: the same minimizer value is
    # selected on both sides and must be emitted only once
    codes = encode_seq("ACGT" * 50 + "A" * 300 + "TGCA" * 50)
    k, w = 5, 3
    ref = m.sketch_sequence(codes, k, w)
    monkeypatch.setattr(m, "CHUNK", 256)
    got = m.sketch_sequence(codes, k, w)
    assert np.array_equal(ref[0], got[0])
    assert np.array_equal(ref[2], got[2])


def test_concat_path_matches_batch_path():
    """sketch_read_concat (native ragged layout) == sketch_read_batch (2D)."""
    from phi_tpu.sketch.minimizer import sketch_read_batch, sketch_read_concat
    rng = np.random.default_rng(3)
    lengths = rng.integers(20, 200, 40)
    reads = [rng.integers(0, 4, n).astype(np.uint8) for n in lengths]
    reads[5][10:14] = 4  # interior Ns
    reads[7] = reads[7][:8]  # too short for any window
    lengths[7] = 8
    concat = np.concatenate(reads)
    off = np.zeros(len(reads) + 1, np.int64)
    np.cumsum([len(r) for r in reads], out=off[1:])
    W = int(max(len(r) for r in reads))
    codes = np.full((len(reads), W), 4, np.uint8)
    for i, r in enumerate(reads):
        codes[i, :len(r)] = r
    k, w = 11, 5
    a = sketch_read_batch(codes, k, w, np.array([len(r) for r in reads], np.int32))
    b = sketch_read_concat(concat, off, k, w)
    assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])
    assert len(a[0]) > 0
