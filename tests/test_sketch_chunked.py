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
