"""Pallas kernel parity (interpret mode on CPU; real-TPU runs are validated
in the round benchmarks)."""

import jax.numpy as jnp
import numpy as np
import pytest

import phi_tpu.sketch.minimizer as m
from phi_tpu.io.gfa import encode_seq
from phi_tpu.sketch.kernels import pallas_join_sequence, pallas_sketch_sequence


@pytest.mark.parametrize("k,w,n", [(31, 25, 60000), (11, 5, 20000), (15, 10, 9000)])
def test_pallas_sketch_parity(k, w, n):
    import random
    rng = random.Random(21)
    seq = "".join(rng.choice("ACGT") for _ in range(n))
    codes = encode_seq(seq)
    ref = m.sketch_sequence(codes, k, w)
    got = pallas_sketch_sequence(codes, k, w, interpret=True)
    assert all(np.array_equal(a, b) for a, b in zip(ref, got))


def test_pallas_sketch_with_n_bases():
    import random
    rng = random.Random(3)
    seq = "".join(rng.choice("ACGT") for _ in range(30000))
    seq = seq[:9000] + "N" * 15 + seq[9015:]   # straddles nothing special
    seq = seq[:16380] + "NN" + seq[16382:]     # near a block boundary (8192*2)
    codes = encode_seq(seq)
    k, w = 13, 7
    ref = m.sketch_sequence(codes, k, w)
    got = pallas_sketch_sequence(codes, k, w, interpret=True)
    assert all(np.array_equal(a, b) for a, b in zip(ref, got))


def test_pallas_join_parity():
    import random
    rng = random.Random(8)
    seq = "".join(rng.choice("ACGT") for _ in range(40000))
    codes = encode_seq(seq)
    k, w = 17, 9
    frags = [seq[i:i + 90] for i in range(0, 30000, 83)]
    rc = np.full((len(frags), 90), 4, np.uint8)
    ln = np.zeros(len(frags), np.int32)
    for i, f in enumerate(frags):
        rc[i, :len(f)] = encode_seq(f)
        ln[i] = len(f)
    spectrum = m.sketch_read_batch(rc, k, w, ln)
    sp_hi = jnp.asarray(spectrum[0])
    sp_lo = jnp.asarray(spectrum[1])
    want = m.sketch_join_sequence(codes, k, w, sp_hi, sp_lo)
    got = pallas_join_sequence(codes, k, w, sp_hi, sp_lo, interpret=True)
    assert got[0] == want[0]
    assert np.array_equal(got[1], want[1])
    assert np.array_equal(got[2], want[2])


def _mk_spectrum(seq, k, w, rng):
    frags = [seq[i:i + 90] for i in range(0, len(seq) - 90, 83)]
    rc = np.full((len(frags), 90), 4, np.uint8)
    ln = np.zeros(len(frags), np.int32)
    for i, f in enumerate(frags):
        rc[i, :len(f)] = encode_seq(f)
        ln[i] = len(f)
    spectrum = m.sketch_read_batch(rc, k, w, ln)
    return jnp.asarray(spectrum[0]), jnp.asarray(spectrum[1])


def test_pallas_join_many_batched_rows():
    """Batched multi-row path: several sequences split into small
    superchunk rows, 2 rows per dispatch — exercises the in-kernel dedup
    carry across row boundaries AND the device carry across dispatch
    batches."""
    import random

    from phi_tpu.sketch.kernels import BLK, pallas_join_many
    rng = random.Random(77)
    k, w = 17, 9
    seqs = []
    for n in (50000, 2 * BLK + 40, 123, 70000):
        seqs.append(encode_seq("".join(rng.choice("ACGT") for _ in range(n))))
    # one N-containing sequence must come back None (host fallback marker)
    seq_n = encode_seq("ACGT" * 5000 + "N" + "ACGT" * 5000)
    seqs.append(seq_n)
    sp_hi, sp_lo = _mk_spectrum(
        "".join("ACGT"[c] for c in seqs[0]) +
        "".join("ACGT"[c] for c in seqs[3]), k, w, rng)
    got = pallas_join_many(seqs, k, w, sp_hi, sp_lo, rows_per_call=2,
                           super_blocks=2, interpret=True)
    assert got[4] is None
    for i in range(4):
        want = m.sketch_join_many([seqs[i]], k, w, sp_hi, sp_lo)[0]
        assert got[i][0] == want[0], f"seq {i}: n_min {got[i][0]} != {want[0]}"
        assert np.array_equal(np.sort(got[i][1]), np.sort(want[1])), f"seq {i}"
        order_g = np.argsort(got[i][1], kind="stable")
        order_w = np.argsort(want[1], kind="stable")
        assert np.array_equal(got[i][2][order_g], want[2][order_w]), f"seq {i}"


def test_pallas_join_many_empty_and_tiny():
    from phi_tpu.sketch.kernels import pallas_join_many
    k, w = 17, 9
    seqs = [np.zeros(0, np.uint8), encode_seq("ACGTACGT")]
    sp_hi = jnp.zeros(0, jnp.uint32)
    sp_lo = jnp.zeros(0, jnp.uint32)
    got = pallas_join_many(seqs, k, w, sp_hi, sp_lo, rows_per_call=2,
                           super_blocks=2, interpret=True)
    for g in got:
        assert g[0] == 0 and len(g[1]) == 0
