"""sketch_join_sequence must be exact for sequences containing Ns too
(host-path fallback inside the function)."""

import jax.numpy as jnp
import numpy as np

import phi_tpu.sketch.minimizer as m
from phi_tpu.io.gfa import encode_seq
from phi_tpu.sketch.encode import combine64


def test_join_handles_n_sequences():
    import random
    rng = random.Random(44)
    seq = "".join(rng.choice("ACGT") for _ in range(15000))
    seq = seq[:4000] + "N" * 10 + seq[4010:]
    codes = encode_seq(seq)
    k, w = 13, 7
    frags = [seq[i:i + 70] for i in range(0, 12000, 57) if "N" not in seq[i:i + 70]]
    rc = np.full((len(frags), 70), 4, np.uint8)
    ln = np.zeros(len(frags), np.int32)
    for i, f in enumerate(frags):
        rc[i, :len(f)] = encode_seq(f)
        ln[i] = len(f)
    spectrum = m.sketch_read_batch(rc, k, w, ln)
    # expected via explicit host computation
    hi, lo, pos = m.sketch_sequence(codes, k, w)
    sp_key = combine64(*spectrum)
    key = combine64(hi, lo)
    idx = np.searchsorted(sp_key, key)
    idx_c = np.minimum(idx, len(sp_key) - 1)
    hit = sp_key[idx_c] == key
    want_pos, want_id = pos[hit], idx[hit].astype(np.int32)

    n_min, got_pos, got_id = m.sketch_join_sequence(
        codes, k, w, jnp.asarray(spectrum[0]), jnp.asarray(spectrum[1]))
    assert n_min == len(hi)
    assert np.array_equal(got_pos, want_pos)
    assert np.array_equal(got_id, want_id)


def test_read_batch_inferred_lengths_keep_mid_read_n():
    """lengths=None must not truncate reads at an interior N (code 4 is both
    'N' and padding; only the trailing pad run marks the end)."""
    from phi_tpu.io.gfa import encode_seq
    from phi_tpu.sketch.minimizer import sketch_read_batch
    rng = np.random.default_rng(7)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 80))
    read = seq[:40] + "N" + seq[41:]
    codes = np.full((1, 96), 4, np.uint8)
    codes[0, :80] = encode_seq(read)
    explicit = sketch_read_batch(codes, 11, 5, np.array([80], np.int32))
    inferred = sketch_read_batch(codes, 11, 5, None)
    assert np.array_equal(explicit[0], inferred[0])
    assert np.array_equal(explicit[1], inferred[1])
    # and the post-N half actually contributes (would be empty if truncated)
    first_half = np.full((1, 96), 4, np.uint8)
    first_half[0, :40] = encode_seq(read[:40])
    trunc = sketch_read_batch(first_half, 11, 5, None)
    assert len(inferred[0]) > len(trunc[0])
