import numpy as np
import pytest

from phi_tpu.io.gfa import encode_seq
from phi_tpu.sketch.encode import combine64, kmer_string, pack_kmers_np
from phi_tpu.sketch.minimizer import sketch_read_batch, sketch_sequence

from tests.reference_impl import minimizers_string, revcomp


def _rand_seq(rng, n, alphabet="ACGT"):
    return "".join(rng.choice(list(alphabet)) for _ in range(n))


def test_pack_roundtrip():
    seq = "ACGTACGTTTGCAGTCAACGTACGTACGTAA"
    k = len(seq)
    hi, lo, valid = pack_kmers_np(encode_seq(seq), k)
    assert valid.all()
    assert kmer_string(int(hi[0]), int(lo[0]), k) == seq


@pytest.mark.parametrize("k,w", [(5, 3), (15, 7), (17, 4), (31, 25), (16, 1)])
def test_minimizer_matches_reference_oracle(k, w):
    import random
    rng = random.Random(42)
    for trial in range(8):
        n = rng.choice([k + w - 1, 50, 200, 1000])
        seq = _rand_seq(rng, n)
        got = sketch_sequence(encode_seq(seq), k, w)
        want = minimizers_string(seq, k, w)
        got_kmers = [kmer_string(int(h), int(l), k) for h, l in zip(got[0], got[1])]
        got_pos = got[2].tolist()
        assert got_kmers == [kmer for kmer, _ in want], f"trial {trial} n={n}"
        assert got_pos == [pos for _, pos in want], f"trial {trial} n={n}"


def test_minimizer_with_n_bases():
    k, w = 7, 5
    seq = "ACGTACGTACNGTACGTACGTACGTACGTAGCTT"
    got = sketch_sequence(encode_seq(seq), k, w)
    want = minimizers_string(seq, k, w, skip_non_acgt=True)
    got_kmers = [kmer_string(int(h), int(l), k) for h, l in zip(got[0], got[1])]
    assert got_kmers == [kmer for kmer, _ in want]


def test_canonical_is_revcomp_invariant():
    import random
    rng = random.Random(7)
    seq = _rand_seq(rng, 500)
    k, w = 11, 5
    a = sketch_sequence(encode_seq(seq), k, w)
    b = sketch_sequence(encode_seq(revcomp(seq)), k, w)
    sa = set(combine64(a[0], a[1]).tolist())
    sb = set(combine64(b[0], b[1]).tolist())
    # canonical minimizer *values* of a sequence and its revcomp coincide
    assert sa == sb


def test_read_batch_spectrum():
    import random
    rng = random.Random(3)
    reads = [_rand_seq(rng, rng.randint(40, 90)) for _ in range(20)]
    k, w = 11, 5
    max_len = max(len(r) for r in reads)
    codes = np.full((len(reads), max_len), 4, np.uint8)
    for i, r in enumerate(reads):
        codes[i, :len(r)] = encode_seq(r)
    hi, lo = sketch_read_batch(codes, k, w)
    got = set(combine64(hi, lo).tolist())
    want = set()
    for r in reads:
        for kmer, _ in minimizers_string(r, k, w):
            hi1, lo1, _ = pack_kmers_np(encode_seq(kmer), k)
            want.add(int(combine64(hi1, lo1)[0]))
    assert got == want


def test_short_sequence_empty():
    hi, lo, pos = sketch_sequence(encode_seq("ACGT"), 31, 25)
    assert len(hi) == 0
