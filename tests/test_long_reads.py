"""Long-read / mixed-length read handling (BASELINE config 4 analog)."""

import numpy as np

from phi_tpu.io.gfa import encode_seq
from phi_tpu.sketch.encode import combine64, pack_kmers_np
from phi_tpu.sketch.minimizer import sketch_read_batch

from tests.reference_impl import minimizers_string


def test_mixed_length_bucketing_matches_reference():
    import random
    rng = random.Random(31)
    reads = ([  # mix: short reads + a few long ones
        "".join(rng.choice("ACGT") for _ in range(rng.randint(60, 140)))
        for _ in range(40)
    ] + [
        "".join(rng.choice("ACGT") for _ in range(rng.randint(3000, 5000)))
        for _ in range(3)
    ])
    k, w = 15, 9
    max_len = max(len(r) for r in reads)
    codes = np.full((len(reads), max_len), 4, np.uint8)
    lengths = np.zeros(len(reads), np.int32)
    for i, r in enumerate(reads):
        codes[i, :len(r)] = encode_seq(r)
        lengths[i] = len(r)
    hi, lo = sketch_read_batch(codes, k, w, lengths)
    got = set(combine64(hi, lo).tolist())
    want = set()
    for r in reads:
        for kmer, _ in minimizers_string(r, k, w):
            h1, l1, _ = pack_kmers_np(encode_seq(kmer), k)
            want.add(int(combine64(h1, l1)[0]))
    assert got == want
