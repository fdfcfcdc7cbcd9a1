"""k > 31 support (reference parity gap: the reference's string-based scan
allows arbitrary k, ILP_index.cpp:386-407). 31 < k <= 63 runs on the native
128-bit scan: selection and consecutive-dedup compare the FULL canonical
packing (== reference lexicographic order); the emitted join key is a
64-bit fold of it (the reference itself joins on a folded 128-bit
MurmurHash, ILP_index.cpp:10-18)."""

import random

import numpy as np
import pytest

from phi_tpu.io.gfa import encode_seq
from phi_tpu.sketch.encode import fold128_64_np
from phi_tpu.sketch.minimizer import sketch_sequence
from tests.reference_impl import minimizers_string

pytest.importorskip("ctypes")


def _native_ok():
    try:
        from phi_tpu.native import available
        return available()
    except Exception:
        return False


def _fold_of_string(kmer: str) -> int:
    v = 0
    for c in kmer:
        v = (v << 2) | "ACGT".index(c)
    hi = np.uint64(v >> 64)
    lo = np.uint64(v & ((1 << 64) - 1))
    return int(fold128_64_np(np.array([hi]), np.array([lo]))[0])


@pytest.mark.skipif(not _native_ok(), reason="native library unavailable")
@pytest.mark.parametrize("k,w,n", [(35, 11, 30000), (47, 25, 30000),
                                   (63, 5, 20000)])
def test_wide_k_oracle_parity(k, w, n):
    rng = random.Random(k * 1000 + w)
    seq = "".join(rng.choice("ACGT") for _ in range(n))
    # sprinkle Ns to exercise the valid-run reset
    seq = seq[:777] + "N" + seq[778:5000] + "NN" + seq[5002:]
    want = minimizers_string(seq, k, w, skip_non_acgt=True)
    hi, lo, pos = sketch_sequence(encode_seq(seq), k, w)
    assert len(hi) == len(want), (len(hi), len(want))
    assert [p for _, p in want] == list(pos)
    for (kmer, _), h, l in zip(want, hi, lo):
        f = _fold_of_string(kmer)
        assert (int(h) << 32 | int(l)) == f


@pytest.mark.skipif(not _native_ok(), reason="native library unavailable")
def test_wide_k_pipeline_e2e(tmp_path):
    """End-to-end inference at k = 35 on a synthetic panel: the target
    haplotype is recovered exactly (gap 0), through the native host join."""
    from phi_tpu.config import Options
    from phi_tpu.eval.synth import sample_reads, synth_pangenome
    from phi_tpu.io.gfa import write_gfa
    from phi_tpu.pipeline import run_pipeline
    rng = np.random.default_rng(4)
    gfa_data, hap_seqs = synth_pangenome(rng, length=8000, n_haps=4)
    gfa_path = str(tmp_path / "g.gfa")
    write_gfa(gfa_data, path=gfa_path)
    reads, _ = sample_reads(rng, [hap_seqs[1]], coverage=3.0, read_len=150,
                            error_rate=0.0)
    reads_path = str(tmp_path / "r.fa")
    with open(reads_path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{r}\n")
    res = run_pipeline(gfa_path, reads_path, str(tmp_path / "o.fa"),
                       Options(k=35, w=11))
    assert res.sequence == hap_seqs[1]
    assert res.decode.true_objective - res.decode.dp_objective <= 0.5


def test_k_over_63_rejected():
    from phi_tpu.config import Options
    with pytest.raises(ValueError):
        Options(k=64)
