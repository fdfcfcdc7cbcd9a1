"""Recombinant recovery on a synthetic pangenome with indel bubbles."""

import numpy as np

from phi_tpu.anchors.join import build_anchor_tables, sketch_haplotypes
from phi_tpu.eval.synth import sample_reads, synth_pangenome
from phi_tpu.graph import tensorize
from phi_tpu.io.gfa import encode_seq
from phi_tpu.sketch.minimizer import sketch_read_batch
from phi_tpu.solve.decode import decode_path
from phi_tpu.solve.dp import solve_dp
from phi_tpu.solve.prep import build_solver_tables
from phi_tpu import native


def test_recovers_recombinant_with_indels():
    rng = np.random.default_rng(19)
    gfa, hap_seqs = synth_pangenome(rng, length=25000, n_haps=5,
                                    var_rate=0.012, indel_fraction=0.3)
    G = tensorize(gfa)
    target = hap_seqs[1][:12000] + hap_seqs[4][12000:]
    reads, _ = sample_reads(rng, [target], coverage=4.0, read_len=150,
                            error_rate=0.001)
    k, w = 19, 11
    codes = np.full((len(reads), 150), 4, np.uint8)
    lengths = np.zeros(len(reads), np.int32)
    for i, r in enumerate(reads):
        codes[i, :len(r)] = encode_seq(r)
        lengths[i] = len(r)
    spectrum = sketch_read_batch(codes, k, w, lengths)
    sk = sketch_haplotypes(G, k, w)
    an = build_anchor_tables(G, k, sk, spectrum, 1.0)
    tb = build_solver_tables(G, an, R=20.0)
    M, ends, sweeps, obj = solve_dp(tb)
    res = decode_path(G, tb, an, M, ends, sweeps, obj)
    out = G.path_seq(res.vertices)
    d = native.edit_distance(out, target)
    # indel-heavy graph, error-bearing reads: near-exact recovery expected
    # (a handful of residual edits around deletion-boundary anchors)
    assert d <= 20, f"edit distance {d}"
    assert res.n_switches >= 1


def test_sample_reads_indel_error_model():
    """Indel-bearing reads: correct length, deterministic, and actually
    divergent from the template (insertions/deletions shift suffixes)."""
    import numpy as np
    from phi_tpu.eval.synth import sample_reads
    rng = np.random.default_rng(3)
    hap = "".join(np.random.default_rng(0).choice(list("ACGT"), 20000))
    reads, target = sample_reads(rng, [hap], coverage=2.0, read_len=150,
                                 error_rate=0.0, indel_rate=0.02)
    assert target == hap
    assert all(len(r) <= 150 for r in reads)
    # with 2% indels a 150bp read almost surely differs from every exact
    # substring of the template
    diverged = sum(r not in hap for r in reads)
    assert diverged > len(reads) * 0.8
    # determinism
    reads2, _ = sample_reads(np.random.default_rng(3), [hap], coverage=2.0,
                             read_len=150, error_rate=0.0, indel_rate=0.02)
    assert reads == reads2
    # indel_rate=0 keeps the round-4 substitution-only behavior: exact
    # 150bp substrings
    reads3, _ = sample_reads(np.random.default_rng(5), [hap], coverage=1.0,
                             read_len=150, error_rate=0.0)
    assert all(len(r) == 150 and r in hap for r in reads3)
