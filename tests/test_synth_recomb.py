"""Synthetic-scale property test: the solver recovers a recombined mosaic
haplotype from reads — the core scientific claim of PHI, on data where the
ground truth (including switch points) is known exactly."""

import numpy as np

from phi_tpu.anchors.join import build_anchor_tables, sketch_haplotypes
from phi_tpu.eval.synth import sample_reads, synth_pangenome
from phi_tpu.graph import tensorize
from phi_tpu.io.gfa import encode_seq
from phi_tpu.sketch.minimizer import sketch_read_batch
from phi_tpu.solve.decode import decode_path
from phi_tpu.solve.dp import solve_dp
from phi_tpu.solve.prep import build_solver_tables


def test_recovers_recombinant():
    rng = np.random.default_rng(11)
    gfa, hap_seqs = synth_pangenome(rng, length=20000, n_haps=6,
                                    var_rate=0.01)
    G = tensorize(gfa)
    # target: hap 2 until 8000, then hap 5
    reads, target = sample_reads(rng, hap_seqs, coverage=4.0, read_len=150,
                                 error_rate=0.0,
                                 recomb_breaks=[(8000, 5)])
    # start on hap 2's prefix: rebuild target from hap 2 then hap 5
    target = hap_seqs[2][:8000] + hap_seqs[5][8000:]
    reads, _ = sample_reads(rng, [target], coverage=4.0, read_len=150,
                            error_rate=0.0)
    k, w = 19, 11
    max_len = max(len(r) for r in reads)
    codes = np.full((len(reads), max_len), 4, np.uint8)
    lengths = np.zeros(len(reads), np.int32)
    for i, r in enumerate(reads):
        codes[i, :len(r)] = encode_seq(r)
        lengths[i] = len(r)
    spectrum = sketch_read_batch(codes, k, w, lengths)
    sketches = sketch_haplotypes(G, k, w)
    anchors = build_anchor_tables(G, k, sketches, spectrum, 1.0)
    tables = build_solver_tables(G, anchors, R=20.0)
    M, ends, sweeps, dp_obj = solve_dp(tables)
    res = decode_path(G, tables, anchors, M, ends, sweeps, dp_obj)
    out = G.path_seq(res.vertices)
    from phi_tpu import native
    d = native.edit_distance(out, target)
    # exact recovery expected: error-free reads at 4x, distinctive variants
    assert d == 0, f"edit distance {d}"
    assert res.n_switches >= 1  # it actually recombined
