"""Edge cases the reference handles implicitly: linear reference graphs
(ILP_index.cpp:57-60 lin_ref), reads with no anchors, single-walk graphs."""

import numpy as np

from phi_tpu.anchors.join import build_anchor_tables, sketch_haplotypes
from phi_tpu.graph import tensorize
from phi_tpu.io.build import build_gfa_data
from phi_tpu.io.gfa import encode_seq
from phi_tpu.sketch.minimizer import sketch_read_batch
from phi_tpu.solve.decode import decode_path
from phi_tpu.solve.dp import solve_dp
from phi_tpu.solve.prep import build_solver_tables


def _reads_codes(reads):
    max_len = max(len(r) for r in reads)
    codes = np.full((len(reads), max_len), 4, np.uint8)
    lengths = np.zeros(len(reads), np.int32)
    for i, r in enumerate(reads):
        codes[i, :len(r)] = encode_seq(r)
        lengths[i] = len(r)
    return codes, lengths


def _solve(G, reads, k=5, w=3, R=10.0):
    codes, lengths = _reads_codes(reads)
    spectrum = sketch_read_batch(codes, k, w, lengths)
    sk = sketch_haplotypes(G, k, w)
    an = build_anchor_tables(G, k, sk, spectrum, 1.0)
    tb = build_solver_tables(G, an, R)
    M, ends, sweeps, obj = solve_dp(tb)
    return decode_path(G, tb, an, M, ends, sweeps, obj)


def test_linear_reference_single_walk():
    seq = "ACGTTGCACAGTCAGGTACCATGGACTT"
    g = build_gfa_data({"s1": seq}, [("ref.0", ["s1"])])
    G = tensorize(g)
    assert G.lin_ref
    res = _solve(G, [seq[3:20]])
    assert G.path_seq(res.vertices) == seq
    assert res.n_switches == 0


def test_no_matching_reads_picks_a_full_walk():
    segments = {"a": "ACGTTGCA", "x": "TACCA", "y": "AGGAT", "z": "TGCATGCA"}
    walks = [("h1.0", ["a", "x", "z"]), ("h2.0", ["a", "y", "z"])]
    G = tensorize(build_gfa_data(segments, walks))
    # reads unrelated to the graph
    res = _solve(G, ["CCCCCCCCCCCCCCCCCCCC"])
    out = G.path_seq(res.vertices)
    assert out in ("ACGTTGCATACCATGCATGCA", "ACGTTGCAAGGATTGCATGCA")
    assert res.n_switches == 0


def test_single_read_shorter_than_window():
    segments = {"a": "ACGTTGCA", "z": "TGCATGCA"}
    G = tensorize(build_gfa_data(segments, [("h.0", ["a", "z"])]))
    res = _solve(G, ["ACG"], k=5, w=3)  # read too short for any window
    assert len(res.vertices) == 2
