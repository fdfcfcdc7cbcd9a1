"""Branch-and-bound escalation (solve/bnb.py): exact certification of
duplicate-k-mer duality gaps, validated against the brute-force oracle —
with the Lagrangian disabled, so B&B alone must close the gap."""

import numpy as np
import pytest

from phi_tpu.anchors.join import build_anchor_tables, sketch_haplotypes
from phi_tpu.config import Options
from phi_tpu.io.gfa import encode_seq
from phi_tpu.pipeline import gap_tol
from phi_tpu.sketch.minimizer import sketch_read_batch
from phi_tpu.solve.bnb import branch_and_bound
from phi_tpu.solve.exact import brute_force_optimum
from phi_tpu.solve.prep import build_solver_tables, solver_layers


def _setup(graph, read, k, w, R, T=1.0):
    codes = np.full((1, len(read)), 4, np.uint8)
    codes[0, :len(read)] = encode_seq(read)
    spectrum = sketch_read_batch(codes, k, w,
                                 np.array([len(read)], np.int32))
    anchors = build_anchor_tables(graph, k, sketch_haplotypes(graph, k, w),
                                  spectrum, T)
    return anchors


def _paralog_graph(seed, mult):
    import random
    from phi_tpu.eval.frontier import case_paralog  # noqa: F401 (shape ref)
    from phi_tpu.graph import tensorize
    from phi_tpu.io.build import build_gfa_data
    rng = random.Random(seed)
    bases = "ACGT"
    motif = "ACGGTTCAAGGC"
    segments = {}
    A, B = [], []
    sid = 0

    def seg(seq):
        nonlocal sid
        out = []
        for i in range(0, len(seq), 5):
            name = f"s{sid}"
            sid += 1
            segments[name] = seq[i:i + 5]
            out.append(name)
        return out

    shared0 = seg("TTACCGGATCAA")
    A += shared0
    B += shared0
    for _ in range(mult):
        A += seg("".join(rng.choice(bases) for _ in range(12)))
        B += seg(motif + rng.choice(bases))
    sharedN = seg("GGTTACAGCATT")
    A += sharedN
    B += sharedN
    graph = tensorize(build_gfa_data(segments, [("A.0", A), ("B.0", B)]))
    read = "".join(segments[s] for s in A) + motif
    return graph, read


@pytest.mark.parametrize("seed,mult", [(1, 3), (2, 4), (5, 5), (9, 3)])
def test_bnb_certifies_paralog_duplicates(seed, mult):
    """Paralog lanes give lane B duplicate motif credit; with zero
    Lagrangian rounds the root gap is open and B&B must certify the true
    optimum exactly (checked against the oracle)."""
    k, w, R = 8, 3, 100.0
    graph, read = _paralog_graph(seed, mult)
    anchors = _setup(graph, read, k, w, R)
    opt = Options(k=k, w=w, recombination=R, lagrangian_rounds=0)
    layers = solver_layers(graph, k)
    tables = build_solver_tables(graph, anchors, R, layers)
    exact, _ = brute_force_optimum(graph, tables, anchors)

    best, bound = branch_and_bound(graph, anchors, opt, gap_tol(R),
                                   layers=layers)
    assert best.true_objective == pytest.approx(exact, abs=1e-6), \
        "B&B incumbent must reach the brute-force optimum"
    assert best.true_objective - bound <= gap_tol(R) + 1e-6, \
        "B&B must certify (close the duality gap)"
    assert bound <= exact + 1e-6, "bound must stay a valid lower bound"


def test_bnb_noop_when_root_certified():
    graph, read = _paralog_graph(3, 1)
    k, w, R = 8, 3, 100.0
    anchors = _setup(graph, read, k, w, R)
    opt = Options(k=k, w=w, recombination=R, lagrangian_rounds=0)
    layers = solver_layers(graph, k)
    from phi_tpu.pipeline import _solve_and_decode
    tables = build_solver_tables(graph, anchors, R, layers)
    root = _solve_and_decode(graph, tables, anchors, opt)
    best, bound = branch_and_bound(graph, anchors, opt, gap_tol(R),
                                   incumbent=root, layers=layers)
    assert bound >= root.dp_objective - 1e-6
    assert best.true_objective <= root.true_objective + 1e-6
