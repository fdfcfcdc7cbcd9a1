"""Broader randomized optimality stress: DP + refinement vs the brute-force
expanded-graph oracle across many instances, penalties, and filter settings."""

import numpy as np
import pytest

from phi_tpu.anchors.join import build_anchor_tables, sketch_haplotypes
from phi_tpu.config import Options
from phi_tpu.graph import tensorize
from phi_tpu.io.build import build_gfa_data
from phi_tpu.io.gfa import encode_seq
from phi_tpu.pipeline import _solve_with_refinement
from phi_tpu.sketch.minimizer import sketch_read_batch
from phi_tpu.solve.exact import brute_force_optimum
from phi_tpu.solve.prep import build_solver_tables


def _instance(seed):
    import random
    rng = random.Random(seed)
    bases = "ACGT"
    n_blocks = rng.randint(3, 5)
    n_haps = rng.randint(2, 4)
    segments = {}
    walks_segs = [[] for _ in range(n_haps)]
    for b in range(n_blocks):
        anchor = "".join(rng.choice(bases) for _ in range(rng.randint(4, 7)))
        segments[f"a{b}"] = anchor
        for h in range(n_haps):
            walks_segs[h].append(f"a{b}")
        if b < n_blocks - 1:
            n_alleles = rng.randint(1, 3)
            alleles = []
            for a in range(n_alleles):
                name = f"v{b}_{a}"
                segments[name] = "".join(rng.choice(bases)
                                         for _ in range(rng.randint(2, 6)))
                alleles.append(name)
            for h in range(n_haps):
                walks_segs[h].append(alleles[rng.randrange(n_alleles)])
    walks = [(f"hap{h}.0", walks_segs[h]) for h in range(n_haps)]
    g = tensorize(build_gfa_data(segments, walks))
    h = rng.randrange(n_haps)
    read = ""
    for b in range(len(walks_segs[h])):
        if rng.random() < 0.35:
            h = rng.randrange(n_haps)
        read += segments[walks_segs[h][b]]
    return g, read


@pytest.mark.parametrize("seed", range(10, 22))
def test_refined_solution_is_optimal(seed):
    import random
    graph, read = _instance(seed)
    rng = random.Random(seed)
    k = rng.choice([3, 4, 5])
    w = rng.choice([1, 2, 3])
    R = rng.choice([0.25, 1.0, 5.0])
    T = rng.choice([0.9, 1.0])
    opt = Options(k=k, w=w, recombination=R, threshold=T, lagrangian_rounds=8)
    codes = np.full((1, len(read)), 4, np.uint8)
    codes[0, :len(read)] = encode_seq(read)
    lengths = np.array([len(read)], np.int32)
    spectrum = sketch_read_batch(codes, k, w, lengths)
    sketches = sketch_haplotypes(graph, k, w)
    anchors = build_anchor_tables(graph, k, sketches, spectrum, T)
    res = _solve_with_refinement(graph, anchors, opt)
    tables = build_solver_tables(graph, anchors, R)
    exact, _ = brute_force_optimum(graph, tables, anchors)
    # primal feasibility and dual bound always bracket the optimum
    assert res.true_objective >= exact - 1e-3, f"k={k} w={w} R={R}"
    assert res.dp_objective <= exact + 1e-3, f"k={k} w={w} R={R}"


def test_duplicate_credit_trap_at_scale():
    """Engineered 10^3-state instance with heavy duplicate credit: lane B
    repeats a read motif at ~250 distinct loci, so the raw relaxation bound
    is wildly loose (measured: -61 vs true optimum 1.0 — every motif
    occurrence earns credit though the distinct k-mer counts once). The
    Lagrangian rounds must drive the duplicate multipliers down until the
    bound certifies the (known-by-construction) lane-A optimum within the
    0.5 integer tolerance (VERDICT round 1 §6)."""
    import random

    import numpy as np

    from phi_tpu.anchors.join import build_anchor_tables, sketch_haplotypes
    from phi_tpu.config import Options
    from phi_tpu.graph import tensorize
    from phi_tpu.io.build import build_gfa_data
    from phi_tpu.io.gfa import encode_seq
    from phi_tpu.pipeline import _solve_with_refinement
    from phi_tpu.sketch.minimizer import sketch_read_batch

    rng = random.Random(5)
    bases = "ACGT"
    motif = "ACGGTTCAAGGC"  # non-palindromic
    segments, A, B = {}, [], []
    sid = 0

    def seg(seq):
        nonlocal sid
        out = []
        for i in range(0, len(seq), 5):  # 5bp chop -> multi-node k-mers
            name = f"s{sid}"; sid += 1
            segments[name] = seq[i:i + 5]
            out.append(name)
        return out

    shared0 = seg("TTACCGGATCAA")
    A += shared0; B += shared0
    for b in range(250):
        A += seg("".join(rng.choice(bases) for _ in range(12)))
        # B repeats the motif at distinct loci, padded with unique junk so
        # each motif occurrence is a distinct anchor locus
        B += seg(motif + rng.choice(bases))
    sharedN = seg("GGTTACAGCATT")
    A += sharedN; B += sharedN
    graph = tensorize(build_gfa_data(
        segments, [("A.0", A), ("B.0", B)]))
    assert graph.walk_len.max() >= 700  # ~10^3 lane states

    read = "".join(segments[s] for s in A) + motif  # motif present once
    k, w = 8, 3
    codes = np.full((1, len(read)), 4, np.uint8)
    codes[0] = encode_seq(read)
    spectrum = sketch_read_batch(codes, k, w, np.array([len(read)], np.int32))
    sketches = sketch_haplotypes(graph, k, w)
    anchors = build_anchor_tables(graph, k, sketches, spectrum, 1.0)

    opt = Options(k=k, w=w, recombination=100.0, lagrangian_rounds=12)
    res = _solve_with_refinement(graph, anchors, opt)
    # lane A covers every model k-mer except possibly motif-boundary ones
    assert res.n_switches == 0
    assert np.array_equal(res.vertices,
                          graph.walk_mat[0, :graph.walk_len[0]]), \
        "refinement must recover lane A despite B's duplicate credit"
    assert res.true_objective - res.dp_objective <= 0.5 + 1e-6, \
        f"gap not closed: {res.true_objective} vs {res.dp_objective}"


@pytest.mark.parametrize("seed,R", [(33, 0.5), (41, 3.0), (75, 0.5)])
def test_refinement_recovers_optimum_hard_cases(seed, R):
    """Instances where the one-shot relaxation decode is suboptimal (found
    by a 100-seed sweep vs brute force); the pipeline's Lagrangian
    refinement must recover the exact optimum."""
    import random

    import tests.test_solver as ts
    from phi_tpu.config import Options
    from phi_tpu.pipeline import _solve_with_refinement
    from phi_tpu.solve.exact import brute_force_optimum
    rng = random.Random(seed)
    graph, read = ts._random_instance(rng, n_blocks=rng.randint(3, 7),
                                      n_haps=rng.randint(2, 5))
    anchors, tables, _ = ts._full_solve(graph, [read], 4, 2, R)
    exact, _ = brute_force_optimum(graph, tables, anchors)
    res = _solve_with_refinement(graph, anchors,
                                 Options(k=4, w=2, recombination=R,
                                         lagrangian_rounds=8))
    assert res.dp_objective <= exact + 1e-3   # valid bound throughout
    assert res.true_objective <= exact + 1e-3  # exact optimum recovered
