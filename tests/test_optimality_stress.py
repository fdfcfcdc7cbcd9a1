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
