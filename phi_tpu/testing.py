"""Small synthetic instances for compile checks, dryruns, and tests."""

from __future__ import annotations

import numpy as np

from phi_tpu.anchors.join import build_anchor_tables, sketch_haplotypes
from phi_tpu.graph import tensorize
from phi_tpu.io.build import build_gfa_data
from phi_tpu.io.gfa import encode_seq
from phi_tpu.sketch.minimizer import sketch_read_batch
from phi_tpu.solve.prep import build_solver_tables


def tiny_instance(k: int = 4, w: int = 2, R: float = 1.0):
    """Two-hap two-site mosaic graph + reads; returns
    (graph, reads_codes, read_lengths, spectrum, anchors, tables)."""
    segments = {
        "X": "ACGTTGCA", "A1": "TACCA", "B1": "AGGAT",
        "Y": "CAGTCAGT", "A2": "CTTCC", "B2": "GAACT",
        "Z": "TGCATGCA",
    }
    walks = [("hapA.0", ["X", "A1", "Y", "A2", "Z"]),
             ("hapB.0", ["X", "B1", "Y", "B2", "Z"])]
    graph = tensorize(build_gfa_data(segments, walks))
    reads = [
        segments["X"] + segments["A1"] + segments["Y"],
        segments["Y"] + segments["B2"] + segments["Z"],
        segments["A1"] + segments["Y"] + segments["B2"],
        segments["X"] + segments["B1"] + segments["Y"] + segments["A2"],
    ]
    max_len = max(len(r) for r in reads)
    codes = np.full((len(reads), max_len), 4, np.uint8)
    lengths = np.zeros(len(reads), np.int32)
    for i, r in enumerate(reads):
        codes[i, :len(r)] = encode_seq(r)
        lengths[i] = len(r)
    spectrum = sketch_read_batch(codes, k, w, lengths)
    sketches = sketch_haplotypes(graph, k, w)
    anchors = build_anchor_tables(graph, k, sketches, spectrum, 1.0)
    tables = build_solver_tables(graph, anchors, R)
    return graph, codes, lengths, spectrum, anchors, tables
