"""Decode-side output: recombination segment report + haplotype sequence.

Replicates the reference's report format and boundary arithmetic exactly
(ILP_index.cpp:1508-1550), including its convention that a segment's reported
end includes the first node of the following segment (str_id is advanced
before the hap-change check).
"""

from __future__ import annotations

import numpy as np

from phi_tpu.graph.pangenome import PangenomeGraph


def recombination_report(graph: PangenomeGraph, vertices: np.ndarray,
                         vertex_hap: np.ndarray) -> tuple[int, list[str]]:
    names = graph.walk_names
    node_len = graph.gfa.node_len
    n = len(vertices)
    if n == 0:
        return 0, []
    recomb = 0
    segs: list[str] = []
    prev_hap = int(vertex_hap[0])
    prev_str_id = 0
    str_id = int(node_len[vertices[0]])
    for i in range(1, n):
        str_id += int(node_len[vertices[i]])
        h = int(vertex_hap[i])
        if h != prev_hap:
            recomb += 1
            segs.append(f">({names[prev_hap]},[{prev_str_id},{str_id - 1}])")
            prev_hap = h
            prev_str_id = str_id
    segs.append(f">({names[int(vertex_hap[-1])]},[{prev_str_id},{str_id - 1}])")
    if recomb == 0:
        total = int(node_len[vertices].sum())
        segs = [f">({names[prev_hap]},[0,{total - 1}])"]
    return recomb, segs
