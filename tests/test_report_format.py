"""Recombination report format parity — including the reference's boundary
quirk where a segment's reported end includes the first node of the next
segment (str_id advances before the hap-change check, ILP_index.cpp:1508-1529)."""

import numpy as np

from phi_tpu.emit import recombination_report
from phi_tpu.graph import tensorize
from phi_tpu.io.build import build_gfa_data


def _toy_graph():
    segments = {"a": "AAAA", "b": "CCC", "c": "GG", "d": "TTTTT"}
    walks = [("h1.0", ["a", "b", "c", "d"]), ("h2.0", ["a", "b", "c", "d"])]
    return tensorize(build_gfa_data(segments, walks))


def test_no_recombination_single_segment():
    G = _toy_graph()
    vertices = np.array([0, 1, 2, 3], np.int32)
    hap = np.array([0, 0, 0, 0], np.int32)
    n, segs = recombination_report(G, vertices, hap)
    assert n == 0
    assert segs == [">(h1.0,[0,13])"]  # total len 4+3+2+5=14 -> [0,13]


def test_recombination_boundary_arithmetic():
    G = _toy_graph()
    vertices = np.array([0, 1, 2, 3], np.int32)
    hap = np.array([0, 0, 1, 1], np.int32)  # switch at vertex c (len 2)
    n, segs = recombination_report(G, vertices, hap)
    assert n == 1
    # reference arithmetic: str_id after c = 4+3+2 = 9; first segment ends at
    # 9-1 = 8 (including c, the first node of the *new* hap — the quirk)
    assert segs == [">(h1.0,[0,8])", ">(h2.0,[9,13])"]


def test_double_switch():
    G = _toy_graph()
    vertices = np.array([0, 1, 2, 3], np.int32)
    hap = np.array([0, 1, 1, 0], np.int32)
    n, segs = recombination_report(G, vertices, hap)
    assert n == 2
    # faithful to the reference's arithmetic (ILP_index.cpp:1508-1529),
    # including the degenerate trailing segment [14,13] when the final
    # vertex itself switches hap (str_id has already passed the end)
    assert segs == [">(h1.0,[0,6])", ">(h2.0,[7,13])", ">(h1.0,[14,13])"]
