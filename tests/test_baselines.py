"""Unit tests for eval/baselines.py — the native stand-ins for the
reference's VG/PanGenie comparison runners (data/run_VG.py, run_PG.py)."""

import numpy as np

from phi_tpu.eval.baselines import (best_panel_hap, run_best_hap_baseline,
                                    run_greedy_baseline)
from phi_tpu.graph import tensorize
from phi_tpu.io.build import build_gfa_data
from phi_tpu.io.gfa import write_gfa
from phi_tpu.sketch.minimizer import sketch_read_batch
from phi_tpu.io.gfa import encode_seq

SEGMENTS = {
    "X": "ACGTTGCAGGTTAACC", "A1": "TACCATTGAC", "B1": "AGGATCCTGA",
    "Y": "CAGTCAGTAACCGGTT", "A2": "CTTCCAGGTA", "B2": "GAACTTGCAC",
    "Z": "TGCATGCAATTGGCCA",
}
WALKS = [("hapA.0", ["X", "A1", "Y", "A2", "Z"]),
         ("hapB.0", ["X", "B1", "Y", "B2", "Z"])]


def _hap_seq(walk_segs):
    return "".join(SEGMENTS[s] for s in walk_segs)


def _reads_from(seq, n, L, step):
    return [seq[i * step:i * step + L] for i in range(n)]


def test_best_panel_hap_picks_matching_walk():
    graph = tensorize(build_gfa_data(SEGMENTS, WALKS))
    hap_a = _hap_seq(WALKS[0][1])
    reads = _reads_from(hap_a, 5, 24, 8)
    max_len = max(len(r) for r in reads)
    codes = np.full((len(reads), max_len), 4, np.uint8)
    lengths = np.zeros(len(reads), np.int32)
    for i, r in enumerate(reads):
        codes[i, :len(r)] = encode_seq(r)
        lengths[i] = len(r)
    spectrum = sketch_read_batch(codes, 5, 3, lengths)
    h, seq = best_panel_hap(graph, spectrum, 5, 3)
    assert graph.walk_names[h] == "hapA.0"
    assert seq == hap_a


def _write_instance(tmp_path):
    graph_data = build_gfa_data(SEGMENTS, WALKS)
    gfa = tmp_path / "toy.gfa"
    write_gfa(graph_data, path=str(gfa))
    hap_a = _hap_seq(WALKS[0][1])
    reads = tmp_path / "reads.fa"
    with open(reads, "w") as f:
        for i, r in enumerate(_reads_from(hap_a, 5, 24, 8)):
            f.write(f">r{i}\n{r}\n")
    truth = tmp_path / "truth.fa"
    truth.write_text(f">truth\n{hap_a}\n")
    return str(gfa), str(reads), str(truth)


def test_run_best_hap_baseline_end_to_end(tmp_path):
    gfa, reads, truth = _write_instance(tmp_path)
    res = run_best_hap_baseline(gfa, reads, truth, k=5, w=3)
    assert res["hap"] == "hapA.0"
    assert res["edit_distance"] == 0
    assert res["time_s"] >= 0


def test_run_greedy_baseline_end_to_end(tmp_path):
    gfa, reads, truth = _write_instance(tmp_path)
    res = run_greedy_baseline(gfa, reads, truth, k=5, w=3)
    # Reads are pure hapA: even free switching should reproduce it.
    assert res["edit_distance"] == 0
    assert res["recombinations"] >= 0
