"""Leave-one-out cross-validation harness (eval/crossval.py) on a toy
panel: every fold runs end-to-end, scores against the held-out truth, and
reports the best-panel-hap baseline."""

import os

import numpy as np

from phi_tpu.eval.crossval import leave_one_out
from phi_tpu.eval.synth import synth_pangenome
from phi_tpu.io.gfa import write_gfa


def test_leave_one_out_toy(tmp_path):
    rng = np.random.default_rng(3)
    g, _seqs = synth_pangenome(rng, length=8000, n_haps=3)
    p = os.path.join(tmp_path, "toy.gfa")
    write_gfa(g, path=p)
    rows = leave_one_out(p, coverage=3.0, error_rate=0.001, seed=7)
    assert len(rows) == 3
    for r in rows:
        assert r["edit"] <= r["best_hap_edit"], r
        assert r["best_hap"] != r["target"]
        assert r["gap"] >= 0.0
        assert 0.0 < r["identity"] <= 1.0


def test_leave_one_out_target_filter(tmp_path):
    rng = np.random.default_rng(4)
    g, _seqs = synth_pangenome(rng, length=6000, n_haps=3)
    p = os.path.join(tmp_path, "toy.gfa")
    write_gfa(g, path=p)
    names = [g.walk_names[1]]
    rows = leave_one_out(p, coverage=2.0, seed=1, targets=names)
    assert [r["target"] for r in rows] == names
