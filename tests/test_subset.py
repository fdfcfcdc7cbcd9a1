"""Panel subsetting (chop_graph.sh:37-69 analog): kept walks keep their
sequences, unreachable segments/edges are pruned, subset runs end-to-end."""

import numpy as np
import pytest

from phi_tpu.eval.synth import synth_pangenome
from phi_tpu.io.gfa import read_gfa, write_gfa
from phi_tpu.io.subset import subset_panel


def _walk_seq(g, i):
    return "".join(g.node_seq(int(v)) for v in g.walks[i])


@pytest.fixture(scope="module")
def graph():
    rng = np.random.default_rng(7)
    g, _ = synth_pangenome(rng, length=5_000, n_haps=6, var_rate=0.02)
    return g


def test_subset_preserves_walk_sequences(graph):
    sub = subset_panel(graph, [0, 2, 5])
    assert sub.walk_names == [graph.walk_names[i] for i in (0, 2, 5)]
    for j, i in enumerate((0, 2, 5)):
        assert _walk_seq(sub, j) == _walk_seq(graph, i)


def test_subset_prunes_unvisited(graph):
    sub = subset_panel(graph, [0])
    # a single linear walk: exactly its segments, exactly its edges
    assert sub.n_vtx == len(np.unique(graph.walks[0]))
    assert len(sub.edge_u) <= len(graph.walks[0]) - 1
    # every kept edge is traversed by the walk
    traversed = set(zip(sub.walks[0][:-1].tolist(), sub.walks[0][1:].tolist()))
    assert set(zip(sub.edge_u.tolist(), sub.edge_v.tolist())) <= traversed


def test_subset_roundtrips_and_solves(graph, tmp_path):
    from phi_tpu.config import Options
    from phi_tpu.pipeline import run_pipeline
    sub = subset_panel(graph, [1, 3])
    p = tmp_path / "sub.gfa"
    write_gfa(sub, path=p)
    g2 = read_gfa(str(p))
    assert g2.walk_names == sub.walk_names
    assert _walk_seq(g2, 0) == _walk_seq(sub, 0)
    # reads from a kept hap solve to that hap exactly
    target = _walk_seq(graph, 3)
    reads = tmp_path / "reads.fa"
    with open(reads, "w") as f:
        for i in range(0, len(target) - 150, 97):
            f.write(f">r{i}\n{target[i:i + 150]}\n")
    out = tmp_path / "out.fa"
    res = run_pipeline(str(p), str(reads), str(out),
                       Options(k=15, w=5, lagrangian_rounds=0))
    assert res.sequence == target


def test_progressive_subsets_sweep(tmp_path, monkeypatch):
    """increasing.csv-style sweep: one graph, one read set, growing panels;
    edit distance must not increase when the panel grows."""
    monkeypatch.setenv("PHI_TPU_SCALE_CACHE", str(tmp_path))
    import importlib

    import phi_tpu.eval.scale as scale
    importlib.reload(scale)
    from phi_tpu.config import Options
    paths = scale.build_instance(4, length=20_000, coverage=2.0, seed=3,
                                 n_breaks=1)
    rows = scale.progressive_subsets(
        paths["gfa"], paths["reads"], paths["truth"], [2, 4],
        opt=Options(k=15, w=5, lagrangian_rounds=1),
        out_csv=str(tmp_path / "inc.csv"), target_runs=1)
    assert [r["n_haps"] for r in rows] == [2, 4]
    assert rows[1]["edit_distance"] <= rows[0]["edit_distance"]
    assert (tmp_path / "inc.csv").exists()
    importlib.reload(scale)


def test_subset_bad_index(graph):
    with pytest.raises(ValueError):
        subset_panel(graph, [99])


def test_subset_cli(graph, tmp_path, capsys):
    from phi_tpu.io.subset import main
    p = tmp_path / "g.gfa"
    write_gfa(graph, path=p)
    out = tmp_path / "sub.gfa"
    assert main(["-g", str(p), "-o", str(out), "-n", "3"]) == 0
    assert len(read_gfa(str(out)).walks) == 3
    keep = ",".join(graph.walk_names[i] for i in (4, 1))
    assert main(["-g", str(p), "-o", str(out), "--keep", keep]) == 0
    g3 = read_gfa(str(out))
    assert g3.walk_names == [graph.walk_names[4], graph.walk_names[1]]
    assert main(["-g", str(p), "-o", str(out), "--keep", "nope.0"]) == 1
    assert main(["-g", str(p), "-o", str(out), "-n", "0"]) == 1
