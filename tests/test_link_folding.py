"""Link-orientation folding parity: ILP_index::read_gfa keeps arcs whose
source vertex is forward-strand and halves ids regardless of target
orientation (ILP_index.cpp:53-84), with gfa-io adding each L-line arc plus
its complement. Net rules: L u ou v ov -> edge u->v if ou=='+', plus
edge v->u if ov=='-'."""

import numpy as np

from phi_tpu.io.gfa import _read_gfa_py


def _parse(links: str, tmp_path):
    text = "S\ta\tAAAA\nS\tb\tCCCC\n" + links
    p = tmp_path / "t.gfa"
    p.write_text(text)
    g = _read_gfa_py(str(p))
    return set(zip(g.edge_u.tolist(), g.edge_v.tolist()))


def test_plus_plus(tmp_path):
    assert _parse("L\ta\t+\tb\t+\t0M\n", tmp_path) == {(0, 1)}


def test_plus_minus(tmp_path):
    # forward arc a->b plus complement source b-forward -> both directions
    assert _parse("L\ta\t+\tb\t-\t0M\n", tmp_path) == {(0, 1), (1, 0)}


def test_minus_plus(tmp_path):
    # source reverse, complement source reverse: no forward-strand arc at all
    assert _parse("L\ta\t-\tb\t+\t0M\n", tmp_path) == set()


def test_minus_minus(tmp_path):
    # complement of (a- -> b-) is (b+ -> a+)
    assert _parse("L\ta\t-\tb\t-\t0M\n", tmp_path) == {(1, 0)}


def test_native_matches_python_folding(tmp_path):
    from phi_tpu import native
    if not native.available():
        return
    text = ("S\ta\tAAAA\nS\tb\tCCCC\nS\tc\tGGGG\n"
            "L\ta\t+\tb\t+\t0M\nL\tb\t+\tc\t-\t0M\nL\ta\t-\tc\t-\t0M\n")
    p = tmp_path / "t.gfa"
    p.write_text(text)
    gp = _read_gfa_py(str(p))
    gn = native.parse_gfa_native(str(p))
    assert np.array_equal(gp.edge_u, gn.edge_u)
    assert np.array_equal(gp.edge_v, gn.edge_v)
