"""Convergence-based sharded solver vs the single-chip solver."""

import jax.numpy as jnp
import numpy as np
import pytest

from phi_tpu.parallel.sharded import (make_mesh, prepare_sharded_tables,
                                      sharded_solve)
from phi_tpu.solve.dp import solve_dp
from phi_tpu.testing import tiny_instance


@pytest.mark.parametrize("n_devices", [2, 4, 8])
def test_sharded_solve_matches_single_chip(n_devices):
    k, w, R = 4, 2, 1.0
    graph, codes, lengths, spectrum, anchors, t = tiny_instance(k, w, R)
    mesh = make_mesh(n_devices)
    S, B, state_vertex, walk_len = prepare_sharded_tables(t, mesh)
    solver = sharded_solve(mesh, R=R, n_vtx=t.n_vtx)
    M, end_min, sweeps = solver(
        jnp.asarray(S), jnp.asarray(B),
        jnp.asarray(state_vertex), jnp.asarray(walk_len),
        jnp.asarray(t.esrc_h), jnp.asarray(t.esrc_p),
        jnp.asarray(t.esrc_target))
    import dataclasses as dc
    _, ends, _, _ = solve_dp(dc.replace(t, n_layers=None))  # like-for-like: bracket
    assert float(end_min) == pytest.approx(float(ends.min()), abs=1e-4)
    assert int(sweeps) < 256


def test_sharded_solve_synthetic():
    from phi_tpu.anchors.join import build_anchor_tables, sketch_haplotypes
    from phi_tpu.eval.synth import sample_reads, synth_pangenome
    from phi_tpu.graph import tensorize
    from phi_tpu.io.gfa import encode_seq
    from phi_tpu.sketch.minimizer import sketch_read_batch
    from phi_tpu.solve.prep import build_solver_tables

    rng = np.random.default_rng(5)
    gfa, hap_seqs = synth_pangenome(rng, length=12000, n_haps=4, var_rate=0.01)
    G = tensorize(gfa)
    target = hap_seqs[0][:6000] + hap_seqs[3][6000:]
    reads, _ = sample_reads(rng, [target], coverage=3.0, read_len=120)
    k, w = 15, 9
    codes = np.full((len(reads), 120), 4, np.uint8)
    lengths = np.zeros(len(reads), np.int32)
    for i, r in enumerate(reads):
        codes[i, :len(r)] = encode_seq(r)
        lengths[i] = len(r)
    spectrum = sketch_read_batch(codes, k, w, lengths)
    sk = sketch_haplotypes(G, k, w)
    an = build_anchor_tables(G, k, sk, spectrum, 1.0)
    t = build_solver_tables(G, an, 25.0)

    mesh = make_mesh(8)
    S, B, sv, wl = prepare_sharded_tables(t, mesh)
    solver = sharded_solve(mesh, R=25.0, n_vtx=t.n_vtx)
    M, end_min, sweeps = solver(
        jnp.asarray(S), jnp.asarray(B), jnp.asarray(sv), jnp.asarray(wl),
        jnp.asarray(t.esrc_h), jnp.asarray(t.esrc_p),
        jnp.asarray(t.esrc_target))
    import dataclasses as dc
    M_single, ends, _, _ = solve_dp(dc.replace(t, n_layers=None))  # bracket pair
    assert float(end_min) == pytest.approx(float(ends.min()), abs=1e-3)
    # the sharded fixpoint matches the single-chip fixpoint on the
    # unpadded (finite) region
    H, P = t.state_vertex.shape
    Ms = np.asarray(M)[:H, :P]
    finite = np.isfinite(M_single)
    assert np.allclose(Ms[finite], M_single[finite], atol=1e-3)


def test_solve_dp_sharded_drop_in():
    """solve_dp_sharded feeds the standard decoder identically to solve_dp."""
    from phi_tpu.parallel.sharded import solve_dp_sharded
    from phi_tpu.solve.decode import decode_path

    k, w, R = 4, 2, 1.0
    graph, codes, lengths, spectrum, anchors, t = tiny_instance(k, w, R)
    mesh = make_mesh(8)
    M_s, ends_s, sweeps_s, obj_s = solve_dp_sharded(t, mesh)
    M_1, ends_1, sweeps_1, obj_1 = solve_dp(t)
    assert obj_s == pytest.approx(obj_1, abs=1e-4)
    res_s = decode_path(graph, t, anchors, M_s, ends_s, sweeps_s, obj_s)
    res_1 = decode_path(graph, t, anchors, M_1, ends_1, sweeps_1, obj_1)
    assert res_s.segments == res_1.segments
    assert np.array_equal(res_s.vertices, res_1.vertices)


def test_solve_dp_sharded_exact_mode():
    """Exact-credit sharded solver (W layers sharded) == single-chip exact
    solver, values and decode both."""
    from phi_tpu.parallel.sharded import solve_dp_sharded
    from phi_tpu.solve.decode import decode_path

    k, w, R = 4, 2, 1.0
    graph, codes, lengths, spectrum, anchors, t = tiny_instance(k, w, R)
    assert t.n_layers is not None
    mesh = make_mesh(8)
    M_s, ends_s, sweeps_s, obj_s = solve_dp_sharded(t, mesh)
    M_1, ends_1, sweeps_1, obj_1 = solve_dp(t)
    assert obj_s == pytest.approx(obj_1, abs=1e-4)
    assert np.allclose(np.where(np.isfinite(M_1), M_s, 0),
                       np.where(np.isfinite(M_1), M_1, 0), atol=1e-3)
    res_s = decode_path(graph, t, anchors, M_s, ends_s, sweeps_s, obj_s)
    res_1 = decode_path(graph, t, anchors, M_1, ends_1, sweeps_1, obj_1)
    assert res_s.segments == res_1.segments
