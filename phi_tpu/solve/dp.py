"""The Gurobi replacement: exact expanded-graph DP via prefix-min relaxation
sweeps — pure XLA, no sequential per-vertex loops (DESIGN.md).

Each sweep:
  D[h,p]   = M[h,p] - B[h,p]                       (exit values)
  Ent[v]   = min over diverging source states of D (one segment-min)
  E[h,p]   = R + Ent[vertex(h,p)]; lane starts also get entry 0
  M'[h,p]  = prefix-min over p of (E + S)          (associative scan)

M is monotonically non-increasing and bounded, and each sweep propagates
values across one more switch edge (in-lane propagation is global via the
prefix-min), so the fixpoint arrives after ~(max #switches on any optimal
prefix) sweeps. `lax.while_loop` until unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from phi_tpu.solve.prep import SolverTables

_INF = jnp.float32(jnp.inf)


@functools.partial(jax.jit, static_argnames=("n_vtx", "max_sweeps"))
def _solve_jit(S, B, esrc_h, esrc_p, esrc_target, state_vertex, walk_len,
               R, n_vtx: int, max_sweeps: int):
    H, P = S.shape
    valid = jnp.arange(P)[None, :] < walk_len[:, None]
    vtx_clip = jnp.maximum(state_vertex, 0)
    has_vtx = state_vertex >= 0

    def sweep(M):
        D = jnp.where(valid, M - B, _INF)
        sv = D[esrc_h, esrc_p]
        ent = jax.ops.segment_min(sv, esrc_target, num_segments=n_vtx,
                                  indices_are_sorted=False)
        e_state = jnp.where(has_vtx, ent[vtx_clip] + R, _INF)
        e_state = e_state.at[:, 0].set(jnp.minimum(e_state[:, 0], 0.0))
        A = jnp.where(valid, e_state + S, _INF)
        return jax.lax.associative_scan(jnp.minimum, A, axis=1)

    def cond(carry):
        M, M_prev, it = carry
        changed = jnp.any(M < M_prev - 1e-4)
        return (it < max_sweeps) & changed

    def body(carry):
        M, _, it = carry
        return sweep(M), M, it + 1

    M0 = jnp.full((H, P), _INF)
    M1 = sweep(M0)
    M, _, sweeps = jax.lax.while_loop(cond, body, (sweep(M1), M1, jnp.int32(2)))
    D = jnp.where(valid, M - B, _INF)
    ends = D[jnp.arange(H), jnp.maximum(walk_len - 1, 0)]
    ends = jnp.where(walk_len > 0, ends, _INF)
    return M, ends, sweeps


def solve_dp_both(t: SolverTables, max_sweeps: int = 256):
    """Run both credit accountings; returns
    ((M, ends), (M_opt, ends_opt), n_sweeps, lower_bound).

    The search DP charges entry at S[q] = sum(start < q), whose per-visit
    credit B[p] - S[q] equals (covered occurrences) - (occurrences spanning
    the whole visit) — an UNDER-count, so its value is a heuristic score,
    not a bound (exact per-visit credit is not separable into f(p) - g(q)).

    The second fixpoint uses the optimistic entry charge S := B (credit
    B[p] - B[q] = sum(q < end <= p), an over-count of coverable credit,
    since every covered occurrence has q <= start < end <= p). Its minimum
    is <= the local-credit relaxation optimum <= the reference's
    distinct-kmer ILP optimum — a valid lower bound, with slack only from
    entry-straddling occurrences at switch points (and from duplicate
    k-mer credit, which Lagrangian reweighting tightens). Both fixpoints
    are decodable paths; callers keep whichever re-scores better."""
    args = (jnp.asarray(t.esrc_h), jnp.asarray(t.esrc_p),
            jnp.asarray(t.esrc_target),
            jnp.asarray(t.state_vertex), jnp.asarray(t.walk_len),
            jnp.float32(t.R), t.n_vtx, max_sweeps)
    B_dev = jnp.asarray(t.B)
    M, ends, sweeps = _solve_jit(jnp.asarray(t.S), B_dev, *args)
    M_opt, ends_opt, sweeps_opt = _solve_jit(B_dev, B_dev, *args)
    M = np.asarray(M)
    ends = np.asarray(ends)
    M_opt = np.asarray(M_opt)
    ends_opt = np.asarray(ends_opt)
    n_sweeps = max(int(sweeps), int(sweeps_opt))
    if n_sweeps >= max_sweeps:
        import sys
        print(f"[W::solve_dp] sweep cap {max_sweeps} reached; solution may be "
              "suboptimal (raise Options.max_sweeps)", file=sys.stderr)
    lb = float(t.const + ends_opt.min()) if len(ends_opt) else float(t.const)
    return (M, ends), (M_opt, ends_opt), n_sweeps, lb


def solve_dp(t: SolverTables, max_sweeps: int = 256):
    """Returns (M, ends, n_sweeps, dp_objective). dp_objective is the valid
    lower bound from the optimistic accounting (see solve_dp_both); M/ends
    are the search DP's, for decoding."""
    (M, ends), _, n_sweeps, lb = solve_dp_both(t, max_sweeps)
    return M, ends, n_sweeps, lb
