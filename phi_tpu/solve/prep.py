"""Host-side preparation of the solver's dense tables.

Encodes the reference's expanded graph (ILP_index.cpp:1160-1409) as flat
arrays over lane states (h, p):
  - switch edges exist per graph edge (u,v) from every lane h through u whose
    next vertex in h is not v (exactly when the reference adds an in-edge to
    w_{u,v}, ILP_index.cpp:1250-1279), into every lane through v (out-edges
    :1281-1302), at total cost R;
  - in-lane edges are consecutive walk positions (cost 0).
"""

from __future__ import annotations

import dataclasses
import threading

import numpy as np

from phi_tpu.anchors.join import AnchorTables, credit_arrays
from phi_tpu.graph.pangenome import PangenomeGraph, ragged_arange


@dataclasses.dataclass
class SolverTables:
    S: np.ndarray             # float32 [H, P] entry charge (starts < p)
    B: np.ndarray             # float32 [H, P] exit reward (ends <= p)
    esrc_h: np.ndarray        # int32 [n_src] lane of diverging source state
    esrc_p: np.ndarray        # int32 [n_src] position of source state
    esrc_target: np.ndarray   # int32 [n_src] target vertex of the graph edge
    esrc_edge: np.ndarray     # int32 [n_src] graph edge id (decode/report)
    state_vertex: np.ndarray  # int32 [H, P] (= walk_mat, -1 pad)
    walk_len: np.ndarray      # int32 [H]
    R: float
    const: float              # sum of occurrence-kmer weights (Σ_i mu_i)
    n_vtx: int

    @property
    def H(self) -> int:
        return self.state_vertex.shape[0]

    @property
    def P(self) -> int:
        return self.state_vertex.shape[1]


def switch_sources(graph: PangenomeGraph) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(esrc_h, esrc_p, esrc_target, esrc_edge): one row per (edge, diverging
    source lane). Lanes whose next vertex equals the edge target may not pay
    into the switch vertex (they must take the free in-lane edge instead)."""
    H, P = graph.walk_mat.shape
    lov = graph.lanes_of_vertex
    u_e, v_e = graph.edge_u, graph.edge_v
    counts = (lov.off[u_e + 1] - lov.off[u_e]).astype(np.int64)
    rep_edge = np.repeat(np.arange(len(u_e), dtype=np.int64), counts)
    idx = np.repeat(lov.off[u_e], counts) + ragged_arange(counts)
    flat = lov.values[idx]
    sh = (flat // P).astype(np.int32)
    sp = (flat % P).astype(np.int32)
    # next vertex in lane (or -1 at lane end — lane ends always diverge,
    # matching `index == paths[h].size()-1` in ILP_index.cpp:1255)
    next_vtx = np.full((H, P), -1, dtype=np.int32)
    next_vtx[:, :-1] = graph.walk_mat[:, 1:]
    diverge = next_vtx[sh, sp] != v_e[rep_edge]
    return (sh[diverge], sp[diverge],
            v_e[rep_edge[diverge]].astype(np.int32),
            rep_edge[diverge].astype(np.int32))


_esrc_lock = threading.Lock()


def switch_sources_cached(graph: PangenomeGraph):
    """switch_sources depends only on the graph; cache it on the instance so
    Lagrangian refinement rounds (and the compile-prewarm thread) never
    recompute the tens-of-millions-row expansion."""
    cached = getattr(graph, "_esrc_cache", None)
    if cached is None:
        with _esrc_lock:
            cached = getattr(graph, "_esrc_cache", None)
            if cached is None:
                cached = switch_sources(graph)
                graph._esrc_cache = cached
    return cached


def build_solver_tables(graph: PangenomeGraph, anchors: AnchorTables,
                        R: float) -> SolverTables:
    S, B = credit_arrays(graph, anchors)
    esrc_h, esrc_p, esrc_target, esrc_edge = switch_sources_cached(graph)
    # const term: each model k-mer contributes weight mu_i (occ_weight is
    # per-occurrence but equal across occurrences of a k-mer)
    if len(anchors.occ_kmer):
        _, first = np.unique(anchors.occ_kmer, return_index=True)
        const = float(anchors.occ_weight[first].sum())
    else:
        const = 0.0
    return SolverTables(
        S=S, B=B, esrc_h=esrc_h, esrc_p=esrc_p,
        esrc_target=esrc_target, esrc_edge=esrc_edge,
        state_vertex=graph.walk_mat, walk_len=graph.walk_len,
        R=float(R), const=const, n_vtx=graph.n_vtx,
    )
