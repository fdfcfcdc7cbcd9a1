"""Spectrum construction, hap-vs-read minimizer join, and threshold filtering.

Replaces ILP_index's anchor machinery (/root/reference/src/ILP_index.cpp:
  - Sp_R spectrum             :615-636
  - compute_anchors hash join :495-526
  - threshold filter          :670-722)
with sorted-array joins over packed 64-bit canonical k-mer keys (a perfect
hash — no collisions, unlike the reference's Murmur fold).

An anchor occurrence is the walk-position interval [s, e] the k-mer's bases
span in a haplotype walk (the reference's topologically-sorted unique-vertex
run, ILP_index.cpp:416-439, is exactly walk[h][s..e] because walk positions
are consecutive and each vertex occurs once in a DAG walk).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from phi_tpu.graph.pangenome import PangenomeGraph
from phi_tpu.sketch.encode import combine64
from phi_tpu.sketch.minimizer import sketch_sequence


@dataclasses.dataclass
class AnchorTables:
    """Everything the solver needs, plus the log-contract stats."""

    # Retained multi-vertex occurrences (solver credit intervals). On the
    # device-resident anchor path (anchors/device.py) these start as None
    # with `device_occ` holding the on-chip columns; materialize_device()
    # fills them from the (async, solve-overlapped) host copies before
    # decode or refinement touches them.
    occ_hap: np.ndarray        # int32 [n_occ]
    occ_start: np.ndarray      # int32 [n_occ]  walk position of first vertex
    occ_end: np.ndarray        # int32 [n_occ]  walk position of last vertex (> start)
    occ_kmer: np.ndarray       # int32 [n_occ]  spectrum id of the k-mer
    occ_weight: np.ndarray     # float32 [n_occ] Lagrangian weights (init 1.0)
    n_model_kmers: int         # kmers with >=1 multi-vertex occurrence (count_kmer_matches)
    # Stats for the [M::] log contract:
    spectrum_size: int
    filtered_kmers: int        # spectrum k-mers dropped by the threshold filter
    per_hap_minimizers: np.ndarray  # int64 [H]
    per_hap_anchors: np.ndarray     # int64 [H] retained occurrence counts (incl. span-0)
    device_occ: object | None = None  # anchors.device.DeviceOcc

    def materialize_device(self) -> None:
        if self.device_occ is None or self.occ_hap is not None:
            return
        hap, s, e, kid = self.device_occ.materialize()
        self.occ_hap = hap
        self.occ_start = s
        self.occ_end = e
        self.occ_kmer = kid
        self.occ_weight = np.ones(len(hap), np.float32)


_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)
_U64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64-style finalizer for run-identity hashing."""
    x ^= x >> np.uint64(30)
    x = x * _M1
    x ^= x >> np.uint64(27)
    x = x * _M2
    x ^= x >> np.uint64(31)
    return x


def _run_hashes(graph: PangenomeGraph, hap: np.ndarray, start: np.ndarray,
                end: np.ndarray) -> np.ndarray:
    """Order-sensitive hash of the vertex run walk[h][s..e] per occurrence.

    Stands in for the reference's stringified vertex path used as the anchor
    group key (`anchor_str`, ILP_index.cpp:680-683). Full-array gathers with
    masked updates — no per-iteration index compaction."""
    n = len(hap)
    h = np.ones(n, dtype=np.uint64)
    if n == 0:
        return h
    span = (end - start).astype(np.int64)
    wm_flat = graph.walk_mat.reshape(-1).astype(np.uint64)
    P = graph.walk_mat.shape[1]
    flat = hap.astype(np.int64) * P + start.astype(np.int64)
    max_span = int(span.max())
    # dense head: every occurrence has span >= 1 (solver intervals) and the
    # vast majority span exactly 1-2 nodes; mix those with full-array ops
    head = min(max_span, 2)
    for j in range(head + 1):
        act = span >= j
        vtx = wm_flat[flat + j * act]  # inactive rows re-read j=0 (masked out)
        h = np.where(act, _mix64(h ^ vtx), h)
    if max_span > head:
        # sparse tail: compact once, then iterate over the shrinking subset
        rest = np.flatnonzero(span > head)
        hr = h[rest]
        flat_r = flat[rest]
        span_r = span[rest]
        for j in range(head + 1, max_span + 1):
            act = np.flatnonzero(span_r >= j)
            vtx = wm_flat[flat_r[act] + j]
            hr[act] = _mix64(hr[act] ^ vtx)
        h[rest] = hr
    return h


def sketch_haplotypes(graph: PangenomeGraph, k: int, w: int,
                      progress=None) -> list[tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Per-hap minimizer lists (hi, lo, base_pos) — ILP_index::index_kmers."""
    out = []
    for h in range(graph.num_walks):
        codes = graph.walk_seq_codes(h)
        res = sketch_sequence(codes, k, w)
        out.append(res)
        if progress is not None:
            progress(h, len(res[0]))
    return out


def build_anchor_tables(graph: PangenomeGraph, k: int,
                        hap_sketches: list[tuple[np.ndarray, np.ndarray, np.ndarray]],
                        read_spectrum: tuple[np.ndarray, np.ndarray],
                        threshold: float) -> AnchorTables:
    """Host-side join path (behavioral reference; also the fallback when
    sequences contain non-ACGT bases — see sketch_join_sequence)."""
    H = graph.num_walks
    sp_key = combine64(*read_spectrum)          # sorted unique uint64
    spectrum_size = len(sp_key)

    hits: list[tuple[int, np.ndarray, np.ndarray]] = []
    for h in range(H):
        hi, lo, pos = hap_sketches[h]
        if len(hi) == 0 or spectrum_size == 0:
            hits.append((len(hi), np.zeros(0, np.int32), np.zeros(0, np.int32)))
            continue
        key = combine64(hi, lo)
        idx = np.searchsorted(sp_key, key)
        idx_c = np.minimum(idx, spectrum_size - 1)
        hit = sp_key[idx_c] == key
        hits.append((len(hi), pos[hit].astype(np.int32),
                     idx[hit].astype(np.int32)))
    return anchor_tables_from_hits(graph, k, hits, spectrum_size, threshold)


def anchor_tables_from_hits(graph: PangenomeGraph, k: int,
                            hits: list[tuple[int, np.ndarray, np.ndarray]],
                            spectrum_size: int,
                            threshold: float) -> AnchorTables:
    """Build solver tables from per-hap join hits:
    hits[h] = (n_minimizers, kmer_start_base_positions, spectrum_ids).

    Uses the native single-pass C++ kernel when available (the numpy path
    below is the behavioral reference, parity-tested); both implement the
    reference's compute_anchors + threshold filter semantics."""
    H = graph.num_walks
    per_hap_min = np.array([hits[h][0] for h in range(H)], np.int64)
    try:
        from phi_tpu.native import anchors_native
        nat = anchors_native(graph, k, hits, spectrum_size, threshold)
    except Exception:
        nat = None
    if nat is not None:
        occ_hap, occ_start, occ_end, occ_kmer, n_model, filtered, per_hap = nat
        return AnchorTables(
            occ_hap=occ_hap, occ_start=occ_start, occ_end=occ_end,
            occ_kmer=occ_kmer,
            occ_weight=np.ones(len(occ_hap), np.float32),
            n_model_kmers=n_model, spectrum_size=spectrum_size,
            filtered_kmers=filtered, per_hap_minimizers=per_hap_min,
            per_hap_anchors=per_hap)
    import sys
    print("[W::anchors] native anchor kernel unavailable or hit order "
          "violated; using the numpy fallback (slower at scale)",
          file=sys.stderr)
    return _anchor_tables_from_hits_py(graph, k, hits, spectrum_size,
                                       threshold)


def _anchor_tables_from_hits_py(graph: PangenomeGraph, k: int,
                                hits: list[tuple[int, np.ndarray, np.ndarray]],
                                spectrum_size: int,
                                threshold: float) -> AnchorTables:
    H = graph.num_walks
    parts_h, parts_s, parts_e, parts_id = [], [], [], []
    per_hap_minimizers = np.zeros(H, dtype=np.int64)
    for h in range(H):
        n_min, pos_hit, sp_id = hits[h]
        per_hap_minimizers[h] = n_min
        if len(pos_hit) == 0:
            continue
        pos_hit = pos_hit.astype(np.int64)
        # base interval [pos, pos+k-1] -> walk positions via node offsets
        cl = graph.walk_node_cumlen[h]
        s = np.searchsorted(cl, pos_hit, side="right") - 1
        e = np.searchsorted(cl, pos_hit + k - 1, side="right") - 1
        parts_h.append(np.full(len(pos_hit), h, dtype=np.int32))
        parts_s.append(s.astype(np.int32))
        parts_e.append(e.astype(np.int32))
        parts_id.append(sp_id.astype(np.int32))

    if parts_h:
        occ_hap = np.concatenate(parts_h)
        occ_start = np.concatenate(parts_s)
        occ_end = np.concatenate(parts_e)
        occ_kmer = np.concatenate(parts_id)
    else:
        occ_hap = np.zeros(0, np.int32)
        occ_start = np.zeros(0, np.int32)
        occ_end = np.zeros(0, np.int32)
        occ_kmer = np.zeros(0, np.int32)

    # --- threshold filter (ILP_index.cpp:670-722): group occurrences of each
    # spectrum k-mer by identical vertex run; if any group's occurrence count
    # reaches threshold * num_walks, drop the whole k-mer. ---
    filtered_kmers = 0
    keep_occ = np.ones(len(occ_hap), bool)
    if len(occ_hap):
        run_h = _run_hashes(graph, occ_hap, occ_start, occ_end)
        group = (_mix64(occ_kmer.astype(np.uint64) ^ run_h)) & _U64
        uniq, inv, counts = np.unique(group, return_inverse=True, return_counts=True)
        bad_group = counts.astype(np.float64) >= threshold * H
        occ_bad = bad_group[inv]
        bad_kmers = np.unique(occ_kmer[occ_bad])
        filtered_kmers = len(bad_kmers)
        idx = np.searchsorted(bad_kmers, occ_kmer)
        idx_c = np.minimum(idx, max(len(bad_kmers) - 1, 0))
        keep_occ = ~((idx < len(bad_kmers)) & (bad_kmers[idx_c] == occ_kmer)) \
            if len(bad_kmers) else np.ones(len(occ_kmer), bool)

    per_hap_anchors = np.bincount(occ_hap[keep_occ], minlength=H).astype(np.int64)

    # solver intervals: retained multi-vertex occurrences only
    multi = keep_occ & (occ_end > occ_start)
    n_model_kmers = len(np.unique(occ_kmer[multi]))

    return AnchorTables(
        occ_hap=occ_hap[multi], occ_start=occ_start[multi],
        occ_end=occ_end[multi], occ_kmer=occ_kmer[multi],
        occ_weight=np.ones(multi.sum(), np.float32),
        n_model_kmers=n_model_kmers,
        spectrum_size=spectrum_size,
        filtered_kmers=filtered_kmers,
        per_hap_minimizers=per_hap_minimizers,
        per_hap_anchors=per_hap_anchors,
    )


def credit_arrays(graph: PangenomeGraph, t: AnchorTables) -> tuple[np.ndarray, np.ndarray]:
    """The solver's S and B prefix arrays (DESIGN.md):
      B[h, p] = total weight of occurrences in lane h with end <= p
      S[h, p] = total weight of occurrences in lane h with start < p
    float32 [H, P] each.
    """
    H, P = graph.walk_mat.shape
    return credit_arrays_from_occ(t.occ_hap, t.occ_start, t.occ_end,
                                  t.occ_weight, H, P)


def credit_arrays_from_occ(occ_hap: np.ndarray, occ_start: np.ndarray,
                           occ_end: np.ndarray, occ_weight: np.ndarray,
                           H: int, P: int) -> tuple[np.ndarray, np.ndarray]:
    """credit_arrays from raw occurrence columns (no graph needed)."""
    # weighted bincount instead of np.add.at (unbuffered ufunc.at is ~10x
    # slower at millions of occurrences)
    b_idx = occ_hap.astype(np.int64) * P + occ_end
    B = np.bincount(b_idx, weights=occ_weight,
                    minlength=H * P).reshape(H, P).astype(np.float32)
    start_next = occ_start.astype(np.int64) + 1
    in_range = start_next < P
    s_idx = occ_hap[in_range].astype(np.int64) * P + start_next[in_range]
    S = np.bincount(s_idx, weights=occ_weight[in_range],
                    minlength=H * P).reshape(H, P).astype(np.float32)
    return np.cumsum(S, axis=1, dtype=np.float32), np.cumsum(B, axis=1, dtype=np.float32)
