"""Device-resident anchor pipeline: fused sketch+join -> on-device anchor
tables, with no bulk hit fetch through the device->host link.

The round-3 on-chip profile showed the haplotype join delivering ~110 MB of
raw hits over a ~30 MB/s device->host tunnel and rebuilding anchor tables on
the host (ILP_index.cpp:495-526 + :670-722 semantics). This module keeps the
entire hit stream on device:

  1. `_pallas_join_rows2` (sketch/kernels.py) emits per-hit walk-position
     intervals (s, e) + spectrum ids directly from the kernel;
  2. each batch is appended to a device accumulator (`_append_jit`,
     donated buffers, device-chained offsets — no host sync);
  3. the chunked finalize reproduces the reference's threshold filter on
     device:
     group = (k-mer, vertex-run identity) via a 64-bit substring polynomial
     hash over per-lane vertex prefix tables, per-k-mer occurrence counts,
     a min==max uniformity test that resolves single-run k-mers, and an
     exact ownership-table loop for the ambiguous remainder;
  4. retained multi-vertex occurrences are compacted on device and feed the
     solver without ever crossing the tunnel; a small async copy brings
     them to the host for decode / Lagrangian refinement, overlapped with
     the solve.

Semantics match anchors.join.anchor_tables_from_hits exactly up to the
internal group-hash function (both are 64-bit hashes of the same group
identity; decisions differ only on astronomically unlikely collisions).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from phi_tpu.graph.pangenome import PangenomeGraph

UMAX32 = jnp.uint32(0xFFFFFFFF)
# independent odd multipliers for the two polynomial prefix-hash moduli
_POLY1 = np.uint32(0x9E3779B1)
_POLY2 = np.uint32(0x85EBCA77)
_MAX_SPAN = 64            # pw table size; spans are <= k <= 31 by packing
_OWNER_ROUNDS = 16        # ownership-loop cap (expected ~3-4 rounds)


def _fmix32(x):
    """murmur3 finalizer (uint32 lanes)."""
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> jnp.uint32(13))
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> jnp.uint32(16))
    return x


@functools.partial(jax.jit, static_argnames=("P1", "P2"))
def _build_ph_jit(walk_mat, P1: int, P2: int):
    """Per-lane vertex-sequence prefix hashes PH[h, p] = hash of
    walk_mat[h, :p] under x -> x*POLY + (v+1) (u32 wraparound), PH[:, 0]=0.
    Substring (vertex run) hash of walk[s..e] is then
    PH[e+1] - PH[s] * POLY^(e-s+1) — exact run identity up to 2x32-bit
    collisions, the same guarantee class as the host path's u64 mix chain."""
    v = walk_mat.astype(jnp.uint32) + jnp.uint32(1)

    def scan_mod(poly):
        m = jnp.full(v.shape, jnp.uint32(poly))
        a = v

        def comb(left, right):
            ml, al = left
            mr, ar = right
            return ml * mr, al * mr + ar

        _, ph = jax.lax.associative_scan(comb, (m, a), axis=1)
        H = v.shape[0]
        return jnp.concatenate(
            [jnp.zeros((H, 1), jnp.uint32), ph], axis=1)

    return scan_mod(P1), scan_mod(P2)


def _pw_tables() -> tuple[np.ndarray, np.ndarray]:
    pw1 = np.ones(_MAX_SPAN + 2, np.uint32)
    pw2 = np.ones(_MAX_SPAN + 2, np.uint32)
    for i in range(1, _MAX_SPAN + 2):
        pw1[i] = (int(pw1[i - 1]) * int(_POLY1)) & 0xFFFFFFFF
        pw2[i] = (int(pw2[i - 1]) * int(_POLY2)) & 0xFFFFFFFF
    return pw1, pw2


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _append_jit(buf_se, buf_id, buf_hap, total, fse, fid, fhap):
    """Append one batch's flat hit columns at the device-chained offset.
    Buffers are donated (in-place update); `total` is the raw running count
    (unclamped — the caller detects overflow from the final value).
    buf_se holds the kernel's packed (walk_pos << 6) | span intervals."""
    cap = buf_se.shape[0]
    ct = fse.shape[0]
    off = jnp.minimum(total, jnp.int32(cap - ct))
    nh = jnp.sum(fid >= 0)
    buf_se = jax.lax.dynamic_update_slice(buf_se, fse, (off,))
    buf_id = jax.lax.dynamic_update_slice(buf_id, fid, (off,))
    buf_hap = jax.lax.dynamic_update_slice(
        buf_hap, jnp.maximum(fhap, 0).astype(jnp.uint8), (off,))
    return buf_se, buf_id, buf_hap, total + nh.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("tot_b",))
def _slice_jit(buf_se, buf_id, buf_hap, tot_b: int):
    return (jax.lax.dynamic_slice(buf_se, (0,), (tot_b,)),
            jax.lax.dynamic_slice(buf_id, (0,), (tot_b,)),
            jax.lax.dynamic_slice(buf_hap, (0,), (tot_b,)))


@functools.partial(jax.jit, static_argnames=("tot_b",))
def _chunk1_jit(buf, tot_b: int):
    return jax.lax.dynamic_slice(buf, (0,), (tot_b,))


@jax.jit
def _mkw_jit(c_s, n_occ):
    return (jnp.arange(c_s.shape[0], dtype=jnp.int32)
            < n_occ).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("tot_b",))
def _slice5_jit(c_s, c_span, c_id, c_hap, c_w, tot_b: int):
    return (jax.lax.dynamic_slice(c_s, (0,), (tot_b,)),
            jax.lax.dynamic_slice(c_span, (0,), (tot_b,)),
            jax.lax.dynamic_slice(c_id, (0,), (tot_b,)),
            jax.lax.dynamic_slice(c_hap, (0,), (tot_b,)),
            jax.lax.dynamic_slice(c_w, (0,), (tot_b,)))


# ---------------------------------------------------------------------------
# Chunked finalize: at chromosome scale the single-program filter would
# materialize ~11 occurrence-length temporaries (a compile-time
# RESOURCE_EXHAUSTED at 100 Mbp / ~280M hits). The same math runs as
# per-chunk passes with donated [Ksp]-sized accumulators:
#   pass 1 (per chunk): group hashes + ktot/umin/umax/vmin/vmax updates
#   mid    (once):      uniformity test -> kbad_uni, ambiguous k-mer set
#   pass 2a (per chunk): collect ambiguous occurrences (chained append)
#   owner  (once):      exact ownership-loop counts -> kbad
#   pass 2b (per chunk): keep/multi masks, compact retained (chained
#                        append), per-hap / model-k-mer accumulators
# ---------------------------------------------------------------------------


def _group_hashes(bufs, off, rem, ph1, ph2, pw1, pw2, Ksp, CH: int):
    """Slice one CH-row chunk out of the full accumulator buffers (fused
    into the reads by XLA — no host-side per-chunk copies) and compute the
    per-occurrence group hashes."""
    occ_se = jax.lax.dynamic_slice(bufs[0], (off,), (CH,))
    occ_id = jax.lax.dynamic_slice(bufs[1], (off,), (CH,))
    occ_hap = jax.lax.dynamic_slice(bufs[2], (off,), (CH,))
    N = CH
    Pp1 = ph1.shape[1]
    idx = jnp.arange(N, dtype=jnp.int32)
    valid = (idx < rem) & (occ_id >= 0)
    s32 = jnp.where(valid, (occ_se >> jnp.uint32(6)).astype(jnp.int32), 0)
    span32 = jnp.where(valid, (occ_se & jnp.uint32(63)).astype(jnp.int32), 0)
    hap32 = occ_hap.astype(jnp.int32)
    kid = jnp.where(valid, occ_id, Ksp)
    base = hap32 * Pp1
    i_lo = jnp.where(valid, base + s32, 0)
    i_hi = jnp.where(valid, base + s32 + span32 + 1, 0)
    sp1 = pw1[jnp.minimum(span32 + 1, pw1.shape[0] - 1)]
    sp2 = pw2[jnp.minimum(span32 + 1, pw2.shape[0] - 1)]
    rh1 = ph1.reshape(-1)[i_hi] - ph1.reshape(-1)[i_lo] * sp1
    rh2 = ph2.reshape(-1)[i_hi] - ph2.reshape(-1)[i_lo] * sp2
    idu = occ_id.astype(jnp.uint32)
    g1 = _fmix32(rh1 ^ _fmix32(idu * jnp.uint32(0x27D4EB2F)))
    g2 = _fmix32(rh2 ^ _fmix32(idu * jnp.uint32(0x165667B1)))
    return valid, s32, span32, hap32, kid, g1, g2, occ_id, occ_hap


@functools.partial(jax.jit, static_argnames=("Ksp", "CH"),
                   donate_argnums=(9, 10, 11, 12, 13))
def _fin_pass1_jit(buf_se, buf_id, buf_hap, off, rem, ph1, ph2, pw1, pw2,
                   ktot, umin, umax, vmin, vmax, Ksp: int, CH: int):
    valid, _, _, _, kid, g1, g2, _, _ = _group_hashes(
        (buf_se, buf_id, buf_hap), off, rem, ph1, ph2, pw1, pw2, Ksp, CH)
    u = g1 ^ g2
    v = g1 + g2
    big = UMAX32
    ktot = ktot.at[kid].add(valid.astype(jnp.int32), mode="drop")
    umin = umin.at[kid].min(jnp.where(valid, u, big), mode="drop")
    umax = umax.at[kid].max(jnp.where(valid, u, jnp.uint32(0)), mode="drop")
    vmin = vmin.at[kid].min(jnp.where(valid, v, big), mode="drop")
    vmax = vmax.at[kid].max(jnp.where(valid, v, jnp.uint32(0)), mode="drop")
    return ktot, umin, umax, vmin, vmax


@functools.partial(jax.jit, static_argnames=("Ksp",))
def _fin_mid_jit(ktot, umin, umax, vmin, vmax, th, Ksp: int):
    uniform = (umin == umax) & (vmin == vmax)
    hot = (ktot.astype(jnp.float32) >= th).at[Ksp].set(False)
    kbad_uni = (uniform & hot)[:Ksp]
    k_amb = (~uniform) & hot
    # exact ambiguous-occurrence count: pass 2a collects precisely the
    # occurrences of ambiguous k-mers, so its buffers can be sized exactly
    # (the round-4 TOT//16 heuristic silently sent real-MHC runs — 18%
    # ambiguous — to the host path on every call)
    n_amb = jnp.where(k_amb, ktot, 0).sum()
    return kbad_uni, k_amb, n_amb


@functools.partial(jax.jit, static_argnames=("Ksp", "CH"),
                   donate_argnums=(10, 11, 12))
def _fin_pass2a_jit(buf_se, buf_id, buf_hap, off, rem, ph1, ph2, pw1, pw2,
                    k_amb, ag1_buf, ag2_buf, aid_buf, a_total, Ksp: int,
                    CH: int):
    valid, _, _, _, kid, g1, g2, _, _ = _group_hashes(
        (buf_se, buf_id, buf_hap), off, rem, ph1, ph2, pw1, pw2, Ksp, CH)
    amb = valid & k_amb[kid]
    n = amb.sum().astype(jnp.int32)
    N = CH
    order = jnp.cumsum(amb.astype(jnp.int32)) - 1
    dst = jnp.where(amb, jnp.minimum(order, N - 1), N - 1)
    src = jnp.full(N + 1, N, jnp.int32).at[dst].set(
        jnp.where(amb, jnp.arange(N, dtype=jnp.int32), N), mode="drop")[:N]
    cg1 = jnp.concatenate([g1, jnp.zeros(1, jnp.uint32)])[src]
    cg2 = jnp.concatenate([g2, jnp.zeros(1, jnp.uint32)])[src]
    cid = jnp.concatenate([kid, jnp.full(1, Ksp, jnp.int32)])[src]
    cap = ag1_buf.shape[0]
    off = jnp.minimum(a_total, jnp.int32(max(cap - N, 0)))
    ag1_buf = jax.lax.dynamic_update_slice(ag1_buf, cg1, (off,))
    ag2_buf = jax.lax.dynamic_update_slice(ag2_buf, cg2, (off,))
    aid_buf = jax.lax.dynamic_update_slice(aid_buf, cid, (off,))
    return ag1_buf, ag2_buf, aid_buf, a_total + n


@functools.partial(jax.jit, static_argnames=("Ksp",))
def _fin_owner_jit(ag1, ag2, aid, a_total, th, kbad_uni, Ksp: int):
    amb_cap = ag1.shape[0]
    a_live = (jnp.arange(amb_cap, dtype=jnp.int32) < a_total) & (aid < Ksp)
    AM = max(2 * amb_cap, 8)
    big = UMAX32

    def cond(st):
        unpl, gcnt, r = st
        return jnp.any(unpl) & (r < _OWNER_ROUNDS)

    def body(st):
        unpl, gcnt, r = st
        slot = (_fmix32(ag1 + r.astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
                ^ ag2).astype(jnp.int32) & jnp.int32(AM - 1)
        t1 = jnp.full(AM, big, jnp.uint32).at[slot].min(
            jnp.where(unpl, ag1, big))
        cand = unpl & (t1[slot] == ag1)
        t2 = jnp.full(AM, big, jnp.uint32).at[slot].min(
            jnp.where(cand, ag2, big))
        win = cand & (t2[slot] == ag2)
        cnt_r = jnp.zeros(AM, jnp.int32).at[slot].add(win.astype(jnp.int32))
        gcnt = jnp.where(win, cnt_r[slot], gcnt)
        return unpl & ~win, gcnt, r + 1

    unpl, gcnt, rounds_used = jax.lax.while_loop(
        cond, body, (a_live, jnp.zeros(amb_cap, jnp.int32), jnp.uint32(0)))
    amb_bad = a_live & (gcnt.astype(jnp.float32) >= th)
    kbad_amb = jnp.zeros(Ksp + 1, jnp.int32).at[
        jnp.where(a_live, aid, Ksp)].max(amb_bad.astype(jnp.int32),
                                         mode="drop")
    kbad = jnp.concatenate(
        [kbad_uni | (kbad_amb[:Ksp] > 0), jnp.zeros(1, bool)])
    return kbad, jnp.any(unpl), rounds_used


@functools.partial(jax.jit, static_argnames=("Ksp", "H", "CH"),
                   donate_argnums=(10, 11, 12, 13, 15, 16))
def _fin_pass2b_jit(buf_se, buf_id, buf_hap, off, rem, ph1, ph2, pw1, pw2,
                    kbad, o_s, o_span, o_id, o_hap, o_total,
                    per_hap, kmulti, Ksp: int, H: int, CH: int):
    """Returns the updated accumulators plus this chunk's retained max
    span (host maxes across chunks for the solver's layer shrink)."""
    valid, s32, span32, hap32, kid, _, _, occ_id, occ_hap = _group_hashes(
        (buf_se, buf_id, buf_hap), off, rem, ph1, ph2, pw1, pw2, Ksp, CH)
    keep = valid & ~kbad[kid]
    per_hap = per_hap.at[jnp.where(keep, hap32, H - 1)].add(
        keep.astype(jnp.int32), mode="drop")
    multi = keep & (span32 > 0)
    kmulti = kmulti.at[kid].max(multi.astype(jnp.int32), mode="drop")
    N = CH
    n = multi.sum().astype(jnp.int32)
    order = jnp.cumsum(multi.astype(jnp.int32)) - 1
    dst = jnp.where(multi, jnp.minimum(order, N - 1), N - 1)
    src = jnp.full(N + 1, N, jnp.int32).at[dst].set(
        jnp.where(multi, jnp.arange(N, dtype=jnp.int32), N),
        mode="drop")[:N]
    c_s = jnp.concatenate([s32, jnp.zeros(1, jnp.int32)])[src]
    c_span = jnp.concatenate([span32.astype(jnp.uint8),
                              jnp.zeros(1, jnp.uint8)])[src]
    c_id = jnp.concatenate([occ_id, jnp.full(1, -1, jnp.int32)])[src]
    c_hap = jnp.concatenate([occ_hap, jnp.zeros(1, jnp.uint8)])[src]
    cap = o_s.shape[0]
    off = jnp.minimum(o_total, jnp.int32(max(cap - N, 0)))
    o_s = jax.lax.dynamic_update_slice(o_s, c_s, (off,))
    o_span = jax.lax.dynamic_update_slice(o_span, c_span, (off,))
    o_id = jax.lax.dynamic_update_slice(o_id, c_id, (off,))
    o_hap = jax.lax.dynamic_update_slice(o_hap, c_hap, (off,))
    mspan = jnp.where(multi, span32, 0).max()
    return o_s, o_span, o_id, o_hap, o_total + n, per_hap, kmulti, mspan


@functools.partial(jax.jit, static_argnames=("tot_b",))
def _fin_amb_slice_jit(ag1, ag2, aid, tot_b: int):
    return (jax.lax.dynamic_slice(ag1, (0,), (tot_b,)),
            jax.lax.dynamic_slice(ag2, (0,), (tot_b,)),
            jax.lax.dynamic_slice(aid, (0,), (tot_b,)))


@functools.partial(jax.jit, static_argnames=("Ksp",))
def _fin_tail_jit(o_total, ms_stack, unresolved, ktot, kbad, kmulti,
                  Ksp: int):
    """Combined end-of-finalize stats vector: one device->host fetch."""
    filtered = (kbad[:Ksp] & (ktot[:Ksp] > 0)).sum()
    n_model = kmulti[:Ksp].sum()
    return jnp.stack([o_total, ms_stack.max(),
                      unresolved.astype(jnp.int32),
                      filtered.astype(jnp.int32),
                      n_model.astype(jnp.int32)])


@dataclasses.dataclass
class DeviceOcc:
    """Device-resident retained occurrences + pending host copies."""
    dev_s: object            # jnp [Nb] int32 walk-position starts
    dev_span: object         # jnp [Nb] uint8
    dev_id: object           # jnp [Nb] int32 spectrum ids (-1 pad)
    dev_hap: object          # jnp [Nb] uint8
    dev_w: object            # jnp [Nb] float32 (1.0 live / 0.0 pad)
    n_occ: int
    n_model: int
    filtered: int
    per_hap_anchors: np.ndarray
    Nb: int
    max_span: int = 0       # max occ_end - occ_start among retained occ

    def start_host_copy(self) -> None:
        for a in (self.dev_s, self.dev_span, self.dev_id, self.dev_hap):
            try:
                a.copy_to_host_async()
            except AttributeError:
                pass

    def materialize(self):
        """(occ_hap, occ_start, occ_end, occ_kmer) int32 host arrays."""
        n = self.n_occ
        s = np.asarray(self.dev_s)[:n].astype(np.int32)
        span = np.asarray(self.dev_span)[:n].astype(np.int32)
        kid = np.asarray(self.dev_id)[:n].astype(np.int32)
        hap = np.asarray(self.dev_hap)[:n].astype(np.int32)
        return hap, s, s + span, kid


def bucket_pow(n: int, minimum: int = 1 << 15) -> int:
    """{2^k, 3*2^(k-1)} bucket (same family as solve.dp.bucket_size)."""
    from phi_tpu.solve.dp import bucket_size
    return bucket_size(max(n, 1), minimum)


def pack_row_starts(cumlens, rows, row_lanes: int, S_cap: int) -> np.ndarray:
    """Per-row sorted node-start offsets (int32, padded with row_lanes ->
    scatter-dropped) — the sparse upload that replaces the dense uint8
    delta plane of pack_row_deltas (16.8 MB/batch through a 20-50 MB/s
    tunnel). Offsets are >= 1 by construction (side='right' skips a node
    boundary AT the row start), matching the old packer's forced-zero
    lane 0."""
    R = len(rows)
    buf = np.full((R, S_cap), row_lanes, np.int32)
    for j, (si, start, nv, cont) in enumerate(rows):
        if si < 0:
            continue
        cl = cumlens[si]
        lo = np.searchsorted(cl, start, side="right")
        hi = np.searchsorted(cl, start + row_lanes)
        n = hi - lo
        buf[j, :n] = (cl[lo:hi] - start).astype(np.int32)
    return buf


def _row_start_cap(cumlens, rows, row_lanes: int) -> int:
    """Max node-start count over the batch rows, pow2-bucketed (the sparse
    pack's static lane count — one compiled program per bucket family)."""
    mx = 1
    for (si, start, nv, cont) in rows:
        if si < 0:
            continue
        cl = cumlens[si]
        n = (np.searchsorted(cl, start + row_lanes)
             - np.searchsorted(cl, start, side="right"))
        mx = max(mx, int(n))
    return 1 << max(10, int(mx - 1).bit_length())


# Device-resident cache of packed join batches. The packed words/starts are
# pure functions of (graph content, k, w, R, SB); re-runs on the same graph
# (the bench's warm best-of-3, parameter sweeps, --load-index refinements)
# skip the host 2-bit pack AND the h2d upload entirely. Content-keyed (the
# pipeline re-tensorizes the graph each run, so object identity misses);
# single slot (latest graph); gated by PHI_TPU_PACK_CACHE_MB (default 768).
_PACK_CACHE: dict = {}


def _graph_fingerprint(graph) -> tuple | None:
    """Cheap content fingerprint; None above the hashing-cost cutoff."""
    import zlib
    g = graph.gfa
    if g.seq_code.nbytes > (256 << 20):
        return None
    wm = np.ascontiguousarray(graph.walk_mat)
    return (zlib.crc32(g.seq_code), zlib.adler32(g.seq_code),
            zlib.crc32(wm.tobytes()), graph.n_vtx, graph.num_walks,
            tuple(int(x) for x in graph.walk_len))


def _warn(msg: str) -> None:
    import sys
    sys.stderr.write(f"[W::anchors] device path fallback: {msg}\n")


def join_anchors_device(graph: PangenomeGraph, seqs: list[np.ndarray],
                        k: int, w: int, sp_hi, sp_lo, threshold: float,
                        *, rows_per_call: int | None = None,
                        super_blocks: int | None = None,
                        interpret: bool = False):
    """Fused device sketch+join+anchor build over all haplotypes.

    Returns (per_hap_minimizers int64 [H], DeviceOcc) or None when the
    device path cannot run (non-ACGT walks, H > 255, overflow) — the caller
    falls back to the host hit path."""
    from phi_tpu.execache import cached_call
    from phi_tpu.sketch.kernels import (BLK, HALO_PAD, ROWS, SUPER_BLOCKS,
                                        _pack_rows_2bit, _pallas_join_rows2,
                                        _pallas_join_rows2_ck, join_caps,
                                        pack_row_deltas, row_base_nodes)
    from phi_tpu.sketch.minimizer import prepare_spectrum_bucket

    import os as _os2
    from time import perf_counter as _pnow
    _prof0 = _os2.environ.get("PHI_TPU_JOIN_PROF", "0") in ("1", "2")
    _tsetup = _pnow()

    def _mark(label):
        nonlocal _tsetup
        if _prof0:
            import sys as _sys
            now = _pnow()
            _sys.stderr.write(f"[danchor-prof] {label}: "
                              f"{now - _tsetup:.3f}\n")
            _tsetup = now

    R = rows_per_call or ROWS
    SB = super_blocks or SUPER_BLOCKS
    H = graph.num_walks
    if H > 255 or k + w - 2 > HALO_PAD:
        return None
    halo = k + w - 2
    sup = SB * BLK
    row_lanes = (SB + 1) * BLK

    rows: list[tuple[int, int, int, int]] = []
    per_hap_min = np.zeros(H, np.int64)
    est_windows = 0
    for i, codes in enumerate(seqs):
        L = len(codes)
        if L < w + k - 1:
            continue
        if (codes >= 4).any():
            return None  # host fallback for N-containing walks
        for start in range(0, max(1, L - halo), sup):
            nv = min(sup, L - halo - start)
            rows.append((i, start, nv, 1 if start else 0))
            est_windows += nv
    if not rows:
        return None
    _mark("rows+seqscan")

    # cuckoo probe when the spectrum fits (no bisect rounds — the probe
    # was ~45% of per-batch exec); mixed-bucket scheme otherwise
    from phi_tpu.ops.search import make_cuckoo
    ck = make_cuckoo(np.asarray(sp_hi), np.asarray(sp_lo))
    _mark("make_cuckoo")
    if ck is not None:
        Thi, Tlo, Tid, seed, _M = ck
        sp_args = (jnp.asarray(Thi), jnp.asarray(Tlo), jnp.asarray(Tid),
                   jnp.uint32(seed))
        rounds = None
    else:
        sp_m_np, sp_lo_np, sp_perm_np, sp_off_np, Sb, rounds, bits = \
            prepare_spectrum_bucket(sp_hi, sp_lo)
        sp_args = tuple(jnp.asarray(a) for a in
                        (sp_m_np, sp_lo_np, sp_perm_np, sp_off_np))

    # v3 kernel (in-kernel compaction + slot probe) needs the cuckoo table;
    # sparse start upload additionally needs the node density to make it a
    # win (4 B/start vs 1 B/base). 31 < k <= 63 runs the wide 4-word
    # kernel (v3-only; folded join keys match the host native scan).
    import os as _os1
    from phi_tpu.sketch.kernels import (_pallas_join_rows3_ck,
                                        _pallas_join_rows3w_ck, block_cap)
    wide = k > 31
    use_v3 = ck is not None and _os1.environ.get("PHI_TPU_JOIN_V3") != "0"
    if wide and not use_v3:
        return None  # wide k has no mixed-key/v2 device fallback
    S_cap = _row_start_cap(graph.walk_node_cumlen, rows, row_lanes) \
        if use_v3 else 0
    if use_v3 and S_cap * 4 > row_lanes:
        if wide:
            return None
        use_v3 = False  # ultra-dense node chop: dense plane is smaller
    C = block_cap(w)

    emitcap, cap_total = join_caps(w, SB, R)
    # hit accumulator: hits <= emitted minimizers <= ~2.6/(w+1) windows,
    # plus one batch of slack so a clamped append can never overwrite live
    # data before the overflow check fires. Chromosome-scale buffers are
    # rounded to finalize-chunk multiples so the chunked filter tiles them
    # exactly.
    import os as _os0
    CH0 = int(_os0.environ.get("PHI_TPU_FIN_CHUNK", _FIN_CHUNK))
    CAP = bucket_pow(int(est_windows * 2.6 / (w + 1)) + cap_total, 1 << 18)
    if CAP > CH0:
        CAP = -(-CAP // CH0) * CH0
    n_batches = -(-len(rows) // R)
    padded = rows + [(-1, 0, 0, 0)] * (n_batches * R - len(rows))
    cumlens = graph.walk_node_cumlen

    # packed-batch device cache: warm re-runs on the same graph skip the
    # host pack and the h2d upload (pure function of graph content + shape
    # statics); single slot, size-gated
    cache_mb = int(_os1.environ.get("PHI_TPU_PACK_CACHE_MB", "768"))
    est_batch_bytes = R * (row_lanes // 4
                           + (S_cap * 4 if use_v3 else row_lanes))
    cache_key = None
    cached_batches = None
    if n_batches * est_batch_bytes <= cache_mb << 20:
        fp = _graph_fingerprint(graph)
        _mark("fingerprint")
        if fp is not None:
            cache_key = fp + (k, w, R, SB, use_v3, S_cap)
            hit = _PACK_CACHE.get("slot")
            if hit is not None and hit[0] == cache_key \
                    and len(hit[1]) == n_batches:
                cached_batches = hit[1]

    from concurrent.futures import ThreadPoolExecutor

    # pack workers: when the device cache streams (chromosome scale), the
    # single-slot lookahead made the HOST pack the per-batch critical path
    # (measured 1.44 s/batch wall vs 0.24 s device exec at 100 Mbp) —
    # 3 workers + 3-deep lookahead overlap pack with device execution
    _PACK_AHEAD = int(_os1.environ.get("PHI_TPU_PACK_WORKERS", "3"))
    _packer = ThreadPoolExecutor(max(1, _PACK_AHEAD))

    def _pack(b):
        batch = padded[b * R:(b + 1) * R]
        return (batch,
                _pack_rows_2bit(seqs, batch, row_lanes),
                pack_row_starts(cumlens, batch, row_lanes, S_cap) if use_v3
                else pack_row_deltas(cumlens, batch, row_lanes),
                np.array([r[2] for r in batch], np.int32),
                np.array([r[3] for r in batch], np.int32),
                row_base_nodes(cumlens, batch),
                np.array([max(r[0], 0) for r in batch], np.int32))

    buf_se = jnp.zeros(CAP, jnp.uint32)
    buf_id = jnp.full(CAP, -1, jnp.int32)
    buf_hap = jnp.zeros(CAP, jnp.uint8)
    total = jnp.int32(0)
    carry = jnp.zeros(5 if wide else 3, jnp.uint32)

    WINDOW = 3
    counts = np.zeros((n_batches, 3, R), np.int64)
    pend: list = [None] * n_batches
    new_cache: list = [] if (cache_key is not None
                             and cached_batches is None) else None

    def _upload(b, packed):
        """Device arrays for batch b (from cache when warm)."""
        if cached_batches is not None:
            return cached_batches[b]
        batch, words_np, aux_np, nv_np, ct_np, bn_np, hap_np = packed
        devs = tuple(jax.device_put(a) for a in
                     (words_np, aux_np, nv_np, ct_np, bn_np, hap_np))
        if new_cache is not None:
            new_cache.append(devs)
        return devs

    def _dispatch(b, carry, packed):
        batch = padded[b * R:(b + 1) * R] if cached_batches is not None \
            else packed[0]
        words, aux, nv, ct, bn, hp = _upload(b, packed)
        if use_v3:
            fn, name = (_pallas_join_rows3w_ck, "pallas_join_rows3w_ck") \
                if wide else (_pallas_join_rows3_ck, "pallas_join_rows3_ck")
            out = cached_call(
                fn, name,
                (words, aux, nv, ct, bn, hp, carry) + sp_args,
                {"k": k, "w": w, "n_rows": R, "n_blocks": SB, "C": C,
                 "cap_total": cap_total, "interpret": interpret})
        else:
            statics = {"k": k, "w": w, "n_rows": R, "n_blocks": SB,
                       "emitcap": emitcap, "cap_total": cap_total,
                       "interpret": interpret}
            if rounds is None:
                out = cached_call(
                    _pallas_join_rows2_ck, "pallas_join_rows2_ck",
                    (words, aux, nv, ct, bn, hp, carry) + sp_args, statics)
            else:
                out = cached_call(
                    _pallas_join_rows2, "pallas_join_rows2",
                    (words, aux, nv, ct, bn, hp, carry) + sp_args
                    + (jnp.int32(rounds),), statics)
        for a in out[:2] + ((out[6],) if use_v3 else ()):
            try:
                a.copy_to_host_async()
            except AttributeError:
                pass
        return [batch, out]

    import os as _os
    prof_lvl = _os.environ.get("PHI_TPU_JOIN_PROF", "0")
    prof = prof_lvl in ("1", "2")
    prof_batches = prof_lvl == "2"
    from time import perf_counter as _now
    t_pack = t_disp = t_harv = 0.0
    try:
        futs: dict = {}
        if cached_batches is None:
            for b0 in range(min(_PACK_AHEAD, n_batches)):
                futs[b0] = _packer.submit(_pack, b0)
        for b in range(n_batches):
            if prof:
                t0 = _now()
            packed = futs.pop(b).result() if b in futs else None
            if prof:
                t_pack += _now() - t0
            if cached_batches is None:
                nb = b + _PACK_AHEAD
                if nb < n_batches and nb not in futs:
                    futs[nb] = _packer.submit(_pack, nb)
            if prof:
                t0 = _now()
            pend[b] = _dispatch(b, carry, packed)
            out = pend[b][1]
            carry = out[5]
            buf_se, buf_id, buf_hap, total = cached_call(
                _append_jit, "anchor_append",
                (buf_se, buf_id, buf_hap, total,
                 out[2], out[3], out[4]), {})
            # keep only the counts alive: holding every batch's flat
            # arrays was ~5.5 GB of dead HBM at 100 Mbp (the data lives
            # on in the accumulator after the append)
            pend[b][1] = (out[0], out[1]) + ((out[6],) if use_v3 else ())
            if prof:
                t_disp += _now() - t0
            if b >= WINDOW:
                if prof:
                    t0 = _now()
                _harvest(b - WINDOW, counts, pend)
                if prof:
                    dt = _now() - t0
                    t_harv += dt
                    if prof_batches:
                        import sys as _sys
                        _sys.stderr.write(
                            f"[danchor-prof] batch {b - WINDOW} "
                            f"harvest {dt:.3f}\n")
        if prof:
            t0 = _now()
        for b in range(max(0, n_batches - WINDOW), n_batches):
            _harvest(b, counts, pend)
        if prof:
            t_harv += _now() - t0
    finally:
        _packer.shutdown(wait=False)
        if prof:
            import sys as _sys
            _sys.stderr.write(
                f"[danchor-prof] batches={n_batches} pack_wait={t_pack:.3f}"
                f" dispatch={t_disp:.3f} harvest={t_harv:.3f}\n")

    if new_cache is not None and len(new_cache) == n_batches:
        _PACK_CACHE["slot"] = (cache_key, new_cache)

    # exact per-row overflow check (counts now on host): a batch whose
    # emit, hit, or per-block compaction counts exceeded the static caps
    # truncated its arrays — rare; the caller reruns via the host path
    if (counts[:, 0].max(initial=0) > emitcap and not use_v3) \
            or counts[:, 1].sum() > CAP - cap_total:
        _warn(f"emit/hit cap overflow (nmin_max={int(counts[:, 0].max(initial=0))}"
              f" emitcap={emitcap} hits={int(counts[:, 1].sum())} CAP={CAP})")
        return None
    if use_v3 and counts[:, 2].max(initial=0) > C:
        import sys as _sys
        _sys.stderr.write(
            f"[W::anchors] v3 block compaction overflow "
            f"(max {int(counts[:, 2].max())} > C={C}); host path\n")
        return None
    for b, (batch, _) in enumerate(pend):
        if int(counts[b, 1].sum()) > cap_total:
            _warn(f"batch {b} hit count {int(counts[b, 1].sum())} > "
                  f"cap_total={cap_total}")
            return None
        for j, (si, start, nv, cont) in enumerate(batch):
            if si >= 0:
                per_hap_min[si] += int(counts[b, 0, j])

    total_hits = int(counts[:, 1].sum())
    TOT = bucket_pow(total_hits + 1, 1 << 15)
    if TOT > CH0:
        TOT = -(-TOT // CH0) * CH0  # chunked finalize: tile exactly
    if TOT < CAP:
        buf_se, buf_id, buf_hap = cached_call(
            _slice_jit, "anchor_slice",
            (buf_se, buf_id, buf_hap), {"tot_b": TOT})

    _mark("loop_done")
    # prefix-hash tables (graph-static, device-cached)
    from phi_tpu.solve.dp import _dev_cached
    Hb_, Pb_ = graph.walk_mat.shape
    wm_dev = _dev_cached(graph.walk_mat, (Hb_, Pb_, "wm_ph"),
                         lambda: jnp.asarray(graph.walk_mat))
    ph1, ph2 = cached_call(_build_ph_jit, "build_ph", (wm_dev,),
                           {"P1": int(_POLY1), "P2": int(_POLY2)})
    pw1, pw2 = _pw_tables()

    Ksp = len(sp_hi)
    _mark("ph_build")
    if prof:
        t0 = _now()
    fin = _finalize_chunked(buf_se, buf_id, buf_hap, total_hits, TOT,
                            ph1, ph2, pw1, pw2, threshold, Ksp, H)
    if fin is None:
        return None
    c_s, c_span, c_id, c_hap, c_w, stats_np, per_hap = fin
    if prof:
        import sys as _sys
        _sys.stderr.write(f"[danchor-prof] finalize+stats={_now() - t0:.3f}"
                          f" total_hits={total_hits} TOT={TOT}\n")
    if stats_np[3] or stats_np[4]:
        _warn(f"finalize unresolved={int(stats_np[3])} "
              f"amb_overflow={int(stats_np[4])} stats={stats_np.tolist()}")
        return None  # unresolved ownership / ambiguous overflow: host path
    n_occ = int(stats_np[0])
    # shrink the compacted columns to the retained-occurrence bucket: the
    # solver's scatter programs and the decode-side host fetch both scale
    # with this length (TOT is the raw-hit bucket, typically ~6x larger)
    cur_len = int(c_s.shape[0])
    Nb_occ = min(bucket_pow(n_occ + 1, 1 << 15), cur_len)
    if Nb_occ < cur_len:
        if c_w is None:
            c_s, c_span, c_id, c_hap = cached_call(
                _slice_jit, "anchor_slice4",
                (c_s, c_span, c_id), {"tot_b": Nb_occ}) + \
                (cached_call(_chunk1_jit, "anchor_slice1", (c_hap,),
                             {"tot_b": Nb_occ}),)
        else:
            c_s, c_span, c_id, c_hap, c_w = cached_call(
                _slice5_jit, "anchor_slice5",
                (c_s, c_span, c_id, c_hap, c_w), {"tot_b": Nb_occ})
    if c_w is None:
        c_w = cached_call(_mkw_jit, "anchor_mkw",
                          (c_s, jnp.int32(n_occ)), {})
    occ = DeviceOcc(
        dev_s=c_s, dev_span=c_span, dev_id=c_id, dev_hap=c_hap, dev_w=c_w,
        n_occ=n_occ, n_model=int(stats_np[1]),
        filtered=int(stats_np[2]),
        per_hap_anchors=np.asarray(per_hap).astype(np.int64),
        Nb=Nb_occ, max_span=int(stats_np[6]))
    if prof:
        import sys as _sys
        _sys.stderr.write(
            f"[danchor-prof] n_occ={n_occ} max_span={int(stats_np[6])} "
            f"n_amb={int(stats_np[7])} owner_rounds={int(stats_np[5])}\n")
    return per_hap_min, occ


def _harvest(b, counts, pend):
    _, out = pend[b]
    counts[b, 0] = np.asarray(out[0]).astype(np.int64)
    counts[b, 1] = np.asarray(out[1]).astype(np.int64)
    if len(out) > 2:  # v3: per-row max block-compaction count
        counts[b, 2] = np.asarray(out[2]).astype(np.int64)


# finalize chunk length (rows). Each pass materializes a handful of
# chunk-length temporaries; 2^26 keeps that under ~2.5 GB — the
# single-program finalize at ~280M hits was a compile-time OOM.
_FIN_CHUNK = 1 << 26


def _finalize_chunked(buf_se, buf_id, buf_hap, total_hits: int, TOT: int,
                      ph1, ph2, pw1, pw2, threshold: float, Ksp: int,
                      H: int):
    """Chunked threshold filter (see the pass overview above) — the single
    finalize path at every scale (n_chunks = 1 below _FIN_CHUNK). Returns
    (c_s, c_span, c_id, c_hap, c_w, stats, per_hap) with stats as a host
    array, or None on retained-occurrence cap overflow.

    The ambiguity buffers are sized EXACTLY: pass 1's per-k-mer totals give
    n_amb = sum(ktot[k_amb]) before pass 2a allocates, so ambiguous
    overflow cannot happen (the round-4 TOT//16 heuristic silently sent
    every real-MHC run — 18% ambiguous occurrences — to the host path)."""
    import os
    from phi_tpu.execache import cached_call
    CH = min(int(os.environ.get("PHI_TPU_FIN_CHUNK", _FIN_CHUNK)), TOT)
    n_chunks = -(-TOT // CH)
    if n_chunks * CH > buf_se.shape[0]:
        return None  # buffers not chunk-coverable (shouldn't happen)
    pw1_d = jnp.asarray(pw1)
    pw2_d = jnp.asarray(pw2)
    th = jnp.float32(threshold * H)
    bufs = (buf_se, buf_id, buf_hap)
    offs = [jnp.int32(c * CH) for c in range(n_chunks)]
    rems = [jnp.int32(max(0, min(total_hits - c * CH, CH)))
            for c in range(n_chunks)]

    ktot = jnp.zeros(Ksp + 1, jnp.int32)
    umin = jnp.full(Ksp + 1, 0xFFFFFFFF, jnp.uint32)
    umax = jnp.zeros(Ksp + 1, jnp.uint32)
    vmin = jnp.full(Ksp + 1, 0xFFFFFFFF, jnp.uint32)
    vmax = jnp.zeros(Ksp + 1, jnp.uint32)
    for c in range(n_chunks):
        ktot, umin, umax, vmin, vmax = cached_call(
            _fin_pass1_jit, "fin_pass1",
            bufs + (offs[c], rems[c], ph1, ph2, pw1_d, pw2_d,
                    ktot, umin, umax, vmin, vmax),
            {"Ksp": Ksp, "CH": CH})
    kbad_uni, k_amb, n_amb_d = cached_call(
        _fin_mid_jit, "fin_mid",
        (ktot, umin, umax, vmin, vmax, th), {"Ksp": Ksp})
    n_amb = int(np.asarray(n_amb_d))
    Nb_amb = bucket_pow(n_amb + 1, 1 << 14)
    amb_cap = Nb_amb + CH  # append slack: each chunk writes CH padded lanes
    ag1 = jnp.zeros(amb_cap, jnp.uint32)
    ag2 = jnp.zeros(amb_cap, jnp.uint32)
    aid = jnp.full(amb_cap, Ksp, jnp.int32)
    a_total = jnp.int32(0)
    for c in range(n_chunks):
        ag1, ag2, aid, a_total = cached_call(
            _fin_pass2a_jit, "fin_pass2a",
            bufs + (offs[c], rems[c], ph1, ph2, pw1_d, pw2_d,
                    k_amb, ag1, ag2, aid, a_total),
            {"Ksp": Ksp, "CH": CH})
    if Nb_amb < amb_cap:
        ag1, ag2, aid = cached_call(
            _fin_amb_slice_jit, "fin_amb_slice",
            (ag1, ag2, aid), {"tot_b": Nb_amb})
    kbad, unresolved, _rounds = cached_call(
        _fin_owner_jit, "fin_owner",
        (ag1, ag2, aid, jnp.int32(n_amb), th, kbad_uni), {"Ksp": Ksp})
    del ag1, ag2, aid

    occ_cap = bucket_pow(TOT // 3 + CH, 1 << 18)
    o_s = jnp.zeros(occ_cap, jnp.int32)
    o_span = jnp.zeros(occ_cap, jnp.uint8)
    o_id = jnp.full(occ_cap, -1, jnp.int32)
    o_hap = jnp.zeros(occ_cap, jnp.uint8)
    o_total = jnp.int32(0)
    per_hap = jnp.zeros(H, jnp.int32)
    kmulti = jnp.zeros(Ksp + 1, jnp.int32)
    ms_parts = []
    for c in range(n_chunks):
        o_s, o_span, o_id, o_hap, o_total, per_hap, kmulti, ms = \
            cached_call(
                _fin_pass2b_jit, "fin_pass2b",
                bufs + (offs[c], rems[c], ph1, ph2, pw1_d, pw2_d,
                        kbad, o_s, o_span, o_id, o_hap, o_total, per_hap,
                        kmulti), {"Ksp": Ksp, "H": H, "CH": CH})
        ms_parts.append(ms)
    # one combined stats fetch (each np.asarray is a ~30 ms tunnel sync)
    tail = cached_call(_fin_tail_jit, "fin_tail",
                       (o_total, jnp.stack(ms_parts), unresolved,
                        ktot, kbad, kmulti), {"Ksp": Ksp})
    n_occ, mspan, unres, filtered, n_model = \
        (int(x) for x in np.asarray(tail))
    if n_occ > occ_cap - CH:
        return None  # retained overflow: host path
    c_w = None  # built after the retained-bucket slice (saves occ_cap f32)
    stats_np = np.array([n_occ, n_model, filtered, unres, 0, 0, mspan,
                         n_amb], np.int64)
    return o_s, o_span, o_id, o_hap, c_w, stats_np, per_hap
