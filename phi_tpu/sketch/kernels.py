"""Fused Pallas TPU kernel for minimizer sketching.

One VMEM pass computes, per k-mer start position: the packed canonical
(hi, lo) pair, the window-of-w minimum (sparse-table doubling with lane
rolls), and a local emit mask — versus the unfused XLA path that makes
~200 HBM-roundtrip vector ops. Semantics are identical to
sketch.minimizer (same reference-exact selection; block/chunk-boundary
duplicate emissions are removed by the caller's consecutive-dup pass).

Layout: blocks of (1, BLK + HALO_PAD) int32 codes with a 128-element halo,
grid over the chunk; outputs (hi, lo, emit) aligned to (1, BLK).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 8192      # block lanes; (1, BLK+HALO) i32 arrays tile-pad 8x in VMEM,
                # and ~30 live arrays must fit the 16 MB budget
HALO_PAD = 128  # >= k + w - 2 for k<=31, w<=98
UMAX32 = np.uint32(0xFFFFFFFF)


def _roll_l(x, s):
    """Shift left by s along the lane axis (wrap values are masked later).
    pltpu.roll only accepts non-negative shifts, so left-by-s is
    roll-right-by-(n - s)."""
    if s == 0:
        return x
    return pltpu.roll(x, x.shape[1] - s, 1)


def _tuple_min(a, b):
    ahi, alo, apos = a
    bhi, blo, bpos = b
    a_lt = (ahi < bhi) | ((ahi == bhi) & (alo < blo))
    a_eq = (ahi == bhi) & (alo == blo)
    take_a = a_lt | (a_eq & (apos >= bpos))
    return (jnp.where(take_a, ahi, bhi),
            jnp.where(take_a, alo, blo),
            jnp.where(take_a, apos, bpos))


def _make_kernel(k: int, w: int):
    n_hi = max(0, k - 16)

    def kernel(nvalid_ref, codes_ref, next_ref, hi_ref, lo_ref, pos_ref,
               emit_ref, carry_ref):
        blk_id = pl.program_id(0)

        # The TPU grid runs sequentially, so SMEM scratch carries the
        # previous block's last window selection for exact dedup across
        # block boundaries (carry = (hi, lo) of selection at window
        # blk_id*BLK - 1; initialized to UMAX so the global first window
        # emits).
        @pl.when(blk_id == 0)
        def _init():
            carry_ref[0] = jnp.uint32(0xFFFFFFFF)
            carry_ref[1] = jnp.uint32(0xFFFFFFFF)
            carry_ref[2] = jnp.uint32(0)  # previous-window validity

        xi = jnp.concatenate(
            [codes_ref[:, :].astype(jnp.int32),
             next_ref[:, :HALO_PAD].astype(jnp.int32)], axis=1
        )                                               # (1, BLK+HALO_PAD)
        # complement computed in signed int32 (Mosaic has no unsigned min)
        rc_i = jnp.int32(3) - jnp.minimum(xi, 3)
        x = xi.astype(jnp.uint32)
        fhi = jnp.zeros_like(x)
        flo = jnp.zeros_like(x)
        rhi = jnp.zeros_like(x)
        rlo = jnp.zeros_like(x)
        # loop-carried masks stay int32: Mosaic cannot truncate wide i8 bool
        # vectors back to i1 for selects
        invalid = jnp.where(xi >= 4, jnp.int32(1), jnp.int32(0))
        col = x
        rcolsrc = rc_i.astype(jnp.uint32)
        two = jnp.uint32(2)
        for j in range(k):
            cj = _roll_l(col, j) if j else col
            rj = _roll_l(rcolsrc, k - 1 - j) if k - 1 - j else rcolsrc
            if j < n_hi:
                fhi = (fhi << two) | cj
                rhi = (rhi << two) | rj
            else:
                flo = (flo << two) | cj
                rlo = (rlo << two) | rj
            if j:
                invalid = jnp.maximum(invalid, jnp.where(cj >= 4, 1, 0))
        f_le = (fhi < rhi) | ((fhi == rhi) & (flo <= rlo))
        hi = jnp.where(f_le, fhi, rhi)
        lo = jnp.where(f_le, flo, rlo)
        umax = jnp.uint32(0xFFFFFFFF)
        hi = jnp.where(invalid > 0, umax, hi)
        lo = jnp.where(invalid > 0, umax, lo)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        gpos = blk_id * BLK + lane
        pos = jnp.where(invalid > 0, jnp.int32(-1), gpos)

        t = (hi, lo, pos)
        s = 1
        while s * 2 <= w:
            t = _tuple_min(t, tuple(_roll_l(v, s) for v in t))
            s *= 2
        t = _tuple_min(t, tuple(_roll_l(v, w - s) for v in t))
        shi, slo, spos = t

        n_valid = nvalid_ref[0, 0]
        valid = (spos >= 0) & (gpos < n_valid)
        at0 = lane == 0
        phi = jnp.where(at0, carry_ref[0], pltpu.roll(shi, 1, 1))
        plo = jnp.where(at0, carry_ref[1], pltpu.roll(slo, 1, 1))
        pvd = jnp.where(at0, carry_ref[2].astype(jnp.int32),
                        pltpu.roll(valid.astype(jnp.int32), 1, 1))
        differs = (shi != phi) | (slo != plo) | (pvd == 0)
        emit = valid & differs

        hi_ref[:, :] = shi[:, :BLK]
        lo_ref[:, :] = slo[:, :BLK]
        pos_ref[:, :] = spos[:, :BLK]
        emit_ref[:, :] = emit[:, :BLK].astype(jnp.int32)
        carry_ref[0] = shi[0, BLK - 1]
        carry_ref[1] = slo[0, BLK - 1]
        # cast the whole vector first: Mosaic can only scalarize 32-bit lanes
        carry_ref[2] = valid.astype(jnp.uint32)[0, BLK - 1]

    return kernel


@functools.partial(jax.jit, static_argnames=("k", "w", "n_blocks", "interpret"))
def _pallas_sketch(codes2d: jnp.ndarray, n_valid: jnp.ndarray, k: int, w: int,
                   n_blocks: int, interpret: bool = False):
    kernel = _make_kernel(k, w)
    n_out = n_blocks * BLK
    # BlockSpec index_map returns *block-unit* indices: input block i covers
    # lanes [i*BLK, (i+1)*BLK); the halo comes from passing the same array a
    # second time shifted one block (i+1), clamped at the padded end.
    out_bs = pl.BlockSpec((1, BLK), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((1, n_out), jnp.uint32),
        jax.ShapeDtypeStruct((1, n_out), jnp.uint32),
        jax.ShapeDtypeStruct((1, n_out), jnp.int32),
        jax.ShapeDtypeStruct((1, n_out), jnp.int32),
    ]
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLK), lambda i: (0, i + 1), memory_space=pltpu.VMEM),
        ],
        out_specs=[out_bs, out_bs, out_bs, out_bs],
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((3,), jnp.uint32)],
        interpret=interpret,
    )(n_valid, codes2d, codes2d)


@functools.partial(jax.jit, static_argnames=("k", "w", "n_blocks", "emitcap",
                                             "hitcap", "interpret"))
def _pallas_join(codes2d, n_valid_smem, n_valid, sp_hi, sp_lo,
                 k: int, w: int, n_blocks: int, emitcap: int, hitcap: int,
                 interpret: bool = False):
    """Fused: pallas sketch kernel -> device compaction -> spectrum join.
    Whole sequence in one call; only counts and hit arrays leave the device."""
    from phi_tpu.ops.search import pair_isin

    hi, lo, pos, emit = _pallas_sketch(codes2d, n_valid_smem, k, w, n_blocks,
                                       interpret)
    hi = hi[0]
    lo = lo[0]
    pos = pos[0]
    emit = (emit[0] != 0) & (jnp.arange(hi.shape[0]) < n_valid)
    n_min = emit.sum()
    eidx = jnp.nonzero(emit, size=emitcap, fill_value=hi.shape[0])[0]
    hi_g = jnp.concatenate([hi, jnp.full((1,), 0xFFFFFFFF, jnp.uint32)])
    lo_g = jnp.concatenate([lo, jnp.full((1,), 0xFFFFFFFF, jnp.uint32)])
    pos_g = jnp.concatenate([pos, jnp.full((1,), -1, jnp.int32)])
    ehi = hi_g[eidx]
    elo = lo_g[eidx]
    epos = pos_g[eidx]
    found, idx = pair_isin(sp_hi, sp_lo, ehi, elo)
    hit = found & (epos >= 0)
    n_hit = hit.sum()
    hidx = jnp.nonzero(hit, size=hitcap, fill_value=ehi.shape[0])[0]
    epos_g = jnp.concatenate([epos, jnp.full((1,), -1, jnp.int32)])
    eid_g = jnp.concatenate([idx.astype(jnp.int32), jnp.full((1,), -1, jnp.int32)])
    return n_min, n_hit, epos_g[hidx], eid_g[hidx]


def pallas_join_sequence(codes: np.ndarray, k: int, w: int, sp_hi, sp_lo,
                         interpret: bool = False
                         ) -> tuple[int, np.ndarray, np.ndarray]:
    """Device-joined minimizers via the fused Pallas kernel. Same contract as
    minimizer.sketch_join_sequence (N-exact dedup carried in SMEM)."""
    if k + w - 2 > HALO_PAD:
        raise ValueError(f"k + w - 2 must be <= {HALO_PAD} for the fused kernel")
    L = len(codes)
    if L < w + k - 1:
        return 0, np.zeros(0, np.int32), np.zeros(0, np.int32)
    n_valid = L - k - w + 2
    n_blocks = max(1, -(-n_valid // BLK))
    need = (n_blocks + 1) * BLK
    buf = np.full(need, 4, np.uint8)
    buf[:min(L, need)] = codes[:min(L, need)]
    codes2d = jnp.asarray(buf[None, :])  # uint8: 4x less tunnel upload
    nv_smem = jnp.asarray(np.array([[n_valid]], np.int32))
    emitcap = 1 << max(10, (4 * n_valid // (w + 1) + 64).bit_length())
    hitcap = emitcap
    while True:
        n_min, n_hit, hpos, hid = _pallas_join(
            codes2d, nv_smem, jnp.int32(n_valid), sp_hi, sp_lo,
            k, w, n_blocks, emitcap, hitcap, interpret)
        nm, nh = int(n_min), int(n_hit)
        if nm <= emitcap and nh <= hitcap:
            break
        emitcap = 1 << max(emitcap.bit_length(), nm.bit_length())
        hitcap = emitcap
    from phi_tpu.sketch.minimizer import fetch_prefix
    return nm, fetch_prefix(hpos, nh), fetch_prefix(hid, nh)


def pallas_sketch_sequence(codes: np.ndarray, k: int, w: int,
                           interpret: bool = False):
    """(hi, lo, pos) minimizers via the fused kernel; same emitted stream as
    sketch_sequence (after the caller-side consecutive-dup removal done
    here)."""
    if k + w - 2 > HALO_PAD:
        raise ValueError(f"k + w - 2 must be <= {HALO_PAD} for the fused kernel")
    L = len(codes)
    if L < w + k - 1:
        z = np.zeros(0, np.uint32)
        return z, z.copy(), np.zeros(0, np.int32)
    n_valid = L - k - w + 2
    n_blocks = max(1, -(-n_valid // BLK))
    # one extra block so the i+1 halo read of the last block is in-bounds
    need = (n_blocks + 1) * BLK
    buf = np.full(need, 4, np.uint8)
    buf[:min(L, need)] = codes[:min(L, need)]
    hi, lo, pos, emit = _pallas_sketch(
        jnp.asarray(buf[None, :]),
        jnp.asarray(np.array([[n_valid]], np.int32)), k, w, n_blocks,
        interpret)
    emit = np.asarray(emit[0]).astype(bool)
    hi = np.asarray(hi[0])[emit]
    lo = np.asarray(lo[0])[emit]
    pos = np.asarray(pos[0])[emit]
    if len(hi) > 1:
        keep = np.empty(len(hi), bool)
        keep[0] = True
        keep[1:] = (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])
        if not keep.all():
            hi, lo, pos = hi[keep], lo[keep], pos[keep]
    return hi, lo, pos
