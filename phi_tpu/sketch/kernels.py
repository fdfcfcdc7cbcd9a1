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

    def kernel(nvalid_ref, codes_ref, next_ref, hi_ref, lo_ref, pos_ref, emit_ref):
        blk_id = pl.program_id(0)
        xi = jnp.concatenate(
            [codes_ref[:, :], next_ref[:, :HALO_PAD]], axis=1
        )                                               # (1, BLK+HALO_PAD) int32
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
        phi = pltpu.roll(shi, 1, 1)
        plo = pltpu.roll(slo, 1, 1)
        pvd = pltpu.roll(valid.astype(jnp.int32), 1, 1)
        # block-local first window always emits (host removes boundary dups)
        differs = (shi != phi) | (slo != plo) | (pvd == 0) | (lane == 0)
        emit = valid & differs

        hi_ref[:, :] = shi[:, :BLK]
        lo_ref[:, :] = slo[:, :BLK]
        pos_ref[:, :] = spos[:, :BLK]
        emit_ref[:, :] = emit[:, :BLK].astype(jnp.int32)

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
    grid_spec = pl.GridSpec(
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLK), lambda i: (0, i + 1), memory_space=pltpu.VMEM),
        ],
        out_specs=[out_bs, out_bs, out_bs, out_bs],
    )
    out_shape = [
        jax.ShapeDtypeStruct((1, n_out), jnp.uint32),
        jax.ShapeDtypeStruct((1, n_out), jnp.uint32),
        jax.ShapeDtypeStruct((1, n_out), jnp.int32),
        jax.ShapeDtypeStruct((1, n_out), jnp.int32),
    ]
    return pl.pallas_call(kernel, grid_spec=grid_spec, out_shape=out_shape,
                          interpret=interpret)(n_valid, codes2d, codes2d)


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
        jnp.asarray(buf.astype(np.int32)[None, :]),
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
