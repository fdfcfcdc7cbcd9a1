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

# The batched row path: every dispatch processes ROWS fixed-size
# "superchunk" rows of SUPER_BLOCKS*BLK windows each, so ONE compiled
# program covers every haplotype of every dataset (remote-TPU compiles cost
# minutes; per-chunk dispatch latency dominated the unbatched path).
SUPER_BLOCKS = 256           # blocks per row: 2,097,152 windows
ROWS = 8                     # rows per dispatch


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


def _make_kernel_rows(k: int, w: int):
    """Multi-row variant of _make_kernel: grid (row, block). Each row is one
    superchunk of one haplotype; a `continues` flag per row threads the
    dedup carry across consecutive superchunks of the same haplotype (the
    TPU grid runs row-major sequentially, so SMEM carry flows naturally),
    and the final carry is exported so the next dispatch batch can resume
    it without a host round trip."""
    n_hi = max(0, k - 16)

    def kernel(nvalid_ref, cont_ref, init_ref, codes_ref, next_ref,
               hi_ref, lo_ref, pos_ref, emit_ref, co_ref, carry_ref):
        row_id = pl.program_id(0)
        blk_id = pl.program_id(1)

        @pl.when(blk_id == 0)
        def _row_start():
            cont = cont_ref[row_id] != 0
            # row 0 of the dispatch resumes from the init input; later rows
            # resume from the in-kernel carry; cont=0 resets (new haplotype)
            k0 = jnp.where(row_id == 0, init_ref[0], carry_ref[0])
            k1 = jnp.where(row_id == 0, init_ref[1], carry_ref[1])
            k2 = jnp.where(row_id == 0, init_ref[2], carry_ref[2])
            carry_ref[0] = jnp.where(cont, k0, jnp.uint32(0xFFFFFFFF))
            carry_ref[1] = jnp.where(cont, k1, jnp.uint32(0xFFFFFFFF))
            carry_ref[2] = jnp.where(cont, k2, jnp.uint32(0))

        xi = jnp.concatenate(
            [codes_ref[0].astype(jnp.int32),
             next_ref[0][:, :HALO_PAD].astype(jnp.int32)], axis=1)
        rc_i = jnp.int32(3) - jnp.minimum(xi, 3)
        x = xi.astype(jnp.uint32)
        fhi = jnp.zeros_like(x)
        flo = jnp.zeros_like(x)
        rhi = jnp.zeros_like(x)
        rlo = jnp.zeros_like(x)
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
        gpos = blk_id * BLK + lane   # row-local window index
        pos = jnp.where(invalid > 0, jnp.int32(-1), gpos)

        t = (hi, lo, pos)
        s = 1
        while s * 2 <= w:
            t = _tuple_min(t, tuple(_roll_l(v, s) for v in t))
            s *= 2
        t = _tuple_min(t, tuple(_roll_l(v, w - s) for v in t))
        shi, slo, spos = t

        n_valid = nvalid_ref[row_id]
        valid = (spos >= 0) & (gpos < n_valid)
        at0 = lane == 0
        phi = jnp.where(at0, carry_ref[0], pltpu.roll(shi, 1, 1))
        plo = jnp.where(at0, carry_ref[1], pltpu.roll(slo, 1, 1))
        pvd = jnp.where(at0, carry_ref[2].astype(jnp.int32),
                        pltpu.roll(valid.astype(jnp.int32), 1, 1))
        differs = (shi != phi) | (slo != plo) | (pvd == 0)
        emit = valid & differs

        hi_ref[0] = shi[:, :BLK]
        lo_ref[0] = slo[:, :BLK]
        pos_ref[0] = spos[:, :BLK]
        emit_ref[0] = emit[:, :BLK].astype(jnp.int32)
        carry_ref[0] = shi[0, BLK - 1]
        carry_ref[1] = slo[0, BLK - 1]
        carry_ref[2] = valid.astype(jnp.uint32)[0, BLK - 1]
        co_ref[0] = carry_ref[0]
        co_ref[1] = carry_ref[1]
        co_ref[2] = carry_ref[2]

    return kernel


def _pallas_sketch_rows(codes2d, nvalid, cont, init_carry, k: int, w: int,
                        n_rows: int, n_blocks: int, interpret: bool = False):
    """Run the multi-row kernel: codes2d [R, (n_blocks+1)*BLK] uint8,
    nvalid/cont (R,) int32, init_carry (3,) uint32. Returns per-row
    (hi, lo, pos, emit) arrays [R, n_blocks*BLK] and the final carry (3,).
    Per-row scalars ride as whole 1-D SMEM arrays indexed by program_id —
    Mosaic rejects (1,1) blocks of 2-D SMEM operands. The row axis gets its
    own singleton sublane dim ([R, 1, lanes] with (1, 1, BLK) blocks):
    Mosaic requires the block's second-to-last dim to be divisible by 8 or
    equal to the array's, and a (1, BLK) block of an [R, lanes] array is
    neither for R > 1."""
    kernel = _make_kernel_rows(k, w)
    n_out = n_blocks * BLK
    codes3d = codes2d.reshape(n_rows, 1, -1)
    smem_scalar = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_bs = pl.BlockSpec((1, 1, BLK), lambda r, i: (r, 0, i),
                          memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((n_rows, 1, n_out), jnp.uint32),
        jax.ShapeDtypeStruct((n_rows, 1, n_out), jnp.uint32),
        jax.ShapeDtypeStruct((n_rows, 1, n_out), jnp.int32),
        jax.ShapeDtypeStruct((n_rows, 1, n_out), jnp.int32),
        jax.ShapeDtypeStruct((3,), jnp.uint32),
    ]
    hi, lo, pos, emit, carry = pl.pallas_call(
        kernel,
        grid=(n_rows, n_blocks),
        in_specs=[
            smem_scalar,
            smem_scalar,
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, BLK), lambda r, i: (r, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BLK), lambda r, i: (r, 0, i + 1),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_bs, out_bs, out_bs, out_bs,
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((3,), jnp.uint32)],
        interpret=interpret,
    )(nvalid, cont, init_carry, codes3d, codes3d)
    return (hi.reshape(n_rows, n_out), lo.reshape(n_rows, n_out),
            pos.reshape(n_rows, n_out), emit.reshape(n_rows, n_out), carry)


@functools.partial(jax.jit, static_argnames=(
    "k", "w", "n_rows", "n_blocks", "emitcap", "cap_total", "rounds",
    "bits", "interpret"))
def _pallas_join_rows(words, nvalid, cont, init_carry, sp_m, sp_lo, sp_perm,
                      sp_off, k: int, w: int, n_rows: int, n_blocks: int,
                      emitcap: int, cap_total: int, rounds: int,
                      bits: int = 16, interpret: bool = False):
    """Batched fused sketch+join: 2-bit packed rows in, per-row minimizer and
    hit counts plus ONE flattened hit array out (row-major by hit order).
    The spectrum arrives as the mixed-key table of prepare_spectrum_bucket.
    All gathers/scatters run on fixed [R, emitcap] / [cap_total] shapes, so
    the program is unique per (k, w, spectrum-bucket) family."""
    from phi_tpu.ops.search import pair_isin_mixed

    R = n_rows
    row_lanes = (n_blocks + 1) * BLK
    n_out = n_blocks * BLK
    # unpack 2-bit words -> uint8 codes on device (4x less tunnel upload)
    shifts = (jnp.arange(16, dtype=jnp.uint32) * 2)
    codes2d = ((words[:, :, None] >> shifts[None, None, :]) & jnp.uint32(3)
               ).astype(jnp.uint8).reshape(R, row_lanes)
    hi, lo, pos, emit, carry_out = _pallas_sketch_rows(
        codes2d, nvalid, cont, init_carry, k, w, R, n_blocks, interpret)
    emit = emit != 0
    n_min = emit.sum(axis=1)

    # vectorized per-row compaction (scatter of lane indices by emit order)
    rowi = jax.lax.broadcasted_iota(jnp.int32, emit.shape, 0)
    lanei = jax.lax.broadcasted_iota(jnp.int32, emit.shape, 1)
    order = jnp.cumsum(emit.astype(jnp.int32), axis=1) - 1
    dst = jnp.where(emit, jnp.minimum(order, emitcap), emitcap)
    eidx = jnp.full((R, emitcap + 1), n_out, jnp.int32) \
        .at[rowi, dst].set(lanei, mode="drop")[:, :emitcap]
    sent_u = jnp.full((R, 1), 0xFFFFFFFF, jnp.uint32)
    sent_i = jnp.full((R, 1), -1, jnp.int32)
    ehi = jnp.take_along_axis(jnp.concatenate([hi, sent_u], 1), eidx, 1)
    elo = jnp.take_along_axis(jnp.concatenate([lo, sent_u], 1), eidx, 1)
    epos = jnp.take_along_axis(jnp.concatenate([pos, sent_i], 1), eidx, 1)

    found, idx = pair_isin_mixed(sp_m, sp_lo, sp_perm, sp_off, ehi, elo,
                                 rounds, bits)
    hit = found & (epos >= 0)
    n_hit = hit.sum(axis=1)

    # flatten hits across rows: base offsets by per-row counts, one scatter
    base = jnp.concatenate([jnp.zeros(1, jnp.int32),
                            jnp.cumsum(n_hit).astype(jnp.int32)[:-1]])
    horder = jnp.cumsum(hit.astype(jnp.int32), axis=1) - 1 + base[:, None]
    hdst = jnp.where(hit, jnp.minimum(horder, cap_total), cap_total).ravel()
    flat_pos = jnp.full((cap_total + 1,), -1, jnp.int32) \
        .at[hdst].set(epos.ravel(), mode="drop")[:cap_total]
    flat_id = jnp.full((cap_total + 1,), -1, jnp.int32) \
        .at[hdst].set(idx.ravel().astype(jnp.int32), mode="drop")[:cap_total]
    return n_min, n_hit, flat_pos, flat_id, carry_out


def _pack_rows_2bit(seqs, rows, row_lanes: int) -> np.ndarray:
    """Host-side 2-bit packing of superchunk rows.

    Contract: base codes MUST be < 4 (ACGT-only; callers route N-containing
    sequences to the exact host join — pallas_join_many filters them before
    packing). Codes >= 4 would carry into neighboring 2-bit fields. Pad
    value 0 is safe: windows past n_valid are masked in-kernel."""
    R = len(rows)
    W = row_lanes // 16
    buf = np.zeros((R, row_lanes), np.uint8)
    for j, (si, start, nv, cont) in enumerate(rows):
        if si < 0:
            continue  # dummy pad row
        seg = seqs[si][start:start + row_lanes]
        buf[j, :len(seg)] = seg
    assert buf.max(initial=0) < 4, \
        "_pack_rows_2bit requires ACGT codes (<4); caller must pre-filter N"
    # accumulate the 16 base planes into one (R, W) word in place: disjoint
    # 2-bit fields make |= exact, and peak temporaries stay at one plane
    # (R, W) instead of the 16x broadcast product
    c = buf.reshape(R, W, 16)
    out = np.zeros((R, W), np.uint32)
    for b in range(16):
        out |= c[:, :, b].astype(np.uint32) << np.uint32(2 * b)
    return out


def join_caps(w: int, super_blocks: int = SUPER_BLOCKS,
              rows_per_call: int = ROWS) -> tuple[int, int]:
    """(emitcap, cap_total) for the batched join at a given window size —
    static per (k, w), so the compiled program is prewarmable."""
    sup = super_blocks * BLK
    # 1.3x headroom over the ~2/(w+1) expected minimizer density; rare
    # overflows are retried exactly (n_min stays exact under truncation).
    # Every downstream gather/probe runs on the fixed [R, emitcap] shape,
    # so headroom is paid on every dispatch — measured ~30 ms per 0.2x at
    # join shapes (1.5x -> 1.3x keeps a comfortable margin over the
    # dedup-emission density, which repeats only ever LOWER).
    emitcap = max(1024, 13 * sup // (5 * (w + 1)) + 64)
    cap_total = 1 << max(15, (2 * rows_per_call * sup // (w + 1))
                         .bit_length())
    return emitcap, cap_total


def pallas_join_many(seqs: list[np.ndarray], k: int, w: int, sp_hi, sp_lo,
                     *, rows_per_call: int = ROWS,
                     super_blocks: int = SUPER_BLOCKS,
                     interpret: bool = False,
                     ) -> list[tuple[int, np.ndarray, np.ndarray] | None]:
    """Batched fused Pallas sketch+join over many sequences.

    Splits every sequence into fixed-size superchunk rows, dispatches
    ROWS-row batches (one compiled program for everything), threads the
    dedup carry between consecutive rows/dispatches device-side, and syncs
    exactly twice (counts, then flattened hit prefixes). Entries for
    sequences containing non-ACGT codes (or too short) are returned as
    None — the caller routes those to the exact host join."""
    if k + w - 2 > HALO_PAD:
        raise ValueError(f"k + w - 2 must be <= {HALO_PAD} for the fused kernel")
    halo = k + w - 2
    sup = super_blocks * BLK
    row_lanes = (super_blocks + 1) * BLK
    results: list = [None] * len(seqs)
    rows: list[tuple[int, int, int, int]] = []
    for i, codes in enumerate(seqs):
        L = len(codes)
        if L < w + k - 1:
            results[i] = (0, np.zeros(0, np.int32), np.zeros(0, np.int32))
            continue
        if (codes >= 4).any():
            continue  # host fallback (results[i] stays None)
        for start in range(0, max(1, L - halo), sup):
            rows.append((i, start, min(sup, L - halo - start),
                         1 if start else 0))
    if not rows:
        return results

    # spectrum: pow2 bucket + first-probe bucket table (same scheme as the
    # XLA join path — one program per (k, w, bucket) family)
    from phi_tpu.execache import cached_call
    from phi_tpu.sketch.minimizer import _next_pow2, prepare_spectrum_bucket
    sp_m_np, sp_lo_np, sp_perm_np, sp_off_np, Sb, rounds, bits = \
        prepare_spectrum_bucket(sp_hi, sp_lo)
    sp_m_d = jnp.asarray(sp_m_np)
    sp_lo_d = jnp.asarray(sp_lo_np)
    sp_perm_d = jnp.asarray(sp_perm_np)
    sp_off_d = jnp.asarray(sp_off_np)

    R = rows_per_call
    emitcap, cap_total = join_caps(w, super_blocks, rows_per_call)
    n_batches = -(-len(rows) // R)
    padded = rows + [(-1, 0, 0, 0)] * (n_batches * R - len(rows))

    # One-slot lookahead for the host-side 2-bit pack: packing batch b+1
    # overlaps batch b's device execution. Measured on-chip: device exec is
    # ~523 ms per 8-row batch but wall was ~950 ms — the serial pack (+ its
    # numpy plane OR) was a large share of the gap.
    from concurrent.futures import ThreadPoolExecutor
    _packer = ThreadPoolExecutor(1)

    def _pack(b):
        batch = padded[b * R:(b + 1) * R]
        return (batch,
                _pack_rows_2bit(seqs, batch, row_lanes),
                np.array([r[2] for r in batch], np.int32),
                np.array([r[3] for r in batch], np.int32))
    # Windowed pipeline. The device runs programs in enqueue order, so a
    # hit-prefix fetch enqueued after every batch would only execute once
    # ALL batches finished — serializing execution then transfer. Keeping
    # only WINDOW batches in flight lets batch b's count land (it executes
    # while b+1..b+WINDOW sit in the queue), so its prefix-slice program is
    # enqueued BEFORE batches b+WINDOW+1.. and its device->host copy
    # overlaps their execution. Uploads are device_put (async) at dispatch
    # time; the dedup carry chains as a device array, never synced.
    from phi_tpu.sketch.minimizer import fetch_prefix_start
    WINDOW = 3

    def _dispatch(b, carry, packed):
        batch, words_np, nv_np, ct_np = packed
        words = jax.device_put(words_np)
        nv = jax.device_put(nv_np)
        ct = jax.device_put(ct_np)
        out = cached_call(
            _pallas_join_rows, "pallas_join_rows",
            (words, nv, ct, carry, sp_m_d, sp_lo_d, sp_perm_d, sp_off_d),
            {"k": k, "w": w, "n_rows": R, "n_blocks": super_blocks,
             "emitcap": emitcap, "cap_total": cap_total, "rounds": rounds,
             "bits": bits, "interpret": interpret})
        for a in (out[0], out[1]):
            try:
                a.copy_to_host_async()
            except AttributeError:
                pass
        return [batch, carry, out]

    counts = np.zeros((n_batches, 2, R), np.int64)
    pend: list = [None] * n_batches
    started: list = [None] * n_batches

    def _harvest(b):
        batch, carry_in, out = pend[b]
        nm = np.asarray(out[0]).astype(np.int64)
        nh = np.asarray(out[1]).astype(np.int64)
        # rare retries: emission overflow truncates the join input (n_min
        # stays exact), total-hit overflow truncates the flat arrays (n_hit
        # exact) — redo that batch with pow2-raised caps. The exported
        # dedup carry is computed from the full mask, so later batches
        # already in flight remain exact.
        if int(nm.max()) > emitcap or int(nh.sum()) > cap_total:
            ec = _next_pow2(max(emitcap, int(nm.max())))
            ctot = _next_pow2(max(cap_total, int(nh.sum())))
            _, words_np, nv_np, ct_np = _pack(b)
            words = jnp.asarray(words_np)
            nv = jnp.asarray(nv_np)
            ct = jnp.asarray(ct_np)
            out = _pallas_join_rows(words, nv, ct, carry_in, sp_m_d,
                                    sp_lo_d, sp_perm_d, sp_off_d, k, w, R,
                                    super_blocks, ec, ctot, rounds, bits,
                                    interpret)  # rare retry: no cache
            pend[b][2] = out
            nm = np.asarray(out[0]).astype(np.int64)
            nh = np.asarray(out[1]).astype(np.int64)
        counts[b, 0] = nm
        counts[b, 1] = nh
        tot = int(nh.sum())
        started[b] = (tot,) + ((None, None) if tot <= 0
                               else (fetch_prefix_start(out[2], tot),
                                     fetch_prefix_start(out[3], tot)))

    # opt-in stage profile (PHI_TPU_JOIN_PROF=1): wall spent waiting on the
    # pack lookahead, enqueueing dispatches, and blocking in harvest — the
    # three places the host can stall the device pipeline. perf_counter
    # (monotonic) so NTP adjustments can't skew the accumulated intervals;
    # timer bookkeeping is gated on the flag (dead work otherwise); the
    # report is emitted in the finally block so a mid-pipeline error (e.g.
    # a retry OOM in _harvest) still surfaces the partial timings.
    import os as _os
    prof = _os.environ.get("PHI_TPU_JOIN_PROF") == "1"
    t_pack = t_disp = t_harv = 0.0
    from time import perf_counter as _now

    carry = jnp.zeros(3, jnp.uint32)
    try:
        fut = _packer.submit(_pack, 0)
        for b in range(n_batches):
            if prof:
                t0 = _now()
            packed = fut.result()
            if prof:
                t_pack += _now() - t0
            if b + 1 < n_batches:
                fut = _packer.submit(_pack, b + 1)
            if prof:
                t0 = _now()
            pend[b] = _dispatch(b, carry, packed)
            carry = pend[b][2][4]
            if prof:
                t_disp += _now() - t0
            if b >= WINDOW:
                if prof:
                    t0 = _now()
                _harvest(b - WINDOW)
                if prof:
                    t_harv += _now() - t0
        if prof:
            t0 = _now()
        for b in range(max(0, n_batches - WINDOW), n_batches):
            _harvest(b)
        if prof:
            t_harv += _now() - t0
    finally:
        _packer.shutdown(wait=False)
        if prof:
            import sys as _sys
            _sys.stderr.write(
                f"[join-prof] batches={n_batches} pack_wait={t_pack:.3f} "
                f"dispatch={t_disp:.3f} harvest={t_harv:.3f}\n")
    acc: dict[int, tuple[int, list, list]] = {}
    for b, (batch, _, out) in enumerate(pend):
        total, dpos, did = started[b]
        fpos = np.asarray(dpos)[:total] if dpos is not None \
            else np.zeros(0, np.int32)
        fid = np.asarray(did)[:total] if did is not None \
            else np.zeros(0, np.int32)
        off = 0
        for j, (si, start, nv, cont) in enumerate(batch):
            if si < 0:
                continue
            nm, nh = int(counts[b, 0, j]), int(counts[b, 1, j])
            n_min_acc, pos_parts, id_parts = acc.get(si, (0, [], []))
            if nh:
                pos_parts.append(fpos[off:off + nh] + start)
                id_parts.append(fid[off:off + nh])
            acc[si] = (n_min_acc + nm, pos_parts, id_parts)
            off += nh
    for si, (n_min, pos_parts, id_parts) in acc.items():
        if pos_parts:
            results[si] = (n_min, np.concatenate(pos_parts).astype(np.int32),
                           np.concatenate(id_parts).astype(np.int32))
        else:
            results[si] = (n_min, np.zeros(0, np.int32),
                           np.zeros(0, np.int32))
    return results


# ---------------------------------------------------------------------------
# v2 rows kernel: same sketch + dedup as _make_kernel_rows, plus per-window
# WALK-POSITION intervals [s, e] computed in-kernel from a per-base
# node-index-delta plane (delta[b] = number of node starts at base b, so a
# prefix sum reproduces searchsorted(cumlen, base, 'right') - 1 exactly,
# including zero-length nodes). s/e ride through the window-min selection,
# so the emitted minimizers come out anchor-ready — no host-side interval
# conversion and no bulk hit fetch (the device-resident anchor pipeline,
# anchors/device.py, consumes these directly).
# ---------------------------------------------------------------------------


def _make_kernel_rows2(k: int, w: int):
    n_hi = max(0, k - 16)

    def kernel(nvalid_ref, cont_ref, base_ref, init_ref, codes_ref, next_ref,
               nd_ref, ndnext_ref, hi_ref, lo_ref, se_ref,
               emit_ref, co_ref, carry_ref):
        row_id = pl.program_id(0)
        blk_id = pl.program_id(1)

        @pl.when(blk_id == 0)
        def _row_start():
            cont = cont_ref[row_id] != 0
            k0 = jnp.where(row_id == 0, init_ref[0], carry_ref[0])
            k1 = jnp.where(row_id == 0, init_ref[1], carry_ref[1])
            k2 = jnp.where(row_id == 0, init_ref[2], carry_ref[2])
            carry_ref[0] = jnp.where(cont, k0, jnp.uint32(0xFFFFFFFF))
            carry_ref[1] = jnp.where(cont, k1, jnp.uint32(0xFFFFFFFF))
            carry_ref[2] = jnp.where(cont, k2, jnp.uint32(0))
            carry_ref[3] = jnp.uint32(0)  # node-count carry (per-row)

        xi = jnp.concatenate(
            [codes_ref[0].astype(jnp.int32),
             next_ref[0][:, :HALO_PAD].astype(jnp.int32)], axis=1)
        rc_i = jnp.int32(3) - jnp.minimum(xi, 3)
        x = xi.astype(jnp.uint32)
        fhi = jnp.zeros_like(x)
        flo = jnp.zeros_like(x)
        rhi = jnp.zeros_like(x)
        rlo = jnp.zeros_like(x)
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

        # node-index prefix sum over the block (+halo): inclusive cumsum of
        # the delta plane via log-doubling rolls with zero shift-in
        nd = jnp.concatenate(
            [nd_ref[0].astype(jnp.int32),
             ndnext_ref[0][:, :HALO_PAD].astype(jnp.int32)], axis=1)
        c = nd
        step = 1
        while step < c.shape[1]:
            rolled = pltpu.roll(c, step, 1)  # shift right by `step`
            c = c + jnp.where(lane >= step, rolled, 0)
            step *= 2
        cnt_base = base_ref[row_id] + carry_ref[3].astype(jnp.int32)
        s_arr = cnt_base + c                      # node idx at k-mer start
        e_arr = cnt_base + _roll_l(c, k - 1)      # node idx at k-mer end
        carry_ref[3] = carry_ref[3] + c[0, BLK - 1].astype(jnp.uint32)
        # pack before the window-min so a single passenger array rides
        # through the doubling steps: (walk_pos << 6) | span, span <= k <= 31
        packed_arr = ((s_arr.astype(jnp.uint32) << jnp.uint32(6))
                      | jnp.minimum(e_arr - s_arr, 63).astype(jnp.uint32))

        t = (hi, lo, pos, packed_arr)
        sdl = 1
        while sdl * 2 <= w:
            t = _tuple_min4(t, tuple(_roll_l(v, sdl) for v in t))
            sdl *= 2
        t = _tuple_min4(t, tuple(_roll_l(v, w - sdl) for v in t))
        shi, slo, spos, spacked = t

        n_valid = nvalid_ref[row_id]
        valid = (spos >= 0) & (gpos < n_valid)
        at0 = lane == 0
        phi = jnp.where(at0, carry_ref[0], pltpu.roll(shi, 1, 1))
        plo = jnp.where(at0, carry_ref[1], pltpu.roll(slo, 1, 1))
        pvd = jnp.where(at0, carry_ref[2].astype(jnp.int32),
                        pltpu.roll(valid.astype(jnp.int32), 1, 1))
        differs = (shi != phi) | (slo != plo) | (pvd == 0)
        emit = valid & differs

        hi_ref[0] = shi[:, :BLK]
        lo_ref[0] = slo[:, :BLK]
        se_ref[0] = jnp.where(valid, spacked, umax)[:, :BLK]
        emit_ref[0] = emit[:, :BLK].astype(jnp.int32)
        carry_ref[0] = shi[0, BLK - 1]
        carry_ref[1] = slo[0, BLK - 1]
        carry_ref[2] = valid.astype(jnp.uint32)[0, BLK - 1]
        co_ref[0] = carry_ref[0]
        co_ref[1] = carry_ref[1]
        co_ref[2] = carry_ref[2]

    return kernel


def _tuple_min4(a, b):
    """_tuple_min extended with a passenger value (the packed interval)
    that follows the (hi, lo, pos) selection."""
    ahi, alo, apos, ap = a
    bhi, blo, bpos, bp = b
    a_lt = (ahi < bhi) | ((ahi == bhi) & (alo < blo))
    a_eq = (ahi == bhi) & (alo == blo)
    take_a = a_lt | (a_eq & (apos >= bpos))
    return (jnp.where(take_a, ahi, bhi),
            jnp.where(take_a, alo, blo),
            jnp.where(take_a, apos, bpos),
            jnp.where(take_a, ap, bp))


def _pallas_sketch_rows2(codes2d, deltas2d, nvalid, cont, base_node,
                         init_carry, k: int, w: int, n_rows: int,
                         n_blocks: int, interpret: bool = False):
    """v2 multi-row sketch: returns (hi, lo, se, emit, carry). se packs the
    GLOBAL walk-position interval of each selected k-mer as
    (start << 6) | span (UMAX where the window is invalid); deltas2d is the
    uint8 per-base node-start-count plane aligned with codes2d (first lane
    of each row zeroed by the packer)."""
    kernel = _make_kernel_rows2(k, w)
    n_out = n_blocks * BLK
    codes3d = codes2d.reshape(n_rows, 1, -1)
    deltas3d = deltas2d.reshape(n_rows, 1, -1)
    smem_scalar = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_bs = pl.BlockSpec((1, 1, BLK), lambda r, i: (r, 0, i),
                          memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((n_rows, 1, n_out), jnp.uint32),
        jax.ShapeDtypeStruct((n_rows, 1, n_out), jnp.uint32),
        jax.ShapeDtypeStruct((n_rows, 1, n_out), jnp.uint32),
        jax.ShapeDtypeStruct((n_rows, 1, n_out), jnp.int32),
        jax.ShapeDtypeStruct((3,), jnp.uint32),
    ]
    hi, lo, se, emit, carry = pl.pallas_call(
        kernel,
        grid=(n_rows, n_blocks),
        in_specs=[
            smem_scalar,   # nvalid [R]
            smem_scalar,   # cont [R]
            smem_scalar,   # base_node [R]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # init_carry (3,)
            pl.BlockSpec((1, 1, BLK), lambda r, i: (r, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BLK), lambda r, i: (r, 0, i + 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BLK), lambda r, i: (r, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BLK), lambda r, i: (r, 0, i + 1),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_bs, out_bs, out_bs, out_bs,
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((4,), jnp.uint32)],
        interpret=interpret,
    )(nvalid, cont, base_node, init_carry, codes3d, codes3d,
      deltas3d, deltas3d)
    return (hi.reshape(n_rows, n_out), lo.reshape(n_rows, n_out),
            se.reshape(n_rows, n_out),
            emit.reshape(n_rows, n_out), carry)


@functools.partial(jax.jit, static_argnames=(
    "k", "w", "n_rows", "n_blocks", "emitcap", "cap_total", "interpret"))
def _pallas_join_rows2(words, deltas, nvalid, cont, base_node, hap_of_row,
                       init_carry, sp_m, sp_lo, sp_perm, sp_off, rounds,
                       k: int, w: int, n_rows: int, n_blocks: int,
                       emitcap: int, cap_total: int,
                       interpret: bool = False):
    """Batched fused sketch+join v2: flat per-hit (s, e, kmer_id, hap)
    columns out — walk-position intervals straight from the kernel, no base
    positions, no host interval conversion. Output stays on device; the
    caller appends it to the device hit accumulator (anchors/device.py).
    `rounds` is a TRACED scalar and the first-probe width derives from
    sp_off's shape, so the compiled program depends only on the spectrum's
    pow2 bucket family — stable across datasets and prewarmable."""
    from phi_tpu.ops.search import pair_isin_mixed
    bits = (sp_off.shape[0] - 1).bit_length() - 1

    R = n_rows
    row_lanes = (n_blocks + 1) * BLK
    n_out = n_blocks * BLK
    shifts = (jnp.arange(16, dtype=jnp.uint32) * 2)
    codes2d = ((words[:, :, None] >> shifts[None, None, :]) & jnp.uint32(3)
               ).astype(jnp.uint8).reshape(R, row_lanes)
    hi, lo, se, emit, carry_out = _pallas_sketch_rows2(
        codes2d, deltas, nvalid, cont, base_node, init_carry, k, w, R,
        n_blocks, interpret)
    emit = emit != 0
    n_min = emit.sum(axis=1)

    rowi = jax.lax.broadcasted_iota(jnp.int32, emit.shape, 0)
    lanei = jax.lax.broadcasted_iota(jnp.int32, emit.shape, 1)
    order = jnp.cumsum(emit.astype(jnp.int32), axis=1) - 1
    dst = jnp.where(emit, jnp.minimum(order, emitcap), emitcap)
    eidx = jnp.full((R, emitcap + 1), n_out, jnp.int32) \
        .at[rowi, dst].set(lanei, mode="drop")[:, :emitcap]
    sent_u = jnp.full((R, 1), 0xFFFFFFFF, jnp.uint32)
    ehi = jnp.take_along_axis(jnp.concatenate([hi, sent_u], 1), eidx, 1)
    elo = jnp.take_along_axis(jnp.concatenate([lo, sent_u], 1), eidx, 1)
    ese = jnp.take_along_axis(jnp.concatenate([se, sent_u], 1), eidx, 1)

    found, idx = pair_isin_mixed(sp_m, sp_lo, sp_perm, sp_off, ehi, elo,
                                 rounds, bits)
    return _flatten_hits(n_min, found, idx, ese, hap_of_row, cap_total) \
        + (carry_out,)


def _flatten_hits(n_min, found, idx, ese, hap_of_row, cap_total: int):
    """Shared tail of the join programs: row-major flattening of the hit
    columns (packed interval, spectrum id, hap) into [cap_total] arrays."""
    hit = found & (ese != jnp.uint32(0xFFFFFFFF))
    n_hit = hit.sum(axis=1)
    base = jnp.concatenate([jnp.zeros(1, jnp.int32),
                            jnp.cumsum(n_hit).astype(jnp.int32)[:-1]])
    horder = jnp.cumsum(hit.astype(jnp.int32), axis=1) - 1 + base[:, None]
    hdst = jnp.where(hit, jnp.minimum(horder, cap_total), cap_total).ravel()
    hap_b = jnp.broadcast_to(hap_of_row[:, None], ese.shape)

    def flat(vals, fill):
        return jnp.full((cap_total + 1,), fill, vals.dtype) \
            .at[hdst].set(vals.ravel(), mode="drop")[:cap_total]

    return (n_min, n_hit, flat(ese, jnp.uint32(0xFFFFFFFF)),
            flat(idx.astype(jnp.int32), -1), flat(hap_b, -1))


@functools.partial(jax.jit, static_argnames=(
    "k", "w", "n_rows", "n_blocks", "emitcap", "cap_total", "interpret"))
def _pallas_join_rows2_ck(words, deltas, nvalid, cont, base_node,
                          hap_of_row, init_carry, ck_hi, ck_lo, ck_id,
                          ck_seed, k: int, w: int, n_rows: int,
                          n_blocks: int, emitcap: int, cap_total: int,
                          interpret: bool = False):
    """_pallas_join_rows2 with the cuckoo spectrum probe (ops.search
    .pair_isin_cuckoo): six gathers, no bisect rounds — the probe was
    ~45% of per-batch exec with the bucketed binary search."""
    from phi_tpu.ops.search import pair_isin_cuckoo

    R = n_rows
    row_lanes = (n_blocks + 1) * BLK
    n_out = n_blocks * BLK
    shifts = (jnp.arange(16, dtype=jnp.uint32) * 2)
    codes2d = ((words[:, :, None] >> shifts[None, None, :]) & jnp.uint32(3)
               ).astype(jnp.uint8).reshape(R, row_lanes)
    hi, lo, se, emit, carry_out = _pallas_sketch_rows2(
        codes2d, deltas, nvalid, cont, base_node, init_carry, k, w, R,
        n_blocks, interpret)
    emit = emit != 0
    n_min = emit.sum(axis=1)

    rowi = jax.lax.broadcasted_iota(jnp.int32, emit.shape, 0)
    lanei = jax.lax.broadcasted_iota(jnp.int32, emit.shape, 1)
    order = jnp.cumsum(emit.astype(jnp.int32), axis=1) - 1
    dst = jnp.where(emit, jnp.minimum(order, emitcap), emitcap)
    eidx = jnp.full((R, emitcap + 1), n_out, jnp.int32) \
        .at[rowi, dst].set(lanei, mode="drop")[:, :emitcap]
    sent_u = jnp.full((R, 1), 0xFFFFFFFF, jnp.uint32)
    ehi = jnp.take_along_axis(jnp.concatenate([hi, sent_u], 1), eidx, 1)
    elo = jnp.take_along_axis(jnp.concatenate([lo, sent_u], 1), eidx, 1)
    ese = jnp.take_along_axis(jnp.concatenate([se, sent_u], 1), eidx, 1)

    found, idx = pair_isin_cuckoo(ck_hi, ck_lo, ck_id, ck_seed, ehi, elo)
    return _flatten_hits(n_min, found, idx, ese, hap_of_row, cap_total) \
        + (carry_out,)


# ---------------------------------------------------------------------------
# v3 rows kernel: v2 + IN-KERNEL emitted-lane compaction. The round-4 profile
# (DESIGN.md "Device-resident anchors") showed the Pallas kernel at ~13-15%
# of per-batch exec with the rest being XLA glue between kernel invocations:
# a 16.8M-lane cumsum + scatter compaction (~0.15 s/batch) and the spectrum
# probe. This kernel packs each block's emitted selections to the left of
# the block IN VMEM (LSB-first conditional-shift compaction) and emits
# probe-ready [R, n_blocks*C] arrays plus per-block counts — the XLA glue
# shrinks from 16.8M lanes to n_blocks*C (~8x at w=25) and the big scatter
# disappears entirely.
#
# Pack-left correctness: shift distances d[j] = lane - rank are
# non-decreasing along the block with steps in {0, 1}, and live elements
# have strictly increasing targets (their ranks). Processing shifts
# LSB-first (s = 1, 2, 4, ...) keeps all remaining live distances ≡ 0
# (mod 2s) after step s; a clobber at step s would need adjacent live
# distances with d_B - d_A ≡ s (mod 2s) and d_B ≥ d_A and d_B - d_A < s —
# impossible. Elements never cross, so the result is the stable
# left-compaction of the emitted lanes.
# ---------------------------------------------------------------------------


def block_cap(w: int) -> int:
    """Per-block compacted capacity C for the v3 kernel: pow2 with ~1.6x
    headroom over the expected 2.36/(w+1) dedup-emission density (density
    only ever drops on repetitive sequence; adversarial inputs that exceed
    C are detected via the exact per-block counts and the batch reruns on
    the v2 full-lane program)."""
    import os
    forced = os.environ.get("PHI_TPU_BLK_CAP")
    if forced:
        return int(forced)
    c = 1 << max(8, (BLK * 33 // (10 * (w + 1))).bit_length())
    return min(c, BLK)


def _make_kernel_rows3(k: int, w: int, C: int):
    n_hi = max(0, k - 16)

    def kernel(nvalid_ref, cont_ref, base_ref, init_ref, codes_ref, next_ref,
               nd_ref, ndnext_ref, hi_ref, lo_ref, se_ref,
               cnt_ref, co_ref, carry_ref):
        row_id = pl.program_id(0)
        blk_id = pl.program_id(1)

        @pl.when(blk_id == 0)
        def _row_start():
            cont = cont_ref[row_id] != 0
            k0 = jnp.where(row_id == 0, init_ref[0], carry_ref[0])
            k1 = jnp.where(row_id == 0, init_ref[1], carry_ref[1])
            k2 = jnp.where(row_id == 0, init_ref[2], carry_ref[2])
            carry_ref[0] = jnp.where(cont, k0, jnp.uint32(0xFFFFFFFF))
            carry_ref[1] = jnp.where(cont, k1, jnp.uint32(0xFFFFFFFF))
            carry_ref[2] = jnp.where(cont, k2, jnp.uint32(0))
            carry_ref[3] = jnp.uint32(0)  # node-count carry (per-row)

        # blocks fully past this row's window count (row-tail padding, and
        # every block of a dummy pad row) skip the whole body: emit empty
        # compacted outputs and leave the carries untouched. At the 49-hap
        # flagship ~20%% of grid steps are such padding.
        umax_c = jnp.uint32(0xFFFFFFFF)
        active = blk_id * BLK < nvalid_ref[row_id]

        @pl.when(jnp.logical_not(active))
        def _skip():
            dead = jnp.full((1, C), umax_c, jnp.uint32)
            hi_ref[0] = dead
            lo_ref[0] = dead
            se_ref[0] = dead
            cnt_ref[row_id, blk_id] = jnp.int32(0)
            co_ref[0] = carry_ref[0]
            co_ref[1] = carry_ref[1]
            co_ref[2] = carry_ref[2]

        @pl.when(active)
        def _body():
            xi = jnp.concatenate(
                [codes_ref[0].astype(jnp.int32),
                 next_ref[0][:, :HALO_PAD].astype(jnp.int32)], axis=1)
            rc_i = jnp.int32(3) - jnp.minimum(xi, 3)
            x = xi.astype(jnp.uint32)
            fhi = jnp.zeros_like(x)
            flo = jnp.zeros_like(x)
            rhi = jnp.zeros_like(x)
            rlo = jnp.zeros_like(x)
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

            nd = jnp.concatenate(
                [nd_ref[0].astype(jnp.int32),
                 ndnext_ref[0][:, :HALO_PAD].astype(jnp.int32)], axis=1)
            c = nd
            step = 1
            while step < c.shape[1]:
                rolled = pltpu.roll(c, step, 1)  # shift right by `step`
                c = c + jnp.where(lane >= step, rolled, 0)
                step *= 2
            cnt_base = base_ref[row_id] + carry_ref[3].astype(jnp.int32)
            s_arr = cnt_base + c
            e_arr = cnt_base + _roll_l(c, k - 1)
            carry_ref[3] = carry_ref[3] + c[0, BLK - 1].astype(jnp.uint32)
            packed_arr = ((s_arr.astype(jnp.uint32) << jnp.uint32(6))
                          | jnp.minimum(e_arr - s_arr, 63).astype(jnp.uint32))

            t = (hi, lo, pos, packed_arr)
            sdl = 1
            while sdl * 2 <= w:
                t = _tuple_min4(t, tuple(_roll_l(v, sdl) for v in t))
                sdl *= 2
            t = _tuple_min4(t, tuple(_roll_l(v, w - sdl) for v in t))
            shi, slo, spos, spacked = t

            n_valid = nvalid_ref[row_id]
            valid = (spos >= 0) & (gpos < n_valid)
            at0 = lane == 0
            phi = jnp.where(at0, carry_ref[0], pltpu.roll(shi, 1, 1))
            plo = jnp.where(at0, carry_ref[1], pltpu.roll(slo, 1, 1))
            pvd = jnp.where(at0, carry_ref[2].astype(jnp.int32),
                            pltpu.roll(valid.astype(jnp.int32), 1, 1))
            differs = (shi != phi) | (slo != plo) | (pvd == 0)
            emit = valid & differs

            carry_ref[0] = shi[0, BLK - 1]
            carry_ref[1] = slo[0, BLK - 1]
            carry_ref[2] = valid.astype(jnp.uint32)[0, BLK - 1]
            co_ref[0] = carry_ref[0]
            co_ref[1] = carry_ref[1]
            co_ref[2] = carry_ref[2]

            # --- in-kernel pack-left of the emitted lanes (this block only) ---
            width = x.shape[1]
            live = (emit & (lane < BLK)).astype(jnp.int32)
            rank = live
            step = 1
            while step < BLK:
                rolled = pltpu.roll(rank, step, 1)
                rank = rank + jnp.where(lane >= step, rolled, 0)
                step *= 2
            cnt = rank[0, BLK - 1]
            dist = lane - (rank - 1)   # meaningful on live lanes only
            vhi, vlo, vse = shi, slo, spacked
            lv = live
            s = 1
            sh = 0
            while s < BLK:
                a_lv = _roll_l(lv, s)
                a_dist = _roll_l(dist, s)
                inb = lane < (width - s)
                arrived = (a_lv > 0) & (((a_dist >> sh) & 1) > 0) & inb
                moved = (lv > 0) & (((dist >> sh) & 1) > 0)
                vhi = jnp.where(arrived, _roll_l(vhi, s), vhi)
                vlo = jnp.where(arrived, _roll_l(vlo, s), vlo)
                vse = jnp.where(arrived, _roll_l(vse, s), vse)
                dist = jnp.where(arrived, a_dist - s, dist)
                lv = jnp.where(arrived, 1, jnp.where(moved, 0, lv))
                s *= 2
                sh += 1
            in_cnt = lane < cnt
            hi_ref[0] = jnp.where(in_cnt, vhi, umax)[:, :C]
            lo_ref[0] = jnp.where(in_cnt, vlo, umax)[:, :C]
            se_ref[0] = jnp.where(in_cnt, vse, umax)[:, :C]
            cnt_ref[row_id, blk_id] = cnt

    return kernel


def _pallas_sketch_rows3(codes2d, deltas2d, nvalid, cont, base_node,
                         init_carry, k: int, w: int, n_rows: int,
                         n_blocks: int, C: int, interpret: bool = False):
    """v3 multi-row sketch: per-block left-compacted (hi, lo, se) arrays
    [R, n_blocks*C] (UMAX-padded past each block's count), per-block emitted
    counts [R, n_blocks] (exact even when a block exceeds C), and the dedup
    carry. Dead lanes carry (UMAX, UMAX) keys, which no canonical k-mer can
    equal, so the caller can probe the arrays as-is."""
    kernel = _make_kernel_rows3(k, w, C)
    codes3d = codes2d.reshape(n_rows, 1, -1)
    deltas3d = deltas2d.reshape(n_rows, 1, -1)
    smem_scalar = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_bs = pl.BlockSpec((1, 1, C), lambda r, i: (r, 0, i),
                          memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((n_rows, 1, n_blocks * C), jnp.uint32),
        jax.ShapeDtypeStruct((n_rows, 1, n_blocks * C), jnp.uint32),
        jax.ShapeDtypeStruct((n_rows, 1, n_blocks * C), jnp.uint32),
        jax.ShapeDtypeStruct((n_rows, n_blocks), jnp.int32),
        jax.ShapeDtypeStruct((3,), jnp.uint32),
    ]
    hi, lo, se, cnt, carry = pl.pallas_call(
        kernel,
        grid=(n_rows, n_blocks),
        in_specs=[
            smem_scalar,   # nvalid [R]
            smem_scalar,   # cont [R]
            smem_scalar,   # base_node [R]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # init_carry (3,)
            pl.BlockSpec((1, 1, BLK), lambda r, i: (r, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BLK), lambda r, i: (r, 0, i + 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BLK), lambda r, i: (r, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BLK), lambda r, i: (r, 0, i + 1),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_bs, out_bs, out_bs,
                   pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((4,), jnp.uint32)],
        interpret=interpret,
    )(nvalid, cont, base_node, init_carry, codes3d, codes3d,
      deltas3d, deltas3d)
    return (hi.reshape(n_rows, n_blocks * C), lo.reshape(n_rows, n_blocks * C),
            se.reshape(n_rows, n_blocks * C), cnt, carry)


def _delta_plane(starts, R: int, row_lanes: int):
    """Device-side node-start-count plane from per-row sorted start offsets
    (int32 [R, S_cap], padded with row_lanes -> dropped). Replaces the
    uint8 dense-plane upload (16.8 MB/batch at a measured 20-50 MB/s h2d
    tunnel) with a ~50-100x smaller index upload."""
    rowi = jax.lax.broadcasted_iota(jnp.int32, starts.shape, 0)
    plane = jnp.zeros((R, row_lanes), jnp.int32).at[rowi, starts].add(
        1, mode="drop")
    return jnp.minimum(plane, 255).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=(
    "k", "w", "n_rows", "n_blocks", "C", "cap_total", "interpret"))
def _pallas_join_rows3_ck(words, starts, nvalid, cont, base_node,
                          hap_of_row, init_carry, ck_hi, ck_lo, ck_id,
                          ck_seed, k: int, w: int, n_rows: int,
                          n_blocks: int, C: int, cap_total: int,
                          interpret: bool = False):
    """v3 fused join: sparse node-start upload, in-kernel compaction, and a
    4-gather cuckoo probe (slot ids; one Tid remap gather at flatten time).
    Same output contract as _pallas_join_rows2_ck plus per-row max block
    counts (overflow detection)."""
    from phi_tpu.ops.search import pair_isin_cuckoo_slot

    R = n_rows
    row_lanes = (n_blocks + 1) * BLK
    shifts = (jnp.arange(16, dtype=jnp.uint32) * 2)
    codes2d = ((words[:, :, None] >> shifts[None, None, :]) & jnp.uint32(3)
               ).astype(jnp.uint8).reshape(R, row_lanes)
    deltas2d = _delta_plane(starts, R, row_lanes)
    ehi, elo, ese, cnt, carry_out = _pallas_sketch_rows3(
        codes2d, deltas2d, nvalid, cont, base_node, init_carry, k, w, R,
        n_blocks, C, interpret)
    n_min = cnt.sum(axis=1)
    cnt_max = cnt.max(axis=1)

    found, slot = pair_isin_cuckoo_slot(ck_hi, ck_lo, ck_seed, ehi, elo)
    nm, nh, f_se, f_slot, f_hap = _flatten_hits(
        n_min, found, slot, ese, hap_of_row, cap_total)
    # slot -> spectrum id: ONE gather on [cap_total] replaces the two
    # [R, n_blocks*C] Tid gathers inside the probe
    f_id = jnp.where(f_slot >= 0,
                     ck_id[jnp.maximum(f_slot, 0)], jnp.int32(-1))
    return nm, nh, f_se, f_id, f_hap, carry_out, cnt_max


def pack_row_deltas(cumlens, rows, row_lanes: int) -> np.ndarray:
    """Host-side per-base node-start-count plane for the v2 kernel rows:
    deltas[j] = number of walk_node_cumlen entries equal to (start + j),
    with lane 0 forced to 0 (the row-start base's node is base_node).
    uint8 saturates at 255 consecutive zero-length nodes — beyond any real
    graph (the builder would need 255 empty nodes at one base)."""
    R = len(rows)
    buf = np.zeros((R, row_lanes), np.uint8)
    for j, (si, start, nv, cont) in enumerate(rows):
        if si < 0:
            continue
        cl = cumlens[si]
        lo = np.searchsorted(cl, start, side="right")
        hi = np.searchsorted(cl, start + row_lanes)
        starts = (cl[lo:hi] - start).astype(np.int64)
        if len(starts):
            cnt = np.bincount(starts, minlength=row_lanes)[:row_lanes]
            buf[j] = np.minimum(cnt, 255).astype(np.uint8)
            buf[j, 0] = 0
    return buf


def row_base_nodes(cumlens, rows) -> np.ndarray:
    """Global walk position (node index) at each row's start base."""
    out = np.zeros(len(rows), np.int32)
    for j, (si, start, nv, cont) in enumerate(rows):
        if si < 0:
            continue
        out[j] = np.searchsorted(cumlens[si], start, side="right") - 1
    return out


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


# ---------------------------------------------------------------------------
# Wide-k (31 < k <= 63) rows kernel: the reference accepts arbitrary k
# (ILP_index.cpp:386-407) and the host path covers 31 < k <= 63 via the
# native 128-bit scan with 64-bit folded join keys (phi_native.cpp
# ::minimizer_scan / fold128_64). This kernel brings the same capability to
# the device join: canonical k-mers pack into FOUR u32 words (word i holds
# 16 consecutive bases, word 3 most significant — bit-identical to the
# native __int128 layout), the window-min selects by the 126-bit
# lexicographic order, and the emitted minimizers are folded to the same
# 64-bit join key in the XLA glue (u32-limb emulation of splitmix64).
# ---------------------------------------------------------------------------


def _tuple_min6(a, b):
    """4-word lexicographic min with (pos, se) passengers."""
    a3, a2, a1, a0, apos, ap = a
    b3, b2, b1, b0, bpos, bp = b
    a_lt = (a3 < b3) | ((a3 == b3) & ((a2 < b2) | ((a2 == b2) & (
        (a1 < b1) | ((a1 == b1) & (a0 < b0))))))
    a_eq = (a3 == b3) & (a2 == b2) & (a1 == b1) & (a0 == b0)
    take_a = a_lt | (a_eq & (apos >= bpos))
    sel = lambda x, y: jnp.where(take_a, x, y)
    return (sel(a3, b3), sel(a2, b2), sel(a1, b1), sel(a0, b0),
            sel(apos, bpos), sel(ap, bp))


def _make_kernel_rows3w(k: int, w: int, C: int):
    assert 31 < k <= 63

    def kernel(nvalid_ref, cont_ref, base_ref, init_ref, codes_ref, next_ref,
               nd_ref, ndnext_ref, w3_ref, w2_ref, w1_ref, w0_ref, se_ref,
               cnt_ref, co_ref, carry_ref):
        row_id = pl.program_id(0)
        blk_id = pl.program_id(1)
        umax = jnp.uint32(0xFFFFFFFF)

        @pl.when(blk_id == 0)
        def _row_start():
            cont = cont_ref[row_id] != 0
            for i in range(5):   # w3..w0 + validity
                ki = jnp.where(row_id == 0, init_ref[i], carry_ref[i])
                fill = umax if i < 4 else jnp.uint32(0)
                carry_ref[i] = jnp.where(cont, ki, fill)
            carry_ref[5] = jnp.uint32(0)  # node-count carry (per-row)

        active = blk_id * BLK < nvalid_ref[row_id]

        @pl.when(jnp.logical_not(active))
        def _skip():
            dead = jnp.full((1, C), umax, jnp.uint32)
            w3_ref[0] = dead
            w2_ref[0] = dead
            w1_ref[0] = dead
            w0_ref[0] = dead
            se_ref[0] = dead
            cnt_ref[row_id, blk_id] = jnp.int32(0)
            for i in range(5):
                co_ref[i] = carry_ref[i]

        @pl.when(active)
        def _body():
            xi = jnp.concatenate(
                [codes_ref[0].astype(jnp.int32),
                 next_ref[0][:, :HALO_PAD].astype(jnp.int32)], axis=1)
            rc_i = jnp.int32(3) - jnp.minimum(xi, 3)
            x = xi.astype(jnp.uint32)
            fw = [jnp.zeros_like(x) for _ in range(4)]
            rw = [jnp.zeros_like(x) for _ in range(4)]
            invalid = jnp.where(xi >= 4, jnp.int32(1), jnp.int32(0))
            col = x
            rcolsrc = rc_i.astype(jnp.uint32)
            two = jnp.uint32(2)
            for j in range(k):
                wi = (k - 1 - j) // 16
                cj = _roll_l(col, j) if j else col
                rj = _roll_l(rcolsrc, k - 1 - j) if k - 1 - j else rcolsrc
                fw[wi] = (fw[wi] << two) | cj
                rw[wi] = (rw[wi] << two) | rj
                if j:
                    invalid = jnp.maximum(invalid, jnp.where(cj >= 4, 1, 0))
            f_lt = jnp.zeros_like(x) > 0
            f_eq = jnp.ones_like(x) > 0
            for i in (3, 2, 1, 0):
                f_lt = f_lt | (f_eq & (fw[i] < rw[i]))
                f_eq = f_eq & (fw[i] == rw[i])
            f_le = f_lt | f_eq
            ws = [jnp.where(invalid > 0, umax,
                            jnp.where(f_le, fw[i], rw[i]))
                  for i in range(4)]
            lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
            gpos = blk_id * BLK + lane
            pos = jnp.where(invalid > 0, jnp.int32(-1), gpos)

            nd = jnp.concatenate(
                [nd_ref[0].astype(jnp.int32),
                 ndnext_ref[0][:, :HALO_PAD].astype(jnp.int32)], axis=1)
            c = nd
            step = 1
            while step < c.shape[1]:
                rolled = pltpu.roll(c, step, 1)
                c = c + jnp.where(lane >= step, rolled, 0)
                step *= 2
            cnt_base = base_ref[row_id] + carry_ref[5].astype(jnp.int32)
            s_arr = cnt_base + c
            e_arr = cnt_base + _roll_l(c, k - 1)
            carry_ref[5] = carry_ref[5] + c[0, BLK - 1].astype(jnp.uint32)
            packed_arr = ((s_arr.astype(jnp.uint32) << jnp.uint32(6))
                          | jnp.minimum(e_arr - s_arr, 63).astype(jnp.uint32))

            t = (ws[3], ws[2], ws[1], ws[0], pos, packed_arr)
            sdl = 1
            while sdl * 2 <= w:
                t = _tuple_min6(t, tuple(_roll_l(v, sdl) for v in t))
                sdl *= 2
            t = _tuple_min6(t, tuple(_roll_l(v, w - sdl) for v in t))
            s3, s2, s1, s0, spos, spacked = t

            n_valid = nvalid_ref[row_id]
            valid = (spos >= 0) & (gpos < n_valid)
            at0 = lane == 0
            prevs = [jnp.where(at0, carry_ref[i], pltpu.roll(sv, 1, 1))
                     for i, sv in ((0, s3), (1, s2), (2, s1), (3, s0))]
            pvd = jnp.where(at0, carry_ref[4].astype(jnp.int32),
                            pltpu.roll(valid.astype(jnp.int32), 1, 1))
            differs = ((s3 != prevs[0]) | (s2 != prevs[1])
                       | (s1 != prevs[2]) | (s0 != prevs[3]) | (pvd == 0))
            emit = valid & differs

            carry_ref[0] = s3[0, BLK - 1]
            carry_ref[1] = s2[0, BLK - 1]
            carry_ref[2] = s1[0, BLK - 1]
            carry_ref[3] = s0[0, BLK - 1]
            carry_ref[4] = valid.astype(jnp.uint32)[0, BLK - 1]
            for i in range(5):
                co_ref[i] = carry_ref[i]

            # in-kernel pack-left (same algorithm/proof as _make_kernel_rows3)
            width = x.shape[1]
            live = (emit & (lane < BLK)).astype(jnp.int32)
            rank = live
            step = 1
            while step < BLK:
                rolled = pltpu.roll(rank, step, 1)
                rank = rank + jnp.where(lane >= step, rolled, 0)
                step *= 2
            cnt = rank[0, BLK - 1]
            dist = lane - (rank - 1)
            v3, v2, v1, v0, vse = s3, s2, s1, s0, spacked
            lv = live
            s = 1
            sh = 0
            while s < BLK:
                a_lv = _roll_l(lv, s)
                a_dist = _roll_l(dist, s)
                inb = lane < (width - s)
                arrived = (a_lv > 0) & (((a_dist >> sh) & 1) > 0) & inb
                moved = (lv > 0) & (((dist >> sh) & 1) > 0)
                v3 = jnp.where(arrived, _roll_l(v3, s), v3)
                v2 = jnp.where(arrived, _roll_l(v2, s), v2)
                v1 = jnp.where(arrived, _roll_l(v1, s), v1)
                v0 = jnp.where(arrived, _roll_l(v0, s), v0)
                vse = jnp.where(arrived, _roll_l(vse, s), vse)
                dist = jnp.where(arrived, a_dist - s, dist)
                lv = jnp.where(arrived, 1, jnp.where(moved, 0, lv))
                s *= 2
                sh += 1
            in_cnt = lane < cnt
            w3_ref[0] = jnp.where(in_cnt, v3, umax)[:, :C]
            w2_ref[0] = jnp.where(in_cnt, v2, umax)[:, :C]
            w1_ref[0] = jnp.where(in_cnt, v1, umax)[:, :C]
            w0_ref[0] = jnp.where(in_cnt, v0, umax)[:, :C]
            se_ref[0] = jnp.where(in_cnt, vse, umax)[:, :C]
            cnt_ref[row_id, blk_id] = cnt

    return kernel


def _pallas_sketch_rows3w(codes2d, deltas2d, nvalid, cont, base_node,
                          init_carry, k: int, w: int, n_rows: int,
                          n_blocks: int, C: int, interpret: bool = False):
    """Wide-k v3 sketch: per-block left-compacted 4-word canonical keys +
    packed intervals [R, n_blocks*C], per-block counts, and the (5,) dedup
    carry (w3..w0 + validity)."""
    kernel = _make_kernel_rows3w(k, w, C)
    codes3d = codes2d.reshape(n_rows, 1, -1)
    deltas3d = deltas2d.reshape(n_rows, 1, -1)
    smem_scalar = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_bs = pl.BlockSpec((1, 1, C), lambda r, i: (r, 0, i),
                          memory_space=pltpu.VMEM)
    n_out = n_blocks * C
    out_shape = [jax.ShapeDtypeStruct((n_rows, 1, n_out), jnp.uint32)
                 for _ in range(5)] + [
        jax.ShapeDtypeStruct((n_rows, n_blocks), jnp.int32),
        jax.ShapeDtypeStruct((5,), jnp.uint32),
    ]
    w3, w2, w1, w0, se, cnt, carry = pl.pallas_call(
        kernel,
        grid=(n_rows, n_blocks),
        in_specs=[
            smem_scalar, smem_scalar, smem_scalar,
            pl.BlockSpec(memory_space=pltpu.SMEM),  # init_carry (5,)
            pl.BlockSpec((1, 1, BLK), lambda r, i: (r, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BLK), lambda r, i: (r, 0, i + 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BLK), lambda r, i: (r, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BLK), lambda r, i: (r, 0, i + 1),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_bs] * 5 + [pl.BlockSpec(memory_space=pltpu.SMEM),
                                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((6,), jnp.uint32)],
        interpret=interpret,
    )(nvalid, cont, base_node, init_carry, codes3d, codes3d,
      deltas3d, deltas3d)
    rs = lambda a: a.reshape(n_rows, n_out)
    return rs(w3), rs(w2), rs(w1), rs(w0), rs(se), cnt, carry


# ---- u32-limb emulation of the 64-bit fold (phi_native.cpp::fold128_64,
# encode.fold128_64_np) — elementwise XLA glue on the compacted lanes ----

def _mul32_full(a, b):
    """(hi, lo) of a*b for u32 lanes (16-bit limb products)."""
    a0 = a & jnp.uint32(0xFFFF)
    a1 = a >> jnp.uint32(16)
    b0 = b & jnp.uint32(0xFFFF)
    b1 = b >> jnp.uint32(16)
    p0 = a0 * b0
    p1 = a1 * b0
    p2 = a0 * b1
    p3 = a1 * b1
    mid = p1 + p2
    carry_mid = (mid < p1).astype(jnp.uint32)
    lo = p0 + (mid << jnp.uint32(16))
    carry_lo = (lo < p0).astype(jnp.uint32)
    hi = p3 + (mid >> jnp.uint32(16)) + (carry_mid << jnp.uint32(16)) \
        + carry_lo
    return hi, lo


def _mul64_lo(ah, al, bh, bl):
    """Low 64 bits of (ah:al) * (bh:bl), as (hi, lo) u32 words."""
    hi, lo = _mul32_full(al, bl)
    hi = hi + al * bh + ah * bl
    return hi, lo


def _xor_shr64(h, l, s: int):
    """(h:l) ^ ((h:l) >> s) for 0 < s < 32."""
    sh = jnp.uint32(s)
    inv = jnp.uint32(32 - s)
    return h ^ (h >> sh), l ^ ((l >> sh) | (h << inv))


def _mix64_u32(h, l):
    """splitmix64 finalizer on (hi, lo) u32 pairs (encode.mix64_np twin)."""
    h, l = _xor_shr64(h, l, 30)
    h, l = _mul64_lo(h, l, jnp.uint32(0xBF58476D), jnp.uint32(0x1CE4E5B9))
    h, l = _xor_shr64(h, l, 27)
    h, l = _mul64_lo(h, l, jnp.uint32(0x94D049BB), jnp.uint32(0x133111EB))
    return _xor_shr64(h, l, 31)


def fold128_64_u32(w3, w2, w1, w0):
    """64-bit join key (hi, lo u32) of a 4-word canonical packing —
    bit-identical to fold128_64_np((w3<<32)|w2, (w1<<32)|w0)."""
    mh, ml = _mix64_u32(w1, w0)
    gh, gl = _mul64_lo(w3, w2, jnp.uint32(0x9E3779B9), jnp.uint32(0x7F4A7C15))
    return _mix64_u32(gh ^ mh, gl ^ ml)


@functools.partial(jax.jit, static_argnames=(
    "k", "w", "n_rows", "n_blocks", "C", "cap_total", "interpret"))
def _pallas_join_rows3w_ck(words, starts, nvalid, cont, base_node,
                           hap_of_row, init_carry, ck_hi, ck_lo, ck_id,
                           ck_seed, k: int, w: int, n_rows: int,
                           n_blocks: int, C: int, cap_total: int,
                           interpret: bool = False):
    """Wide-k v3 fused join: the sketch emits 4-word canonical keys; the
    glue folds them to the host's 64-bit join key and probes the (folded)
    read-spectrum cuckoo table. Same output contract as
    _pallas_join_rows3_ck."""
    from phi_tpu.ops.search import pair_isin_cuckoo_slot

    R = n_rows
    row_lanes = (n_blocks + 1) * BLK
    shifts = (jnp.arange(16, dtype=jnp.uint32) * 2)
    codes2d = ((words[:, :, None] >> shifts[None, None, :]) & jnp.uint32(3)
               ).astype(jnp.uint8).reshape(R, row_lanes)
    deltas2d = _delta_plane(starts, R, row_lanes)
    w3, w2, w1, w0, ese, cnt, carry_out = _pallas_sketch_rows3w(
        codes2d, deltas2d, nvalid, cont, base_node, init_carry, k, w, R,
        n_blocks, C, interpret)
    n_min = cnt.sum(axis=1)
    cnt_max = cnt.max(axis=1)

    fh, fl = fold128_64_u32(w3, w2, w1, w0)
    found, slot = pair_isin_cuckoo_slot(ck_hi, ck_lo, ck_seed, fh, fl)
    # dead lanes carry all-UMAX words whose fold is a fixed value that
    # COULD collide with a real table key — mask via se (UMAX only on
    # dead lanes), as the narrow path does
    nm, nh, f_se, f_slot, f_hap = _flatten_hits(
        n_min, found, slot, ese, hap_of_row, cap_total)
    f_id = jnp.where(f_slot >= 0,
                     ck_id[jnp.maximum(f_slot, 0)], jnp.int32(-1))
    return nm, nh, f_se, f_id, f_hap, carry_out, cnt_max
