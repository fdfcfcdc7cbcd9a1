"""Device-side primitives for 64-bit-keyed joins on TPU.

TPU JAX has no native 64-bit integers, so canonical k-mer keys live as
(hi, lo) uint32 pairs. This vectorized lexicographic binary search is the
device equivalent of np.searchsorted over the packed uint64 keys and powers
the on-device spectrum join (the reference's hash join, ILP_index.cpp:495-526).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def pair_searchsorted(sp_hi: jnp.ndarray, sp_lo: jnp.ndarray,
                      q_hi: jnp.ndarray, q_lo: jnp.ndarray) -> jnp.ndarray:
    """Leftmost insertion position of each query (hi,lo) into the array
    sorted lexicographically by (hi, lo). Static log2(n) gather/compare
    rounds — fully vectorized, no sequential loop over queries."""
    n = sp_hi.shape[0]
    lo = jnp.zeros(q_hi.shape, jnp.int32)
    hi = jnp.full(q_hi.shape, n, jnp.int32)
    if n == 0:
        return lo
    for _ in range(max(1, math.ceil(math.log2(n + 1)))):
        mid = (lo + hi) >> 1
        mid_c = jnp.minimum(mid, n - 1)
        mhi = sp_hi[mid_c]
        mlo = sp_lo[mid_c]
        less = (mhi < q_hi) | ((mhi == q_hi) & (mlo < q_lo))
        lo = jnp.where(less, mid + 1, lo)
        hi = jnp.where(less, hi, mid)
    return lo


def pair_isin(sp_hi, sp_lo, q_hi, q_lo):
    """(found_mask, index) of queries in the sorted (hi,lo) array."""
    n = sp_hi.shape[0]
    idx = pair_searchsorted(sp_hi, sp_lo, q_hi, q_lo)
    if n == 0:
        return jnp.zeros(q_hi.shape, bool), idx
    idx_c = jnp.minimum(idx, n - 1)
    found = (idx < n) & (sp_hi[idx_c] == q_hi) & (sp_lo[idx_c] == q_lo)
    return found, idx
