"""2-bit k-mer packing helpers (host-side mirrors of the device kernel).

A k-mer (k <= 31) is packed big-endian into a (hi, lo) uint32 pair: `lo` holds
the last min(k,16) bases, `hi` the first k-16. Numeric order of (hi, lo) equals
ASCII-lexicographic order of the k-mer string for ACGT (A<C<G<T monotone with
codes 0..3), so numeric canonicalization/window-minima match the reference's
string comparisons (/root/reference/src/ILP_index.cpp:388-414) exactly.
"""

from __future__ import annotations

import numpy as np

MAX_K = 31  # hi must stay < 2^32-1 so the invalid sentinel is unambiguous


def pack_kmers_np(codes: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All k-mer (hi, lo) pairs + validity of a code array. Host reference impl."""
    if k > MAX_K:
        raise ValueError(f"k must be <= {MAX_K}")
    n = len(codes) - k + 1
    if n <= 0:
        z = np.zeros(0, np.uint32)
        return z, z.copy(), np.zeros(0, bool)
    hi = np.zeros(n, np.uint64)
    lo = np.zeros(n, np.uint64)
    invalid = np.zeros(n, bool)
    c = codes.astype(np.uint64)
    n_hi = max(0, k - 16)
    for j in range(k):
        col = c[j:j + n]
        if j < n_hi:
            hi = (hi << np.uint64(2)) | col
        else:
            lo = (lo << np.uint64(2)) | col
        invalid |= codes[j:j + n] >= 4
    return hi.astype(np.uint32), lo.astype(np.uint32), ~invalid


def revcomp_codes(codes: np.ndarray) -> np.ndarray:
    out = codes[::-1].copy()
    mask = out < 4
    out[mask] = 3 - out[mask]
    return out


def combine64(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    """(hi, lo) -> single uint64 key; preserves lexicographic order."""
    return (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)


def kmer_string(hi: int, lo: int, k: int) -> str:
    """Unpack for debugging."""
    val = (int(hi) << 32) | int(lo)
    return "".join("ACGT"[(val >> (2 * (k - 1 - j))) & 3] for j in range(k))
