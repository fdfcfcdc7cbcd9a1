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
# 31 < k <= 63 runs on the native 128-bit scan (selection compares the full
# canonical packing; join keys are fold128_64 of it — the reference itself
# joins on a folded 128-bit MurmurHash, ILP_index.cpp:10-18)
NATIVE_MAX_K = 63

_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)
_GOLD = np.uint64(0x9E3779B97F4A7C15)


def mix64_np(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — bit-for-bit twin of phi_native.cpp::phi_mix64."""
    x = x.astype(np.uint64)
    x = x ^ (x >> np.uint64(30))
    x = x * _M1
    x = x ^ (x >> np.uint64(27))
    x = x * _M2
    x = x ^ (x >> np.uint64(31))
    return x


def fold128_64_np(hi64: np.ndarray, lo64: np.ndarray) -> np.ndarray:
    """64-bit join key of a 128-bit canonical k-mer packing — twin of
    phi_native.cpp::fold128_64."""
    return mix64_np(hi64.astype(np.uint64) * _GOLD ^ mix64_np(lo64))


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
