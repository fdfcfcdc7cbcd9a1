"""ctypes bindings for the native runtime library (native/phi_native.cpp).

The native layer provides fast host-side ingest (GFA, FASTA/FASTQ -> dense
arrays), toposort, and banded Myers edit distance. Every entry point has a
pure-Python fallback, so the package works without the .so; `available()`
reports which path is active. The library is built on demand with make.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO = os.path.join(_DIR, "libphi_native.so")
_lib: ctypes.CDLL | None = None
_tried = False
import threading as _threading

_lib_lock = _threading.Lock()

c_p = ctypes.c_void_p
c_i64 = ctypes.c_int64
c_i32p = ctypes.POINTER(ctypes.c_int32)
c_i64p = ctypes.POINTER(ctypes.c_int64)
c_u8p = ctypes.POINTER(ctypes.c_uint8)
c_char_p = ctypes.c_char_p


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                       capture_output=True, timeout=300)
        return os.path.exists(_SO)
    except Exception:
        return False


def get_lib() -> ctypes.CDLL | None:
    if _lib is not None:  # lock-free fast path only once fully initialized
        return _lib
    with _lib_lock:
        return _get_lib_locked()


def _get_lib_locked() -> ctypes.CDLL | None:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    if not os.path.exists(_SO) and not _build():
        _tried = True
        return None
    lib = ctypes.CDLL(_SO)
    lib.phi_gfa_parse.restype = c_p
    lib.phi_gfa_parse.argtypes = [c_char_p]
    lib.phi_gfa_error.restype = c_char_p
    lib.phi_gfa_error.argtypes = [c_p]
    for name in ("phi_gfa_n_vtx", "phi_gfa_n_edges", "phi_gfa_n_walks",
                 "phi_gfa_seq_len", "phi_gfa_walk_total"):
        getattr(lib, name).restype = c_i64
        getattr(lib, name).argtypes = [c_p]
    lib.phi_gfa_node_len.restype = c_i64p
    lib.phi_gfa_node_off.restype = c_i64p
    lib.phi_gfa_seq_code.restype = c_u8p
    lib.phi_gfa_edge_u.restype = c_i32p
    lib.phi_gfa_edge_v.restype = c_i32p
    lib.phi_gfa_walk_concat.restype = c_i32p
    lib.phi_gfa_walk_off.restype = c_i64p
    for name in ("phi_gfa_node_len", "phi_gfa_node_off", "phi_gfa_seq_code",
                 "phi_gfa_edge_u", "phi_gfa_edge_v", "phi_gfa_walk_concat",
                 "phi_gfa_walk_off"):
        getattr(lib, name).argtypes = [c_p]
    lib.phi_gfa_seg_names.restype = c_p
    lib.phi_gfa_seg_names.argtypes = [c_p, c_i64p]
    lib.phi_gfa_walk_names.restype = c_p
    lib.phi_gfa_walk_names.argtypes = [c_p, c_i64p]
    lib.phi_gfa_seg_tags.restype = c_p
    lib.phi_gfa_seg_tags.argtypes = [c_p, c_i64p]
    lib.phi_gfa_walk_meta.restype = c_p
    lib.phi_gfa_walk_meta.argtypes = [c_p, c_i64p]
    lib.phi_gfa_free.argtypes = [c_p]

    lib.phi_reads_load.restype = c_p
    lib.phi_reads_load.argtypes = [c_char_p]
    lib.phi_reads_error.restype = c_char_p
    lib.phi_reads_error.argtypes = [c_p]
    lib.phi_reads_count.restype = c_i64
    lib.phi_reads_count.argtypes = [c_p]
    lib.phi_reads_total.restype = c_i64
    lib.phi_reads_total.argtypes = [c_p]
    lib.phi_reads_codes.restype = c_u8p
    lib.phi_reads_codes.argtypes = [c_p]
    lib.phi_reads_off.restype = c_i64p
    lib.phi_reads_off.argtypes = [c_p]
    lib.phi_reads_names.restype = c_p
    lib.phi_reads_names.argtypes = [c_p, c_i64p]
    lib.phi_reads_free.argtypes = [c_p]

    lib.phi_toposort.restype = ctypes.c_int
    lib.phi_toposort.argtypes = [c_i64, c_i64, c_i32p, c_i32p, c_i32p]

    lib.phi_edit_distance.restype = c_i64
    lib.phi_edit_distance.argtypes = [c_u8p, c_i64, c_u8p, c_i64, c_i64]

    lib.phi_minimizers.restype = c_i64
    lib.phi_minimizers.argtypes = [c_u8p, c_i64, ctypes.c_int, ctypes.c_int,
                                   ctypes.POINTER(ctypes.c_uint32),
                                   ctypes.POINTER(ctypes.c_uint32),
                                   c_i32p, c_i64]

    lib.phi_set_threads.restype = None
    lib.phi_set_threads.argtypes = [ctypes.c_int]

    lib.phi_spectrum.restype = c_i64
    lib.phi_spectrum.argtypes = [c_u8p, c_i64p, c_i64, ctypes.c_int,
                                 ctypes.c_int,
                                 ctypes.POINTER(ctypes.c_uint64), c_i64]

    lib.phi_hap_join.restype = c_i64
    lib.phi_hap_join.argtypes = [c_u8p, c_i64, ctypes.c_int, ctypes.c_int,
                                 ctypes.POINTER(ctypes.c_uint64), c_i64,
                                 c_i64p, ctypes.c_int,
                                 c_i32p, c_i32p, c_i64, c_i64p]

    lib.phi_hap_join_walk.restype = c_i64
    lib.phi_hap_join_walk.argtypes = [c_u8p, c_i64p, c_i32p, c_i64,
                                      ctypes.c_int, ctypes.c_int,
                                      ctypes.POINTER(ctypes.c_uint64), c_i64,
                                      c_i64p, ctypes.c_int,
                                      c_i32p, c_i32p, c_i64, c_i64p]

    lib.phi_anchors.restype = c_p
    lib.phi_anchors.argtypes = [c_i64, c_i64, c_i32p, c_i32p, c_i64p,
                                c_i64p, ctypes.POINTER(c_i32p),
                                ctypes.POINTER(c_i32p), c_i64,
                                ctypes.c_int32, ctypes.c_double]
    for name in ("phi_anchors_n_occ", "phi_anchors_n_model_kmers",
                 "phi_anchors_filtered_kmers"):
        getattr(lib, name).restype = c_i64
        getattr(lib, name).argtypes = [c_p]
    for name in ("phi_anchors_occ_hap", "phi_anchors_occ_start",
                 "phi_anchors_occ_end", "phi_anchors_occ_kmer"):
        getattr(lib, name).restype = c_i32p
        getattr(lib, name).argtypes = [c_p]
    lib.phi_anchors_per_hap.restype = c_i64p
    lib.phi_anchors_per_hap.argtypes = [c_p]
    lib.phi_anchors_free.argtypes = [c_p]

    c_f32p = ctypes.POINTER(ctypes.c_float)
    lib.phi_build_sbw.restype = ctypes.c_int
    lib.phi_build_sbw.argtypes = [c_i32p, c_i32p, c_i32p, c_f32p, c_i64,
                                  c_i64, c_i64, c_i64, c_i64,
                                  c_f32p, c_f32p, c_f32p, c_i64p, c_i64p]

    lib.phi_solve_exact.restype = c_i64
    lib.phi_solve_exact.argtypes = [c_f32p, c_f32p, c_f32p, c_i64p, c_i64p,
                                    c_i32p, c_i32p, c_i32p, c_i64,
                                    c_i32p, c_i32p, ctypes.c_float,
                                    c_i64, c_i64, c_i64, c_i64, c_i64,
                                    c_f32p, c_f32p]

    u64p_t = ctypes.POINTER(ctypes.c_uint64)
    lib.phi_merge_upper.restype = None
    lib.phi_merge_upper.argtypes = [u64p_t, c_i64, u64p_t, c_i64, c_i64p]

    lib.phi_lane_csr.restype = None
    lib.phi_lane_csr.argtypes = [c_i64, c_i64, c_i32p, c_i32p, c_i64,
                                 c_i64p, c_i64p]
    lib.phi_walk_codes.restype = c_i64
    lib.phi_walk_codes.argtypes = [c_u8p, c_i64p, c_i32p, c_i64, c_u8p]
    _lib = lib
    _tried = True
    return _lib


def available() -> bool:
    return get_lib() is not None


# thread-count request (0 = auto): native pools read it via phi_set_threads,
# Python-side pools (hap join fan-out) read the module global
THREADS = 0


def set_threads(n: int) -> None:
    """Set every native/host pool size (the CLI's -t, main.cpp:53)."""
    global THREADS
    THREADS = max(0, int(n))
    lib = get_lib()
    if lib is not None:
        lib.phi_set_threads(THREADS)


def pool_threads(default_cap: int = 8) -> int:
    """Effective host pool size for Python-side thread fan-outs."""
    if THREADS > 0:
        return THREADS
    return min(default_cap, os.cpu_count() or 1)


_HUGE = 2 << 20  # x86-64 huge page
_MADV_HUGEPAGE = 14


def advise_hugepage(*arrays) -> None:
    """madvise(MADV_HUGEPAGE) the 2MB-aligned interior of large numpy
    buffers. This host's THP mode is madvise-only, and allocations past the
    malloc mmap threshold come as fresh 4 KiB-faulting mmaps — on a
    virtualized box the resulting fault storm costs 10-60x the compute
    (DESIGN.md "Host path engineering"). Huge pages cut the fault count
    512x. Best-effort no-op on failure or small arrays. THP defrag here is
    'madvise' (direct compaction at fault), so if a fragmented host ever
    stalls on compaction, PHI_TPU_NO_HUGEPAGE=1 disables the advice."""
    if os.environ.get("PHI_TPU_NO_HUGEPAGE") == "1":
        return
    try:
        libc = ctypes.CDLL(None, use_errno=True)
    except Exception:
        return
    for a in arrays:
        if a is None or a.nbytes < (8 << 20):
            continue
        addr = a.ctypes.data
        start = (addr + _HUGE - 1) & ~(_HUGE - 1)
        end = (addr + a.nbytes) & ~(_HUGE - 1)
        if end > start:
            try:
                libc.madvise(ctypes.c_void_p(start),
                             ctypes.c_size_t(end - start), _MADV_HUGEPAGE)
            except Exception:
                return


def _copy(ptr, n, dtype):
    if n == 0:
        return np.zeros(0, dtype)
    return np.ctypeslib.as_array(ptr, shape=(n,)).astype(dtype, copy=True)


def parse_gfa_native(path: str):
    """Returns GfaData via the native parser, or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    h = lib.phi_gfa_parse(path.encode())
    try:
        err = lib.phi_gfa_error(h)
        if err:
            raise ValueError(f"{path}: {err.decode()}")
        n = lib.phi_gfa_n_vtx(h)
        m = lib.phi_gfa_n_edges(h)
        nw = lib.phi_gfa_n_walks(h)
        slen = lib.phi_gfa_seq_len(h)
        wtot = lib.phi_gfa_walk_total(h)
        node_len = _copy(lib.phi_gfa_node_len(h), n, np.int64)
        node_off = _copy(lib.phi_gfa_node_off(h), n + 1, np.int64)
        seq_code = _copy(lib.phi_gfa_seq_code(h), slen, np.uint8)
        edge_u = _copy(lib.phi_gfa_edge_u(h), m, np.int32)
        edge_v = _copy(lib.phi_gfa_edge_v(h), m, np.int32)
        wconcat = _copy(lib.phi_gfa_walk_concat(h), wtot, np.int32)
        woff = _copy(lib.phi_gfa_walk_off(h), nw + 1, np.int64)
        ln = c_i64(0)
        sp = lib.phi_gfa_seg_names(h, ctypes.byref(ln))
        seg_names = ctypes.string_at(sp, ln.value).decode().split("\0")[:-1] if ln.value else []
        wp = lib.phi_gfa_walk_names(h, ctypes.byref(ln))
        walk_names = ctypes.string_at(wp, ln.value).decode().split("\0")[:-1] if ln.value else []
        tp = lib.phi_gfa_seg_tags(h, ctypes.byref(ln))
        seg_tags = ctypes.string_at(tp, ln.value).decode().split("\0")[:-1] if ln.value else []
        mp = lib.phi_gfa_walk_meta(h, ctypes.byref(ln))
        meta_raw = ctypes.string_at(mp, ln.value).decode().split("\0")[:-1] if ln.value else []
    finally:
        lib.phi_gfa_free(h)
    from phi_tpu.io.gfa import GfaData

    def _meta(s: str) -> tuple[str, int, int]:
        parts = s.split("\t")
        try:
            return parts[0], int(parts[1]), int(parts[2])
        except (IndexError, ValueError):
            return (parts[0] if parts else "_"), 0, 0
    walk_meta = [_meta(s) for s in meta_raw]
    # views into the single wconcat copy — per-walk copies would double the
    # 440 MB walk concat at chromosome scale
    walks = [wconcat[woff[i]:woff[i + 1]] for i in range(nw)]
    return GfaData(seg_names=seg_names, node_len=node_len, node_off=node_off,
                   seq_code=seq_code, edge_u=edge_u, edge_v=edge_v,
                   walks=walks, walk_names=walk_names,
                   seg_tags=seg_tags, walk_meta=walk_meta)


def load_reads_native(path: str):
    """Returns (codes_concat, offsets, names) or None."""
    lib = get_lib()
    if lib is None:
        return None
    h = lib.phi_reads_load(path.encode())
    try:
        err = lib.phi_reads_error(h)
        if err:
            raise ValueError(f"{path}: {err.decode()}")
        n = lib.phi_reads_count(h)
        tot = lib.phi_reads_total(h)
        codes = _copy(lib.phi_reads_codes(h), tot, np.uint8)
        off = _copy(lib.phi_reads_off(h), n + 1, np.int64)
        ln = c_i64(0)
        npt = lib.phi_reads_names(h, ctypes.byref(ln))
        names = ctypes.string_at(npt, ln.value).decode().split("\0")[:-1] if ln.value else []
    finally:
        lib.phi_reads_free(h)
    return codes, off, names


def toposort_native(n_vtx: int, edge_u: np.ndarray, edge_v: np.ndarray):
    lib = get_lib()
    if lib is None:
        return None
    order = np.zeros(n_vtx, np.int32)
    eu = np.ascontiguousarray(edge_u, np.int32)
    ev = np.ascontiguousarray(edge_v, np.int32)
    rc = lib.phi_toposort(
        n_vtx, len(eu),
        eu.ctypes.data_as(c_i32p), ev.ctypes.data_as(c_i32p),
        order.ctypes.data_as(c_i32p))
    if rc != 0:
        raise ValueError("graph has a cycle: topological order impossible "
                         "(PHI requires an acyclic graph)")
    return order


def minimizers_native(codes: np.ndarray, k: int, w: int):
    """(hi, lo, pos) minimizer stream via the C++ scan, or None if the
    library is unavailable. Bit-identical to sketch.minimizer semantics."""
    lib = get_lib()
    if lib is None:
        return None
    cc = np.ascontiguousarray(codes, np.uint8)
    n = len(cc)
    cap = max(1024, 4 * n // (w + 1) + 64)
    while True:
        hi = np.empty(cap, np.uint32)
        lo = np.empty(cap, np.uint32)
        pos = np.empty(cap, np.int32)
        cnt = lib.phi_minimizers(
            cc.ctypes.data_as(c_u8p), n, k, w,
            hi.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            lo.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            pos.ctypes.data_as(c_i32p), cap)
        if cnt <= cap:
            return hi[:cnt].copy(), lo[:cnt].copy(), pos[:cnt].copy()
        cap = int(cnt)


def spectrum_native(concat: np.ndarray, off: np.ndarray, k: int, w: int
                    ) -> np.ndarray | None:
    """Emitted canonical minimizer keys (uint64, duplicates included) of a
    ragged read concatenation, each read scanned independently — the host
    fast path for the read-spectrum phase. None if the library is missing."""
    lib = get_lib()
    if lib is None:
        return None
    cc = np.ascontiguousarray(concat, np.uint8)
    oo = np.ascontiguousarray(off, np.int64)
    n_reads = len(oo) - 1
    cap = max(1024, 4 * len(cc) // (w + 1) + 64)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    while True:
        out = np.empty(cap, np.uint64)
        cnt = lib.phi_spectrum(cc.ctypes.data_as(c_u8p),
                               oo.ctypes.data_as(c_i64p), n_reads, k, w,
                               out.ctypes.data_as(u64p), cap)
        if cnt < 0:
            return None
        if cnt <= cap:
            return out[:cnt].copy()
        cap = int(cnt)


def join_accel(sp_key: np.ndarray) -> tuple[np.ndarray, int]:
    """(bucket_off, prefix_bits) first-probe table over sorted uint64 keys:
    bucket_off[b] = first index whose top prefix_bits equal b. Build once
    per spectrum, share across haplotype joins."""
    n = len(sp_key)
    # ~1 key per bucket: table memory ~= the key array it accelerates
    prefix_bits = max(1, min(26, int(np.log2(max(n, 2)))))
    edges = (np.arange((1 << prefix_bits) + 1, dtype=np.uint64)
             << np.uint64(64 - prefix_bits))
    edges[-1] = np.uint64(0xFFFFFFFFFFFFFFFF)
    off = np.searchsorted(sp_key, edges, side="left").astype(np.int64)
    off[-1] = n  # top edge is inclusive of the all-ones key
    return off, prefix_bits


def hap_join_native(codes: np.ndarray, k: int, w: int, sp_key: np.ndarray,
                    accel: tuple[np.ndarray, int] | None = None
                    ) -> tuple[int, np.ndarray, np.ndarray] | None:
    """(n_minimizers, hit_positions, hit_spectrum_ids) of one sequence
    joined against sorted uint64 spectrum keys, or None. Releases the GIL
    for the whole scan, so callers thread across haplotypes. Pass a shared
    join_accel(sp_key) to skip the per-emission full binary search."""
    lib = get_lib()
    if lib is None:
        return None
    cc = np.ascontiguousarray(codes, np.uint8)
    kk = np.ascontiguousarray(sp_key, np.uint64)
    n = len(cc)
    cap = max(1024, 4 * n // (w + 1) + 64)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    n_min = c_i64(0)
    if accel is not None:
        off_arr, prefix_bits = accel
        off_ptr = np.ascontiguousarray(off_arr, np.int64).ctypes.data_as(c_i64p)
    else:
        off_ptr, prefix_bits = None, 0
    while True:
        pos = np.empty(cap, np.int32)
        sid = np.empty(cap, np.int32)
        cnt = lib.phi_hap_join(
            cc.ctypes.data_as(c_u8p), n, k, w,
            kk.ctypes.data_as(u64p), len(kk), off_ptr, prefix_bits,
            pos.ctypes.data_as(c_i32p), sid.ctypes.data_as(c_i32p), cap,
            ctypes.byref(n_min))
        if cnt < 0:
            return None
        if cnt <= cap:
            return int(n_min.value), pos[:cnt].copy(), sid[:cnt].copy()
        cap = int(cnt)


def hap_join_walk_native(seq_code: np.ndarray, node_off: np.ndarray,
                         walk: np.ndarray, walk_bases: int, k: int, w: int,
                         sp_key: np.ndarray,
                         accel: tuple[np.ndarray, int] | None = None
                         ) -> tuple[int, np.ndarray, np.ndarray] | None:
    """hap_join_native streaming the walk straight from graph tensors (no
    materialized concatenation). walk_bases sizes the retry capacity."""
    lib = get_lib()
    if lib is None:
        return None
    sc = np.ascontiguousarray(seq_code, np.uint8)
    no = np.ascontiguousarray(node_off, np.int64)
    wk = np.ascontiguousarray(walk, np.int32)
    kk = np.ascontiguousarray(sp_key, np.uint64)
    cap = max(1024, 4 * walk_bases // (w + 1) + 64)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    n_min = c_i64(0)
    if accel is not None:
        off_arr, prefix_bits = accel
        off_c = np.ascontiguousarray(off_arr, np.int64)
        off_ptr = off_c.ctypes.data_as(c_i64p)
    else:
        off_ptr, prefix_bits = None, 0
    while True:
        pos = np.empty(cap, np.int32)
        sid = np.empty(cap, np.int32)
        cnt = lib.phi_hap_join_walk(
            sc.ctypes.data_as(c_u8p), no.ctypes.data_as(c_i64p),
            wk.ctypes.data_as(c_i32p), len(wk), k, w,
            kk.ctypes.data_as(u64p), len(kk), off_ptr, prefix_bits,
            pos.ctypes.data_as(c_i32p), sid.ctypes.data_as(c_i32p), cap,
            ctypes.byref(n_min))
        if cnt < 0:
            return None
        if cnt <= cap:
            return int(n_min.value), pos[:cnt].copy(), sid[:cnt].copy()
        cap = int(cnt)


def anchors_native(graph, k: int,
                   hits: list[tuple[int, np.ndarray, np.ndarray]],
                   spectrum_size: int, threshold: float):
    """Native anchor-table construction: returns (occ_hap, occ_start,
    occ_end, occ_kmer, n_model_kmers, filtered_kmers, per_hap_anchors) or
    None. Hits are handed over as PER-HAP pointers (no concatenation — at
    chromosome scale that copy dominated the phase); the native pass 1
    verifies ascending positions itself and returns null on violation,
    which falls back to the order-independent numpy path."""
    lib = get_lib()
    if lib is None:
        return None
    H = graph.num_walks
    hit_cnt = np.zeros(max(H, 1), np.int64)
    # per-hap contiguous int32 views (no-op when the join already emits
    # int32, which it does; keep references alive across the call)
    pos_arrs, sid_arrs = [], []
    for h in range(H):
        hit_cnt[h] = len(hits[h][1])
        pos_arrs.append(np.ascontiguousarray(hits[h][1], np.int32))
        sid_arrs.append(np.ascontiguousarray(hits[h][2], np.int32))
    empty = np.zeros(1, np.int32)
    pos_ptrs = (c_i32p * max(H, 1))(*[
        (a if len(a) else empty).ctypes.data_as(c_i32p) for a in pos_arrs
    ] or [empty.ctypes.data_as(c_i32p)])
    sid_ptrs = (c_i32p * max(H, 1))(*[
        (a if len(a) else empty).ctypes.data_as(c_i32p) for a in sid_arrs
    ] or [empty.ctypes.data_as(c_i32p)])
    wm = np.ascontiguousarray(graph.walk_mat, np.int32)
    wl = np.ascontiguousarray(graph.walk_len, np.int32)
    nl = np.ascontiguousarray(graph.gfa.node_len, np.int64)
    hp = lib.phi_anchors(
        H, graph.walk_mat.shape[1] if H else 0,
        wm.ctypes.data_as(c_i32p), wl.ctypes.data_as(c_i32p),
        nl.ctypes.data_as(c_i64p),
        hit_cnt.ctypes.data_as(c_i64p), pos_ptrs, sid_ptrs,
        spectrum_size, k, threshold)
    if not hp:
        return None
    try:
        n_occ = lib.phi_anchors_n_occ(hp)
        occ_hap = _copy(lib.phi_anchors_occ_hap(hp), n_occ, np.int32)
        occ_start = _copy(lib.phi_anchors_occ_start(hp), n_occ, np.int32)
        occ_end = _copy(lib.phi_anchors_occ_end(hp), n_occ, np.int32)
        occ_kmer = _copy(lib.phi_anchors_occ_kmer(hp), n_occ, np.int32)
        n_model = int(lib.phi_anchors_n_model_kmers(hp))
        filtered = int(lib.phi_anchors_filtered_kmers(hp))
        per_hap = _copy(lib.phi_anchors_per_hap(hp), H, np.int64)
    finally:
        lib.phi_anchors_free(hp)
    return occ_hap, occ_start, occ_end, occ_kmer, n_model, filtered, per_hap


def build_sbw_native(occ_hap: np.ndarray, occ_start: np.ndarray,
                     occ_end: np.ndarray, occ_weight: np.ndarray,
                     H: int, P: int, L: int, H_real: int | None = None,
                     with_ranges: bool = False):
    """(S [H,P], B [H,P], W [L,H,P]) float32 padded solver planes built by
    the threaded native scatter+cumsum, or None if the library is missing.
    Rows >= H_real stay zero (padding lanes). with_ranges=True appends the
    per-(layer,lane) touched column ranges (w_lo, w_hi) — W is exactly zero
    outside them (the native solver's W-read skip)."""
    lib = get_lib()
    if lib is None:
        return None
    oh = np.ascontiguousarray(occ_hap, np.int32)
    os_ = np.ascontiguousarray(occ_start, np.int32)
    oe = np.ascontiguousarray(occ_end, np.int32)
    ow = np.ascontiguousarray(occ_weight, np.float32)
    # np.zeros = calloc: untouched regions stay shared zero pages — the
    # builder relies on this (no memset) and skips them entirely
    S = np.zeros((H, P), np.float32)
    B = np.zeros((H, P), np.float32)
    W = np.zeros((L, H, P), np.float32)
    advise_hugepage(S, B, W)
    w_lo = np.empty((max(L, 1), H), np.int64)
    w_hi = np.empty((max(L, 1), H), np.int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    rc = lib.phi_build_sbw(
        oh.ctypes.data_as(c_i32p), os_.ctypes.data_as(c_i32p),
        oe.ctypes.data_as(c_i32p), ow.ctypes.data_as(f32p),
        len(oh), H, P, L,
        H if H_real is None else H_real,
        S.ctypes.data_as(f32p), B.ctypes.data_as(f32p),
        W.ctypes.data_as(f32p),
        w_lo.ctypes.data_as(c_i64p),
        w_hi.ctypes.data_as(c_i64p))
    if rc != 0:
        return None
    if with_ranges:
        return S, B, W, w_lo, w_hi
    return S, B, W


def solve_exact_native(S: np.ndarray, B: np.ndarray, W: np.ndarray,
                       w_lo: np.ndarray, w_hi: np.ndarray,
                       esrc_h: np.ndarray, esrc_p: np.ndarray,
                       esrc_target: np.ndarray, state_vertex: np.ndarray,
                       walk_len: np.ndarray, R: float, n_vtx: int,
                       max_sweeps: int):
    """(M [H,P], ends [H], n_sweeps) — the native exact-credit fixpoint,
    bit-identical to solve.dp._solve_exact_jit, or None if the library is
    missing."""
    lib = get_lib()
    if lib is None:
        return None
    H, P = state_vertex.shape
    L = W.shape[0]
    f32p = ctypes.POINTER(ctypes.c_float)
    Sa = np.ascontiguousarray(S, np.float32)
    Ba = np.ascontiguousarray(B, np.float32)
    Wa = np.ascontiguousarray(W, np.float32)
    lo = np.ascontiguousarray(w_lo, np.int64)
    hi = np.ascontiguousarray(w_hi, np.int64)
    eh = np.ascontiguousarray(esrc_h, np.int32)
    ep = np.ascontiguousarray(esrc_p, np.int32)
    et = np.ascontiguousarray(esrc_target, np.int32)
    sv = np.ascontiguousarray(state_vertex, np.int32)
    wl = np.ascontiguousarray(walk_len, np.int32)
    M = np.empty((H, P), np.float32)
    ends = np.empty(H, np.float32)
    sweeps = lib.phi_solve_exact(
        Sa.ctypes.data_as(f32p), Ba.ctypes.data_as(f32p),
        Wa.ctypes.data_as(f32p), lo.ctypes.data_as(c_i64p),
        hi.ctypes.data_as(c_i64p), eh.ctypes.data_as(c_i32p),
        ep.ctypes.data_as(c_i32p), et.ctypes.data_as(c_i32p), len(eh),
        sv.ctypes.data_as(c_i32p), wl.ctypes.data_as(c_i32p),
        ctypes.c_float(R), n_vtx, H, P, L, max_sweeps,
        M.ctypes.data_as(f32p), ends.ctypes.data_as(f32p))
    if sweeps < 0:
        return None
    return M, ends, int(sweeps)


def merge_upper_native(sorted_keys: np.ndarray, sorted_queries: np.ndarray
                       ) -> np.ndarray | None:
    """searchsorted(sorted_keys, sorted_queries, side='right') as an O(n+m)
    two-pointer merge (queries must be ascending), or None."""
    lib = get_lib()
    if lib is None:
        return None
    kk = np.ascontiguousarray(sorted_keys, np.uint64)
    qq = np.ascontiguousarray(sorted_queries, np.uint64)
    out = np.empty(len(qq), np.int64)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.phi_merge_upper(kk.ctypes.data_as(u64p), len(kk),
                        qq.ctypes.data_as(u64p), len(qq),
                        out.ctypes.data_as(c_i64p))
    return out


def lane_csr_native(walk_mat: np.ndarray, walk_len: np.ndarray,
                    n_vtx: int):
    """(off, values) of the vertex -> flat-lane-state CSR, or None."""
    lib = get_lib()
    if lib is None:
        return None
    H, P = walk_mat.shape
    wm = np.ascontiguousarray(walk_mat, np.int32)
    wl = np.ascontiguousarray(walk_len, np.int32)
    total = int(wl.sum())
    off = np.zeros(n_vtx + 1, np.int64)
    values = np.empty(total, np.int64)
    advise_hugepage(values)
    lib.phi_lane_csr(H, P, wm.ctypes.data_as(c_i32p),
                     wl.ctypes.data_as(c_i32p), n_vtx,
                     off.ctypes.data_as(c_i64p),
                     values.ctypes.data_as(c_i64p))
    return off, values


def walk_codes_native(seq_code: np.ndarray, node_off: np.ndarray,
                      walk: np.ndarray) -> np.ndarray | None:
    """Concatenated base codes of one walk, or None."""
    lib = get_lib()
    if lib is None:
        return None
    sc = np.ascontiguousarray(seq_code, np.uint8)
    no = np.ascontiguousarray(node_off, np.int64)
    wk = np.ascontiguousarray(walk, np.int32)
    total = int((no[wk + 1] - no[wk]).sum())
    out = np.empty(total, np.uint8)
    n = lib.phi_walk_codes(sc.ctypes.data_as(c_u8p),
                           no.ctypes.data_as(c_i64p),
                           wk.ctypes.data_as(c_i32p), len(wk),
                           out.ctypes.data_as(c_u8p))
    return out[:n]


def edit_distance(a: np.ndarray | str, b: np.ndarray | str,
                  k_limit: int = -1) -> int:
    """Banded Myers bit-parallel edit distance (native); falls back to a
    numpy Wagner-Fischer for small inputs when the library is missing."""
    from phi_tpu.io.gfa import encode_seq
    if isinstance(a, str):
        a = encode_seq(a)
    if isinstance(b, str):
        b = encode_seq(b)
    lib = get_lib()
    if lib is not None:
        aa = np.ascontiguousarray(a, np.uint8)
        bb = np.ascontiguousarray(b, np.uint8)
        return int(lib.phi_edit_distance(
            aa.ctypes.data_as(c_u8p), len(aa),
            bb.ctypes.data_as(c_u8p), len(bb), k_limit))
    return _edit_distance_np(a, b)


def _edit_distance_np(a: np.ndarray, b: np.ndarray) -> int:
    if len(a) * len(b) > 64_000_000:
        raise RuntimeError("pure-python edit distance only for small inputs; "
                           "build native/libphi_native.so")
    n = len(b)
    j = np.arange(n + 1, dtype=np.int32)
    prev = j.copy()
    for i in range(len(a)):
        cur = np.empty_like(prev)
        cur[0] = i + 1
        np.minimum(prev[:-1] + (b != a[i]), prev[1:] + 1, out=cur[1:])
        # insertion chain cur[j] = min(cur[j], cur[j-1]+1), left to right:
        cur = np.minimum.accumulate(cur - j) + j
        prev = cur
    return int(prev[-1])
