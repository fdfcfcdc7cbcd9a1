"""Native library parity tests (skipped if the toolchain can't build it)."""

import numpy as np
import pytest

from phi_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")

TOY = "/root/reference/test/test.gfa"


def test_native_gfa_matches_python():
    from phi_tpu.io.gfa import _read_gfa_py
    gn = native.parse_gfa_native(TOY)
    gp = _read_gfa_py(TOY)
    assert gn.seg_names == gp.seg_names
    assert np.array_equal(gn.node_len, gp.node_len)
    assert np.array_equal(gn.seq_code, gp.seq_code)
    assert np.array_equal(gn.edge_u, gp.edge_u)
    assert np.array_equal(gn.edge_v, gp.edge_v)
    assert gn.walk_names == gp.walk_names
    assert all(np.array_equal(a, b) for a, b in zip(gn.walks, gp.walks))


def test_native_reads_matches_python(tmp_path):
    fq = tmp_path / "r.fq"
    fq.write_text("@r1 comment\nACGTNAC\n+\nIIIIIII\n@r2\nGGGG\n+\nIIII\n")
    codes, off, names = native.load_reads_native(str(fq))
    assert names == ["r1", "r2"]
    assert off.tolist() == [0, 7, 11]
    from phi_tpu.io.gfa import encode_seq
    assert np.array_equal(codes[:7], encode_seq("ACGTNAC"))
    assert np.array_equal(codes[7:], encode_seq("GGGG"))


def test_native_fasta_multiline(tmp_path):
    fa = tmp_path / "r.fa"
    fa.write_text(">a desc\nACGT\nTTAA\n>b\nCC\n")
    codes, off, names = native.load_reads_native(str(fa))
    assert names == ["a", "b"]
    assert off.tolist() == [0, 8, 10]


def test_edit_distance_basic():
    assert native.edit_distance("ACGT", "ACGT") == 0
    assert native.edit_distance("ACGT", "ACTT") == 1
    assert native.edit_distance("ACGT", "") == 4
    assert native.edit_distance("", "ACGT") == 4
    assert native.edit_distance("AAAA", "TTTT") == 4
    assert native.edit_distance("ACGTACGT", "CGTACGTA") == 2


def test_edit_distance_fuzz_vs_numpy():
    import random
    rng = random.Random(99)
    from phi_tpu.io.gfa import encode_seq
    for _ in range(25):
        n = rng.randint(0, 250)
        a = "".join(rng.choice("ACGT") for _ in range(n))
        bl = list(a)
        for _ in range(rng.randint(0, 40)):
            op = rng.random()
            pos = rng.randrange(max(1, len(bl)))
            if op < 0.4 and bl:
                bl[pos % len(bl)] = rng.choice("ACGT")
            elif op < 0.7:
                bl.insert(pos, rng.choice("ACGT"))
            elif bl:
                del bl[pos % len(bl)]
        b = "".join(bl)
        assert native.edit_distance(a, b) == native._edit_distance_np(
            encode_seq(a), encode_seq(b))


def test_toposort_native():
    eu = np.array([0, 0, 1, 2], np.int32)
    ev = np.array([1, 2, 3, 3], np.int32)
    order = native.toposort_native(4, eu, ev)
    rank = np.zeros(4, np.int64)
    rank[order] = np.arange(4)
    assert (rank[eu] < rank[ev]).all()
    with pytest.raises(ValueError, match="cycle"):
        native.toposort_native(2, np.array([0, 1], np.int32),
                               np.array([1, 0], np.int32))


def test_native_gfa_matches_python_mhc4():
    """Full-scale parity on the real 111,805-segment MHC graph."""
    from phi_tpu.io.gfa import _read_gfa_py
    path = "/root/reference/test/MHC_4.gfa.gz"
    gn = native.parse_gfa_native(path)
    gp = _read_gfa_py(path)
    assert gn.seg_names == gp.seg_names
    assert np.array_equal(gn.node_len, gp.node_len)
    assert np.array_equal(gn.seq_code, gp.seq_code)
    assert np.array_equal(gn.edge_u, gp.edge_u)
    assert np.array_equal(gn.edge_v, gp.edge_v)
    assert gn.walk_names == gp.walk_names
    assert all(np.array_equal(a, b) for a, b in zip(gn.walks, gp.walks))


def test_native_anchor_tables_parity():
    """Native single-pass anchors == numpy reference path, at a scale with
    multi-node spans, zero-length nodes, and filterable repeats."""
    import random

    from phi_tpu.anchors.join import (_anchor_tables_from_hits_py,
                                      anchor_tables_from_hits,
                                      build_anchor_tables, sketch_haplotypes)
    from phi_tpu.graph import tensorize
    from phi_tpu.io.build import build_gfa_data
    from phi_tpu.io.gfa import encode_seq
    from phi_tpu.native import anchors_native
    from phi_tpu.sketch.minimizer import sketch_read_batch

    rng = random.Random(11)
    bases = "ACGT"
    segments, walks_segs = {}, [[] for _ in range(5)]
    sid = 0
    for b in range(60):
        # repeat-heavy anchors (triggers the threshold filter) + tiny nodes
        seq = ("ACGTACGT" if b % 7 == 0 else
               "".join(rng.choice(bases) for _ in range(rng.randint(1, 9))))
        name = f"s{sid}"; sid += 1
        segments[name] = seq
        for h in range(5):
            walks_segs[h].append(name)
        if b % 3 == 0:
            alleles = []
            for a in range(2):
                name = f"s{sid}"; sid += 1
                # include empty (deletion) alleles: zero-length nodes
                segments[name] = "" if a == 0 and b % 6 == 0 else \
                    "".join(rng.choice(bases) for _ in range(rng.randint(1, 4)))
                alleles.append(name)
            for h in range(5):
                walks_segs[h].append(alleles[rng.randrange(2)])
    graph = tensorize(build_gfa_data(
        segments, [(f"hap{h}.0", walks_segs[h]) for h in range(5)]))

    k, w = 6, 3
    read = "".join(segments[s] for s in walks_segs[2])
    codes = np.full((1, len(read)), 4, np.uint8)
    codes[0] = encode_seq(read)
    spectrum = sketch_read_batch(codes, k, w,
                                 np.array([len(read)], np.int32))
    sketches = sketch_haplotypes(graph, k, w)
    anchors = build_anchor_tables(graph, k, sketches, spectrum, 0.5)

    # reconstruct per-hap hits the way the pipeline produces them
    from phi_tpu.sketch.encode import combine64
    sp_key = combine64(*spectrum)
    hits = []
    for h in range(5):
        hi, lo, pos = sketches[h]
        key = combine64(hi, lo)
        idx = np.searchsorted(sp_key, key)
        idx_c = np.minimum(idx, len(sp_key) - 1)
        m = sp_key[idx_c] == key
        hits.append((len(hi), pos[m].astype(np.int32), idx[m].astype(np.int32)))

    py = _anchor_tables_from_hits_py(graph, k, hits, len(sp_key), 0.5)
    nat = anchors_native(graph, k, hits, len(sp_key), 0.5)
    assert nat is not None, "native library unavailable"
    occ_hap, occ_start, occ_end, occ_kmer, n_model, filtered, per_hap = nat
    assert filtered == py.filtered_kmers
    assert n_model == py.n_model_kmers
    assert np.array_equal(per_hap, py.per_hap_anchors)
    assert np.array_equal(occ_hap, py.occ_hap)
    assert np.array_equal(occ_start, py.occ_start)
    assert np.array_equal(occ_end, py.occ_end)
    assert np.array_equal(occ_kmer, py.occ_kmer)
    assert py.filtered_kmers > 0  # the filter actually fired in this instance


def test_native_lane_csr_and_walk_codes_parity():
    from phi_tpu.graph.pangenome import build_csr
    from phi_tpu.io.gfa import read_gfa
    from phi_tpu.native import lane_csr_native, walk_codes_native
    g = read_gfa("/root/reference/test/test.gfa")
    from phi_tpu.graph import tensorize
    G = tensorize(g)
    # CSR parity vs the numpy stable-argsort construction
    hh, pp = np.nonzero(G.walk_mat >= 0)
    flat = (hh * G.P + pp).astype(np.int64)
    ref = build_csr(G.walk_mat[hh, pp].astype(np.int64), flat, G.n_vtx)
    off, values = lane_csr_native(G.walk_mat, G.walk_len, G.n_vtx)
    assert np.array_equal(off, ref.off)
    assert np.array_equal(values, ref.values)
    # walk codes parity vs the slice-concat path
    for h in range(G.num_walks):
        walk = G.walk_mat[h, :G.walk_len[h]]
        nat = walk_codes_native(g.seq_code, g.node_off, walk)
        ref_codes = np.concatenate(
            [g.seq_code[g.node_off[v]:g.node_off[v + 1]] for v in walk])
        assert np.array_equal(nat, ref_codes)


def test_native_spectrum_matches_xla_concat():
    """phi_spectrum (per-read C++ scan) vs the chunked XLA masked-concat
    path: identical unique spectra on reads with Ns and short reads."""
    from phi_tpu.sketch.minimizer import _concat_emissions
    rng = np.random.default_rng(7)
    lens = rng.integers(5, 300, 200)
    concat = rng.integers(0, 4, lens.sum()).astype(np.uint8)
    concat[rng.random(len(concat)) < 0.03] = 4  # Ns
    off = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=off[1:])
    for k, w in ((7, 5), (15, 11), (31, 25)):
        keys = native.spectrum_native(concat, off, k, w)
        assert keys is not None
        want = np.unique(_concat_emissions(concat, off, k, w))
        assert np.array_equal(np.unique(keys), want)


def test_native_hap_join_matches_host_join():
    """phi_hap_join (scan + binary search in C++) vs the numpy
    sketch+searchsorted join: same minimizer count, positions, ids."""
    from phi_tpu.sketch.minimizer import sketch_sequence
    rng = np.random.default_rng(11)
    k, w = 9, 7
    seq = rng.integers(0, 4, 20_000).astype(np.uint8)
    seq[rng.random(len(seq)) < 0.01] = 4
    # spectrum: half real minimizers of a related sequence, half noise
    other = seq.copy()
    other[rng.random(len(other)) < 0.05] = rng.integers(0, 4)
    hi, lo, _ = sketch_sequence(other, k, w)
    keys = np.unique((hi.astype(np.uint64) << np.uint64(32))
                     | lo.astype(np.uint64))
    got = native.hap_join_native(seq, k, w, keys)
    assert got is not None
    n_min, pos, sid = got
    ghi, glo, gpos = sketch_sequence(seq, k, w)
    gkey = (ghi.astype(np.uint64) << np.uint64(32)) | glo.astype(np.uint64)
    idx = np.searchsorted(keys, gkey)
    idx_c = np.minimum(idx, len(keys) - 1)
    hit = keys[idx_c] == gkey
    assert n_min == len(ghi)
    assert np.array_equal(pos, gpos[hit])
    assert np.array_equal(sid, idx[hit].astype(np.int32))
    assert hit.sum() > 100  # nontrivial overlap


def test_native_sbw_build_matches_host():
    """phi_build_sbw vs credit_arrays_from_occ + straddle_layers_from_occ,
    including zero-page regions (untouched rows/layers must be exact 0)."""
    from phi_tpu.anchors.join import credit_arrays_from_occ
    from phi_tpu.solve.prep import straddle_layers_from_occ
    rng = np.random.default_rng(3)
    N, H, P, L, H_real = 20_000, 8, 2048, 8, 5
    oh = rng.integers(0, H_real, N).astype(np.int32)
    os_ = rng.integers(0, P - 40, N).astype(np.int32)
    oe = (os_ + rng.integers(1, 9, N)).astype(np.int32)
    ow = rng.random(N).astype(np.float32)
    got = native.build_sbw_native(oh, os_, oe, ow, H, P, L, H_real)
    assert got is not None
    S, B, W = got
    S2, B2 = credit_arrays_from_occ(oh, os_, oe, ow, H, P)
    W2 = straddle_layers_from_occ(oh, os_, oe, ow, H, P, L)
    assert np.allclose(S, S2, atol=1e-3)
    assert np.allclose(B, B2, atol=1e-3)
    assert np.allclose(W, W2, atol=1e-3)
    assert (S[H_real:] == 0).all() and (W[:, H_real:] == 0).all()


def test_join_accel_parity():
    """First-probe prefix table gives identical join results, including the
    all-ones sentinel key edge case."""
    from phi_tpu.native import hap_join_native, join_accel
    rng = np.random.default_rng(9)
    k, w = 9, 5
    seq = rng.integers(0, 4, 100_000).astype(np.uint8)
    other = seq.copy()
    other[rng.random(len(other)) < 0.05] = 2
    from phi_tpu.sketch.minimizer import sketch_sequence
    hi, lo, _ = sketch_sequence(other, k, w)
    keys = np.unique(np.concatenate([
        (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64),
        np.array([0, 0xFFFFFFFFFFFFFFFF], np.uint64)]))
    acc = join_accel(keys)
    a = hap_join_native(seq, k, w, keys)
    b = hap_join_native(seq, k, w, keys, acc)
    assert a[0] == b[0]
    assert np.array_equal(a[1], b[1]) and np.array_equal(a[2], b[2])


def test_native_solver_parity():
    """phi_solve_exact vs the XLA exact fixpoint: bit-identical M, ends,
    and sweep count on the ladder instance and random mosaics."""
    import jax.numpy as jnp

    from phi_tpu.native import build_sbw_native, solve_exact_native
    from phi_tpu.solve.dp import _bucketed_args, _solve_exact_jit
    from phi_tpu.solve.dp import solve_dp
    import tests.test_solver as ts

    import random

    def _random_tables():
        graph, read = ts._random_instance(random.Random(5), n_blocks=6,
                                          n_haps=4)
        tabs = ts._full_solve(graph, [read], 4, 2, 0.5)[1]
        return tabs

    for mk in (lambda: ts._ladder_instance(R=0.3)[2], _random_tables):
        t = mk()
        assert t.n_layers is not None
        H, P = t.state_vertex.shape
        built = build_sbw_native(t.occ_hap, t.occ_start, t.occ_end,
                                 t.occ_weight, H, P, t.n_layers,
                                 with_ranges=True)
        S, B, W, lo, hi = built
        M_n, ends_n, sweeps_n = solve_exact_native(
            S, B, W, lo, hi, t.esrc_h, t.esrc_p, t.esrc_target,
            t.state_vertex, t.walk_len, t.R, t.n_vtx, 256)
        # reference: the XLA program on the same (unpadded via bucket) args
        (S_d, B_d, W_d), common, (H0, P0), statics = _bucketed_args(t, 256)
        M_x, ends_x, sweeps_x, _ = _solve_exact_jit(S_d, B_d, W_d, *common,
                                                    **statics)
        M_x = np.asarray(M_x)[:H, :P]
        ends_x = np.asarray(ends_x)[:H]
        assert int(sweeps_x) == sweeps_n
        fin = np.isfinite(M_x) | np.isfinite(M_n)
        assert np.array_equal(M_x[fin], M_n[fin])
        fe = np.isfinite(ends_x) | np.isfinite(ends_n)
        assert np.array_equal(ends_x[fe], ends_n[fe])
        # and solve_dp routes through the native path on CPU with the same
        # answer end to end
        M2, ends2, sw2, lb2 = solve_dp(t, 256)
        assert np.array_equal(np.asarray(M2)[fin], M_n[fin])

        # streaming-W solver (chromosome-scale mode): bit-identical to the
        # materialized-W program on the same device args
        from phi_tpu.solve.dp import _pad1, _solve_exact_stream, \
            bucket_size
        import jax.numpy as jnp
        Hb, Pb = S_d.shape
        Nb = bucket_size(max(len(t.occ_hap), 1), 1024)
        oh = jnp.asarray(_pad1(t.occ_hap.astype(np.int8), Nb, 0))
        os_ = jnp.asarray(_pad1(t.occ_start.astype(np.int32), Nb, 0))
        osp = jnp.asarray(_pad1((t.occ_end - t.occ_start).astype(np.uint8),
                                Nb, 0))
        ow = jnp.asarray(_pad1(t.occ_weight.astype(np.float32), Nb, 0.0))
        M_s, ends_s, sweeps_s = _solve_exact_stream(
            S_d, B_d, oh, os_, osp, ow, *common,
            n_vtx=statics["n_vtx"], max_sweeps=statics["max_sweeps"],
            L=t.n_layers)
        M_s = np.asarray(M_s)[:H, :P]
        assert int(sweeps_s) == sweeps_n
        assert np.array_equal(M_s[fin], M_n[fin])


def test_hap_join_walk_matches_concat():
    """Walk-streaming hap join == join over the materialized concatenation,
    including walks whose nodes contain Ns and zero-length nodes."""
    from phi_tpu.native import (hap_join_native, hap_join_walk_native,
                                join_accel)
    from phi_tpu.sketch.minimizer import sketch_sequence
    rng = np.random.default_rng(21)
    # synthetic graph arrays: 200 nodes of length 0..40 incl Ns
    lens = rng.integers(0, 40, 200)
    node_off = np.zeros(201, np.int64)
    np.cumsum(lens, out=node_off[1:])
    seq_code = rng.integers(0, 4, node_off[-1]).astype(np.uint8)
    seq_code[rng.random(len(seq_code)) < 0.02] = 4
    walk = rng.integers(0, 200, 150).astype(np.int32)
    concat = np.concatenate([seq_code[node_off[v]:node_off[v + 1]]
                             for v in walk]) if len(walk) else \
        np.zeros(0, np.uint8)
    k, w = 11, 7
    other = concat.copy()
    other[rng.random(len(other)) < 0.1] = 1
    hi, lo, _ = sketch_sequence(other, k, w)
    keys = np.unique((hi.astype(np.uint64) << np.uint64(32))
                     | lo.astype(np.uint64))
    a = hap_join_native(concat, k, w, keys)
    b = hap_join_walk_native(seq_code, node_off, walk, len(concat), k, w,
                             keys)
    assert a[0] == b[0]
    assert np.array_equal(a[1], b[1]) and np.array_equal(a[2], b[2])
    acc = join_accel(keys)
    c = hap_join_walk_native(seq_code, node_off, walk, len(concat), k, w,
                             keys, acc)
    assert np.array_equal(a[1], c[1]) and np.array_equal(a[2], c[2])


def test_native_anchors_rejects_unsorted_hits():
    """Pass 1 verifies ascending hit positions itself (the old wrapper
    precheck moved into C++): shuffled positions must return None so the
    caller falls back to the order-independent numpy path."""
    from phi_tpu.native import anchors_native
    from phi_tpu.testing import tiny_instance

    graph, codes, lengths, spectrum, anchors, tables = tiny_instance()
    # descending positions in one hap
    hits = [(5, np.array([9, 3, 1], np.int32), np.array([0, 1, 2], np.int32)),
            (5, np.array([0, 2], np.int32), np.array([0, 1], np.int32))]
    assert anchors_native(graph, 4, hits, 3, 1.0) is None


def test_native_anchors_empty_and_single_hap():
    """Degenerate shapes: zero hits everywhere, and a single-hap graph."""
    from phi_tpu.anchors.join import _anchor_tables_from_hits_py
    from phi_tpu.native import anchors_native
    from phi_tpu.testing import tiny_instance

    graph, *_ = tiny_instance()
    hits = [(0, np.zeros(0, np.int32), np.zeros(0, np.int32))
            for _ in range(graph.num_walks)]
    nat = anchors_native(graph, 4, hits, 7, 1.0)
    assert nat is not None
    occ_hap, occ_start, occ_end, occ_kmer, n_model, filtered, per_hap = nat
    py = _anchor_tables_from_hits_py(graph, 4, hits, 7, 1.0)
    assert len(occ_hap) == len(py.occ_hap) == 0
    assert n_model == py.n_model_kmers == 0
    assert filtered == py.filtered_kmers == 0
    assert np.array_equal(per_hap, py.per_hap_anchors)
