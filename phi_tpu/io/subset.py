"""Progressive-panel subsetting: derive an N-haplotype graph from a larger
one, the reference's chop_graph.sh:37-69 workflow (vg gbwt ignore-lists +
gfa2gbwt rebuild) done natively. Kept walks define the subgraph: a segment
survives iff some kept walk visits it, an edge iff some kept walk traverses
it — exactly what a GBWT rebuilt from the kept haplotypes encodes. Used by
the increasing.csv-style scaling sweep (data/plots/increasing.csv axes)."""

from __future__ import annotations

import sys

import numpy as np

from phi_tpu.io.gfa import GfaData, read_gfa, write_gfa


def subset_panel(g: GfaData, keep: list[int]) -> GfaData:
    """GfaData restricted to the walks in `keep` (indices, order preserved)."""
    for i in keep:
        if not 0 <= i < len(g.walks):
            raise ValueError(f"walk index {i} out of range "
                             f"(graph has {len(g.walks)} walks)")
    used = np.zeros(g.n_vtx, bool)
    edge_set: set[tuple[int, int]] = set()
    for i in keep:
        w = g.walks[i]
        used[w] = True
        for u, v in zip(w[:-1].tolist(), w[1:].tolist()):
            edge_set.add((u, v))
    old_ids = np.flatnonzero(used)
    remap = np.full(g.n_vtx, -1, np.int32)
    remap[old_ids] = np.arange(len(old_ids), dtype=np.int32)

    node_len = g.node_len[old_ids]
    seq_parts = [g.node_seq_codes(int(v)) for v in old_ids]
    seq_code = (np.concatenate(seq_parts) if seq_parts
                else np.zeros(0, np.uint8))
    node_off = np.zeros(len(old_ids) + 1, np.int64)
    np.cumsum(node_len, out=node_off[1:])

    if edge_set:
        eu, ev = (np.array(sorted(edge_set), np.int32).T
                  if len(edge_set) else (np.zeros(0, np.int32),) * 2)
        edge_u, edge_v = remap[eu], remap[ev]
        order = np.lexsort((edge_v, edge_u))
        edge_u, edge_v = edge_u[order], edge_v[order]
    else:
        edge_u = edge_v = np.zeros(0, np.int32)

    return GfaData(
        seg_names=[g.seg_names[int(v)] for v in old_ids],
        node_len=node_len, node_off=node_off, seq_code=seq_code,
        edge_u=edge_u, edge_v=edge_v,
        walks=[remap[g.walks[i]] for i in keep],
        walk_names=[g.walk_names[i] for i in keep],
        seg_tags=([g.seg_tags[int(v)] for v in old_ids]
                  if g.seg_tags else None),
        walk_meta=([g.walk_meta[i] for i in keep] if g.walk_meta else None),
    )


def main(argv=None) -> int:
    import argparse
    ap = argparse.ArgumentParser(
        prog="phi-subset",
        description="Derive an N-haplotype panel subset of a GFA graph "
                    "(chop_graph.sh progressive-imputation panels, natively)")
    ap.add_argument("-g", dest="gfa", required=True, help="input GFA(.gz)")
    ap.add_argument("-o", dest="out", required=True, help="output GFA path")
    grp = ap.add_mutually_exclusive_group(required=True)
    grp.add_argument("-n", dest="n", type=int,
                     help="keep the first N walks")
    grp.add_argument("--keep", dest="keep",
                     help="comma list of walk names (sample.hap) to keep")
    args = ap.parse_args(argv)
    g = read_gfa(args.gfa)
    if args.n is not None:
        if args.n < 1 or args.n > len(g.walks):
            print(f"[E::main] -n must be in [1,{len(g.walks)}], got {args.n}",
                  file=sys.stderr)
            return 1
        keep = list(range(args.n))
    else:
        names = args.keep.split(",")
        by_name = {n: i for i, n in enumerate(g.walk_names)}
        missing = [n for n in names if n not in by_name]
        if missing:
            print(f"[E::main] walks not in graph: {','.join(missing)}",
                  file=sys.stderr)
            return 1
        keep = [by_name[n] for n in names]
    sub = subset_panel(g, keep)
    write_gfa(sub, path=args.out)
    print(f"[M::main] kept {len(keep)}/{len(g.walks)} walks, "
          f"{sub.n_vtx}/{g.n_vtx} segments, {len(sub.edge_u)} edges "
          f"-> {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
