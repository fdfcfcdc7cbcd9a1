"""HBM budget model for the solver's device arrays.

Answers the scaling question VERDICT r2 #3 raised: which instance sizes
fit a single 16 GB v5e chip, and how the sp/hap sharding
(parallel/sharded.py) divides the footprint across a mesh. The model
covers the arrays the sharded solve actually materializes per device:

  S, B, M     [H, P] float32 lane tables (credit, base, relaxation value)
  W           [L, H, P] float32 straddle-correction stack — the dominant
              term; sharded along sp (P axis) with a halo of L columns
  state_vertex[H, P] int32, walk_len [H] int32
  esrc_*      switch-source tables, ~one entry per (vertex, lane) pair
  join tables spectrum m/lo/perm (4 B each) + offsets (2^bits + 1)

    python -m phi_tpu.eval.hbm_budget --H 49 --P 1600000 --L 16 \
        --spectrum 4000000 --occ 25000000 --mesh 1,8
"""

from __future__ import annotations

import argparse
import json
import sys

V5E_HBM_GB = 16.0


def budget(H: int, P: int, L: int, spectrum: int, n_occ: int,
           n_esrc: int | None = None, sp_shards: int = 1,
           hap_shards: int = 1, stream_w: bool | None = None) -> dict:
    """Per-device bytes for one (sp_shards x hap_shards) mesh tile.
    stream_w: the streaming-W solver (auto-on past ~3 GB of stack,
    solve.dp._stream_w) rebuilds each straddle layer per sweep and never
    materializes [L, H, P] — only ~2 layer-sized scratch planes. None =
    apply the same auto rule as the solver."""
    n_esrc = n_esrc if n_esrc is not None else H * max(1, P // 16)
    Pd = -(-P // sp_shards) + (L if sp_shards > 1 else 0)  # + sp halo
    Hd = -(-H // hap_shards)
    if stream_w is None:
        stream_w = L * Hd * Pd * 4 > 3 * (1 << 30)
    w_bytes = (2 if stream_w else L) * Hd * Pd * 4
    rows = {
        "S/B/M lane tables (3x [H,P] f32)": 3 * Hd * Pd * 4,
        ("W scratch (streaming: 2x [H,P] f32)" if stream_w
         else "W straddle stack ([L,H,P] f32)"): w_bytes,
        "state_vertex ([H,P] i32)": Hd * Pd * 4,
        "switch sources (esrc h/p/target/edge i32)": 4 * n_esrc * 4,
        "occurrence tables (hap/start/end/kmer/weight)": 5 * n_occ * 4,
        "spectrum join tables (m/lo/perm + offsets)":
            3 * spectrum * 4 + (min(1 << 22, max(65536, spectrum)) + 1) * 4,
    }
    total = sum(rows.values())
    return {"per_device_bytes": rows, "total_gb": round(total / 1e9, 2),
            "fits_v5e": total / 1e9 <= V5E_HBM_GB,
            "mesh": f"sp={sp_shards} x hap={hap_shards}",
            "dims": {"H": H, "P": P, "L": L, "P_per_device": Pd,
                     "H_per_device": Hd}}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="phi-hbm-budget")
    ap.add_argument("--H", type=int, required=True)
    ap.add_argument("--P", type=int, required=True)
    ap.add_argument("--L", type=int, default=16)
    ap.add_argument("--spectrum", type=int, default=4_000_000)
    ap.add_argument("--occ", type=int, default=25_000_000)
    ap.add_argument("--esrc", type=int, default=None)
    ap.add_argument("--mesh", default="1",
                    help="comma list of sp-shard counts to tabulate")
    args = ap.parse_args(argv)
    for sp in [int(x) for x in args.mesh.split(",")]:
        b = budget(args.H, args.P, args.L, args.spectrum, args.occ,
                   args.esrc, sp_shards=sp)
        print(json.dumps(b))
    return 0


if __name__ == "__main__":
    sys.exit(main())
