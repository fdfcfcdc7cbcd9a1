"""Sketch/join throughput micro-benchmark (BASELINE.md north-star: read
k-mer throughput, k-mers/s per chip, at 1 chip / 1 host / multi-device).

Measures, on the active backend (TPU chip or host CPU):
  * `sketch`  — minimizer extraction over a read-shaped concatenation
                (the reference's hot loops #1/#2, ILP_index.cpp:359-493);
                reports bases/s and k-mers/s (every window position is a
                k-mer the scan evaluates);
  * `join`    — the fused sketch+join against a spectrum (hot loop #3);
  * `sketch@N`— the dp-sharded variant over an N-device mesh (the >=2-host
                analog; on CPU use XLA_FLAGS=--xla_force_host_platform_
                device_count=N).

Each metric reports the median of `repeats` warm runs with IQR and the
raw observations (first run pays compile, excluded), plus roofline
context on TPU: the HBM-bandwidth ceiling for the kernel's actual
traffic and the achieved fraction. Output: one JSON line per metric.

    python -m phi_tpu.eval.throughput --mbases 64 --mesh 4
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

from phi_tpu.eval.stats import summarize

# v5e (TPU v5 lite) public per-chip ceilings (jax-ml.github.io/scaling-book):
# HBM ~819 GB/s, VPU 8x128 lanes. The sketch kernel streams 2-bit packed
# bases (0.25 B/base read) and is VPU-bound long before HBM matters; the
# HBM ceiling is still the hard upper bound reported for context.
V5E_HBM_BYTES_PER_S = 819e9
SKETCH_BYTES_PER_BASE = 0.25  # 2-bit packed input; outputs are ~1e-3 of it


def _roofline(backend: str, bases_per_s: float) -> dict:
    if backend != "tpu":
        return {}
    ceiling = V5E_HBM_BYTES_PER_S / SKETCH_BYTES_PER_BASE
    return {"hbm_roofline_bases_per_s": round(ceiling),
            "hbm_roofline_fraction": round(bases_per_s / ceiling, 6)}


def _rand_reads(rng: np.random.Generator, total_bases: int,
                read_len: int = 150) -> tuple[np.ndarray, np.ndarray]:
    n_reads = max(1, total_bases // read_len)
    concat = rng.integers(0, 4, n_reads * read_len, dtype=np.uint8)
    off = np.arange(n_reads + 1, dtype=np.int64) * read_len
    return concat, off


def bench_sketch(total_bases: int, k: int = 31, w: int = 25,
                 repeats: int = 5, devices=None) -> dict:
    """Read-spectrum sketch throughput (sketch_read_concat path)."""
    from phi_tpu.sketch.minimizer import sketch_read_concat
    rng = np.random.default_rng(0)
    concat, off = _rand_reads(rng, total_bases)
    hi, lo = sketch_read_concat(concat, off, k, w, devices=devices)  # compile
    times = []
    for _ in range(repeats):
        t0 = time.time()
        hi, lo = sketch_read_concat(concat, off, k, w, devices=devices)
        times.append(time.time() - t0)
    st = summarize(times)
    n_windows = len(concat) - (len(off) - 1) * (k + w - 2)  # evaluated k-mers
    return {"data": "synthetic", "metric": "sketch" if devices is None
            else f"sketch@{len(devices)}dev",
            "bases_per_s": round(len(concat) / st["median_s"]),
            "kmers_per_s": round(max(n_windows, 0) / st["median_s"]),
            "spectrum": int(len(hi)), **st}


def bench_join(total_bases: int, k: int = 31, w: int = 25,
               repeats: int = 5) -> dict:
    """Fused haplotype sketch+join throughput (one long sequence vs a
    spectrum sampled from itself — every window does the table probe)."""
    from phi_tpu.sketch.minimizer import sketch_join_many, sketch_sequence
    rng = np.random.default_rng(1)
    seq = rng.integers(0, 4, total_bases, dtype=np.uint8)
    hi, lo, _pos = sketch_sequence(seq[: min(total_bases, 1 << 22)], k, w)
    key = (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)
    key = np.unique(key)
    sp_hi = (key >> np.uint64(32)).astype(np.uint32)
    sp_lo = (key & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    sketch_join_many([seq], k, w, sp_hi, sp_lo)  # compile warmup
    times, n_hits = [], 0
    for _ in range(repeats):
        t0 = time.time()
        out = sketch_join_many([seq], k, w, sp_hi, sp_lo)
        times.append(time.time() - t0)
        n_hits = int(len(out[0][1]))
    st = summarize(times)
    return {"data": "synthetic", "metric": "join",
            "bases_per_s": round(total_bases / st["median_s"]),
            "kmers_per_s": round((total_bases - k - w + 2) / st["median_s"]),
            "hits": n_hits, **st}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="phi-throughput")
    ap.add_argument("--mbases", type=float, default=64.0,
                    help="input size in megabases (default 64)")
    ap.add_argument("--k", type=int, default=31)
    ap.add_argument("--w", type=int, default=25)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--mesh", type=int, default=0,
                    help="also run the dp-sharded sketch over N devices")
    ap.add_argument("--out", default=None, help="write JSONL artifact here")
    args = ap.parse_args(argv)
    import jax
    total = int(args.mbases * 1e6)
    rows = [bench_sketch(total, args.k, args.w, args.repeats),
            bench_join(total, args.k, args.w, args.repeats)]
    if args.mesh > 1:
        from phi_tpu.parallel.sharded import make_mesh
        devices = list(make_mesh(args.mesh).devices.reshape(-1))
        rows.append(bench_sketch(total, args.k, args.w, args.repeats,
                                 devices=devices))
    backend = jax.default_backend()
    lines = []
    for r in rows:
        r["backend"] = backend
        r["device"] = str(jax.devices()[0])
        r.update(_roofline(backend, r["bases_per_s"]))
        line = json.dumps(r)
        lines.append(line)
        print(line, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write("\n".join(lines) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
