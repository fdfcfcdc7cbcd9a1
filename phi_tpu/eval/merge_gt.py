"""Merge per-sample ground-truth grid shards (eval.groundtruth run with
--samples X) into one artifact per error model.

    python -m phi_tpu.eval.merge_gt --parts bench_results/gt_parts \
        --model subs --out bench_results/groundtruth_r05
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def merge(parts_dir: str, model: str, out_prefix: str) -> dict | None:
    from phi_tpu.eval.groundtruth import SAMPLES, write_outputs
    merged = None
    for sample in SAMPLES:
        path = os.path.join(parts_dir, f"{model}_{sample}.json")
        if not os.path.exists(path):
            print(f"[merge-gt] missing shard {path}", file=sys.stderr)
            continue
        part = json.load(open(path))
        if merged is None:
            merged = part
        else:
            merged["cells"].extend(part["cells"])
            merged["floors"].update(part["floors"])
    if merged is None:
        return None
    write_outputs(merged, out_prefix)
    return merged


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="phi-merge-gt")
    ap.add_argument("--parts", default="bench_results/gt_parts")
    ap.add_argument("--model", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)
    m = merge(args.parts, args.model, args.out)
    if m is None:
        return 1
    print(json.dumps({"cells": len(m["cells"]),
                      "certified": sum(r["certified"] for r in m["cells"]),
                      "beats_floor": sum(r["beats_floor"]
                                         for r in m["cells"])}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
