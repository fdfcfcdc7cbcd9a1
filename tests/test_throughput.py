"""Throughput micro-benchmark (eval/throughput.py) runs and reports sane
numbers on tiny inputs (the real measurement sizes run via phi-throughput)."""

import json

from phi_tpu.eval.throughput import bench_join, bench_sketch, main


def test_bench_sketch_and_join_tiny():
    s = bench_sketch(200_000, repeats=1)
    assert s["bases_per_s"] > 0 and s["kmers_per_s"] > 0
    assert 0 < s["spectrum"] <= 200_000
    j = bench_join(200_000, repeats=1)
    assert j["bases_per_s"] > 0
    # the spectrum was sampled from the same sequence -> hits must exist
    assert j["hits"] > 0


def test_cli_json_lines(capsys):
    assert main(["--mbases", "0.2", "--repeats", "1"]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 2
    for l in lines:
        row = json.loads(l)
        assert {"metric", "bases_per_s", "kmers_per_s", "backend"} <= set(row)
