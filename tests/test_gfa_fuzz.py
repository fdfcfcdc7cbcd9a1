"""Deterministic fuzz of the GFA ingest path: random truncations, byte
corruptions, and structurally broken lines must produce a Python exception
(or a successfully parsed graph) from BOTH parsers — never a crash, hang,
or silent divergence between the native C++ parser and the Python one.

The reference's parser (gfa-io.cpp:462-498) warns/skips or hard-errors per
line; the contract here is the same: malformed input is a clean error."""

import gzip
import random

import pytest

from phi_tpu.io.gfa import read_gfa

BASE = b"""H\tVN:Z:1.1
S\t1\tACGTACGTAA
S\t2\tTTGGCCAATT
S\t3\tCCGGAATTGG
L\t1\t+\t2\t+\t0M
L\t2\t+\t3\t+\t0M
L\t1\t+\t3\t+\t0M
W\tsampleA\t0\tchr1\t0\t20\t>1>2
W\tsampleB\t0\tchr1\t0\t20\t>1>3
"""


def _try_parse(tmp_path, data: bytes, name: str):
    p = tmp_path / name
    p.write_bytes(data)
    native_err = py_err = None
    native_g = py_g = None
    try:
        native_g = read_gfa(str(p), prefer_native=True)
    except Exception as e:  # noqa: BLE001 — any clean Python error is fine
        native_err = e
    try:
        py_g = read_gfa(str(p), prefer_native=False)
    except Exception as e:  # noqa: BLE001
        py_err = e
    return native_g, native_err, py_g, py_err


def test_truncations_never_crash(tmp_path):
    for cut in range(0, len(BASE), 7):
        _try_parse(tmp_path, BASE[:cut], f"trunc_{cut}.gfa")


def test_byte_corruptions_never_crash(tmp_path):
    rng = random.Random(7)
    for trial in range(60):
        data = bytearray(BASE)
        for _ in range(rng.randint(1, 4)):
            pos = rng.randrange(len(data))
            data[pos] = rng.randrange(256)
        _try_parse(tmp_path, bytes(data), f"corrupt_{trial}.gfa")


def test_structural_mutations_agree(tmp_path):
    """Whole-line mutations where both parsers should agree on accept/reject."""
    lines = BASE.splitlines(keepends=True)
    rng = random.Random(11)
    for trial in range(40):
        mut = list(lines)
        op = rng.randrange(3)
        idx = rng.randrange(len(mut))
        if op == 0:
            del mut[idx]
        elif op == 1:
            mut.insert(idx, b"Q\tunknown\trecord\n")
        else:
            mut[idx] = mut[idx].replace(b"\t", b" ", 1)
        ng, ne, pg, pe = _try_parse(tmp_path, b"".join(mut), f"mut_{trial}.gfa")
        # Both sides must land on the same accept/reject outcome.
        assert (ne is None) == (pe is None), (
            f"trial {trial} op {op} idx {idx}: native={ne!r} python={pe!r}")
        if ng is not None and pg is not None:
            assert len(ng.seg_names) == len(pg.seg_names)
            assert len(ng.walk_names) == len(pg.walk_names)


def test_gzip_garbage_is_clean_error(tmp_path):
    p = tmp_path / "garbage.gfa.gz"
    p.write_bytes(b"\x1f\x8b" + bytes(range(64)))
    with pytest.raises(Exception):
        read_gfa(str(p), prefer_native=True)
    with pytest.raises(Exception):
        read_gfa(str(p), prefer_native=False)


def test_truncated_gzip_is_clean_error(tmp_path):
    full = gzip.compress(BASE)
    p = tmp_path / "trunc.gfa.gz"
    p.write_bytes(full[: len(full) // 2])
    with pytest.raises(Exception):
        read_gfa(str(p), prefer_native=True)
    with pytest.raises(Exception):
        read_gfa(str(p), prefer_native=False)
