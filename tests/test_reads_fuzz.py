"""Deterministic fuzz of the reads ingest path (FASTA/FASTQ, plain and
gzipped): truncations and byte corruptions must produce either a parsed
batch or a clean Python exception from BOTH loaders — never a crash or a
hang — and the two loaders must agree on well-formed input."""

import gzip
import random

import numpy as np
import pytest

from phi_tpu.io.reads import load_read_batch

FASTQ = (b"@r1 some desc\nACGTACGTAACC\n+\nIIIIIIIIIIII\n"
         b"@r2\nTTGGCCAATTGG\n+\nJJJJJJJJJJJJ\n"
         b"@r3\nNNACGTNN\n+\nKKKKKKKK\n")

FASTA = b">a\nACGTACGT\nTTGG\n>b desc here\nCCAATT\n>c\nNNNN\n"


def _try_load(tmp_path, data: bytes, name: str):
    p = tmp_path / name
    p.write_bytes(data)
    outs = []
    for prefer_native in (True, False):
        try:
            b = load_read_batch(str(p), prefer_native=prefer_native)
            outs.append(("ok", b.names, b.lengths.tolist()))
        except Exception as e:  # noqa: BLE001 — clean error is acceptable
            outs.append(("err", type(e).__name__, None))
    return outs


def test_fastq_truncations_never_crash(tmp_path):
    for cut in range(0, len(FASTQ), 5):
        _try_load(tmp_path, FASTQ[:cut], f"t{cut}.fq")


def test_fasta_truncations_never_crash(tmp_path):
    for cut in range(0, len(FASTA), 3):
        _try_load(tmp_path, FASTA[:cut], f"t{cut}.fa")


def test_corruptions_never_crash(tmp_path):
    rng = random.Random(5)
    for trial in range(50):
        src = FASTQ if trial % 2 else FASTA
        data = bytearray(src)
        for _ in range(rng.randint(1, 3)):
            data[rng.randrange(len(data))] = rng.randrange(256)
        _try_load(tmp_path, bytes(data), f"c{trial}.fq")


def test_loaders_agree_on_wellformed(tmp_path):
    for name, data in (("a.fq", FASTQ), ("a.fa", FASTA),
                       ("a.fq.gz", gzip.compress(FASTQ)),
                       ("a.fa.gz", gzip.compress(FASTA))):
        (s1, n1, l1), (s2, n2, l2) = _try_load(tmp_path, data, name)
        assert s1 == s2 == "ok"
        assert n1 == n2
        assert l1 == l2


def test_truncated_gzip_reads_is_clean_error(tmp_path):
    full = gzip.compress(FASTQ)
    p = tmp_path / "trunc.fq.gz"
    p.write_bytes(full[: len(full) // 2])
    for prefer_native in (True, False):
        with pytest.raises(Exception):
            load_read_batch(str(p), prefer_native=prefer_native)
