"""FASTA/FASTQ (optionally gzip) reader and fixed-shape read batching.

Replaces the reference's kseq-based loader (ILP_index::read_ip_reads,
/root/reference/src/ILP_index.cpp:313-328). Batching pads reads to a common
length so sketching runs as one vmapped device kernel with a length mask.
"""

from __future__ import annotations

import dataclasses
import gzip
from typing import IO, Iterator

import numpy as np

from phi_tpu.io.gfa import encode_seq


def _open_maybe_gzip(path: str) -> IO[bytes]:
    f = open(path, "rb")
    if f.read(2) == b"\x1f\x8b":
        f.seek(0)
        return gzip.open(f, "rb")  # type: ignore[return-value]
    f.seek(0)
    return f


def read_seq_file(path: str) -> Iterator[tuple[str, bytes]]:
    """Yield (name, sequence_bytes) from FASTA or FASTQ, plain or gzipped."""
    with _open_maybe_gzip(path) as fh:
        first = fh.read(1)
        if not first:
            return
        if first == b">":  # FASTA
            name = fh.readline().split()[0].decode() if True else ""
            chunks: list[bytes] = []
            for line in fh:
                if line.startswith(b">"):
                    yield name, b"".join(chunks)
                    name = line[1:].split()[0].decode()
                    chunks = []
                else:
                    chunks.append(line.strip())
            yield name, b"".join(chunks)
        elif first == b"@":  # FASTQ
            while True:
                header = fh.readline()
                if first is not None:
                    header = first + header
                    first = None
                if not header:
                    break
                seq = fh.readline().strip()
                plus = fh.readline()
                qual = fh.readline()
                if not seq or not plus:
                    break
                yield header[1:].split()[0].decode(), seq
        else:
            raise ValueError(f"{path}: not FASTA/FASTQ (starts with {first!r})")


@dataclasses.dataclass
class ReadBatch:
    """Padded read codes for device sketching."""

    codes: np.ndarray    # uint8 [n_reads, max_len], pad value 4 (invalid)
    lengths: np.ndarray  # int32 [n_reads]
    names: list[str]

    @property
    def n_reads(self) -> int:
        return len(self.lengths)

    @property
    def total_bases(self) -> int:
        return int(self.lengths.sum())


def load_read_batch(path: str, pad_to_multiple: int = 128) -> ReadBatch:
    names: list[str] = []
    seqs: list[bytes] = []
    for name, seq in read_seq_file(path):
        names.append(name)
        seqs.append(seq)
    if not seqs:
        return ReadBatch(np.zeros((0, pad_to_multiple), np.uint8),
                         np.zeros(0, np.int32), [])
    lengths = np.array([len(s) for s in seqs], dtype=np.int32)
    max_len = int(lengths.max())
    max_len = -(-max_len // pad_to_multiple) * pad_to_multiple
    codes = np.full((len(seqs), max_len), 4, dtype=np.uint8)
    for i, s in enumerate(seqs):
        codes[i, :len(s)] = encode_seq(s)
    return ReadBatch(codes, lengths, names)
