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
    """Padded read codes for device sketching.

    When loaded natively, the raw ragged concatenation (concat, off) is kept
    so the sketch layer can consume it directly — no 2D pad round-trip
    (the concat is the exact layout the chunked masked sketch wants). The
    padded 2D view is then materialized lazily: the main pipeline never
    touches it on the native path, so load time stays parse-bound."""

    lengths: np.ndarray  # int32 [n_reads]
    names: list[str]
    concat: np.ndarray | None = None  # uint8 [total_bases]
    off: np.ndarray | None = None     # int64 [n_reads + 1]
    pad_to_multiple: int = 128
    _codes: np.ndarray | None = None  # uint8 [n_reads, max_len], pad 4

    @property
    def codes(self) -> np.ndarray:
        if self._codes is None:
            self._codes = _pad_2d(self.concat, self.off, self.lengths,
                                  self.pad_to_multiple)
        return self._codes

    @property
    def n_reads(self) -> int:
        return len(self.lengths)

    @property
    def total_bases(self) -> int:
        return int(self.lengths.sum())


def _empty_batch(pad_to_multiple: int) -> ReadBatch:
    return ReadBatch(np.zeros(0, np.int32), [],
                     pad_to_multiple=pad_to_multiple,
                     _codes=np.zeros((0, pad_to_multiple), np.uint8))


def load_read_batch(path: str, pad_to_multiple: int = 128,
                    prefer_native: bool = True) -> ReadBatch:
    if prefer_native:
        try:
            from phi_tpu.native import load_reads_native
            res = load_reads_native(path)
            if res is not None:
                codes_concat, off, names = res
                return _batch_from_concat(codes_concat, off, names, pad_to_multiple)
        except ValueError:
            raise
        except Exception:
            pass
    names: list[str] = []
    seqs: list[bytes] = []
    for name, seq in read_seq_file(path):
        names.append(name)
        seqs.append(seq)
    if not seqs:
        return _empty_batch(pad_to_multiple)
    lengths = np.array([len(s) for s in seqs], dtype=np.int32)
    max_len = int(lengths.max())
    max_len = -(-max_len // pad_to_multiple) * pad_to_multiple
    codes = np.full((len(seqs), max_len), 4, dtype=np.uint8)
    for i, s in enumerate(seqs):
        codes[i, :len(s)] = encode_seq(s)
    return ReadBatch(lengths, names, _codes=codes,
                     pad_to_multiple=pad_to_multiple)


def _pad_2d(codes_concat: np.ndarray, off: np.ndarray, lengths: np.ndarray,
            pad_to_multiple: int) -> np.ndarray:
    """Materialize the padded [n_reads, max_len] view from the ragged concat
    (single vectorized scatter)."""
    n = len(lengths)
    max_len = -(-int(lengths.max()) // pad_to_multiple) * pad_to_multiple
    codes = np.full((n, max_len), 4, dtype=np.uint8)
    rows = np.repeat(np.arange(n), lengths)
    cols = np.arange(len(codes_concat)) - np.repeat(off[:-1], lengths)
    codes[rows, cols] = codes_concat
    return codes


def _batch_from_concat(codes_concat: np.ndarray, off: np.ndarray,
                       names: list[str], pad_to_multiple: int) -> ReadBatch:
    n = len(names)
    if n == 0:
        return _empty_batch(pad_to_multiple)
    lengths = np.diff(off).astype(np.int32)
    return ReadBatch(lengths, names,
                     concat=np.ascontiguousarray(codes_concat, np.uint8),
                     off=off.astype(np.int64),
                     pad_to_multiple=pad_to_multiple)
