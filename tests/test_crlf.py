"""CRLF (Windows) line endings must parse identically to Unix line endings.

The reference's kseq strips a trailing '\\r' on every line (kseq.h:146,
KS_SEP_LINE), so CRLF GFA/FASTA/FASTQ inputs work there; both of our parsers
must match — a '\\r' leaking into an S-line sequence would add a phantom N
base to every node."""

import numpy as np

from phi_tpu.io.gfa import read_gfa
from phi_tpu.io.reads import load_read_batch

GFA = (b"H\tVN:Z:1.1\n"
       b"S\t1\tACGTACGTAA\n"
       b"S\t2\tTTGGCCAATT\n"
       b"L\t1\t+\t2\t+\t0M\n"
       b"W\tsampleA\t0\tchr1\t0\t20\t>1>2\n")

FASTQ = (b"@r1 desc\nACGTACGTAA\n+\nIIIIIIIIII\n"
         b"@r2\nTTGGCCAATT\n+\nIIIIIIIIII\n")


def _crlf(data: bytes) -> bytes:
    return data.replace(b"\n", b"\r\n")


def test_gfa_crlf_matches_unix(tmp_path):
    unix = tmp_path / "unix.gfa"
    unix.write_bytes(GFA)
    crlf = tmp_path / "crlf.gfa"
    crlf.write_bytes(_crlf(GFA))
    for prefer_native in (True, False):
        gu = read_gfa(str(unix), prefer_native=prefer_native)
        gc = read_gfa(str(crlf), prefer_native=prefer_native)
        assert gu.seg_names == gc.seg_names
        np.testing.assert_array_equal(gu.node_len, gc.node_len)
        np.testing.assert_array_equal(gu.seq_code, gc.seq_code)
        assert gu.walk_names == gc.walk_names
        assert not (gc.seq_code == 4).any(), "CR leaked into sequence as N"


def test_fastq_crlf_matches_unix(tmp_path):
    unix = tmp_path / "unix.fq"
    unix.write_bytes(FASTQ)
    crlf = tmp_path / "crlf.fq"
    crlf.write_bytes(_crlf(FASTQ))
    for prefer_native in (True, False):
        bu = load_read_batch(str(unix), prefer_native=prefer_native)
        bc = load_read_batch(str(crlf), prefer_native=prefer_native)
        assert bu.names == bc.names == ["r1", "r2"]
        np.testing.assert_array_equal(bu.lengths, bc.lengths)
        np.testing.assert_array_equal(bu.codes, bc.codes)


def test_fasta_crlf_matches_unix(tmp_path):
    fasta = b">r1 desc\nACGTACGTAA\nTTGG\n>r2\nCCAATT\n"
    unix = tmp_path / "unix.fa"
    unix.write_bytes(fasta)
    crlf = tmp_path / "crlf.fa"
    crlf.write_bytes(_crlf(fasta))
    for prefer_native in (True, False):
        bu = load_read_batch(str(unix), prefer_native=prefer_native)
        bc = load_read_batch(str(crlf), prefer_native=prefer_native)
        assert bu.names == bc.names == ["r1", "r2"]
        np.testing.assert_array_equal(bu.lengths, bc.lengths)
        np.testing.assert_array_equal(bu.codes, bc.codes)
