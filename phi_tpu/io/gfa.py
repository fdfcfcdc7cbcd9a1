"""GFA v1.1 parser (S/L/W lines, gzip streaming) -> array-of-struct graph.

Replaces the reference's gfa-io.cpp/gfa-base.cpp C layer (see
/root/reference/src/gfa-io.cpp:462 `gfa_read`) with a tensor-producing parser:
segment sequences land in one concatenated 2-bit-codable uint8 buffer with
offsets, links become a deduplicated forward-strand edge list, and W-line walks
become vertex-id arrays.

Orientation folding matches the reference exactly: gfa-io adds each L-line arc
plus its complement (gfa-io.cpp:279-365), and ILP_index::read_gfa keeps arcs
whose *source* vertex is forward-strand, halving ids regardless of target
orientation (/root/reference/src/ILP_index.cpp:53-84). That reduces to:
  L u ou v ov  ->  edge u->v if ou=='+',  plus edge v->u if ov=='-'.

Walks are majority-strand normalized (gfa_walk_flip, gfa-io.cpp:64-115); any
remaining reverse-strand walk vertex is an error (ILP_index.cpp:104-107).
"""

from __future__ import annotations

import dataclasses
import gzip
from typing import IO, Iterable

import numpy as np

# Base codes: A=0 C=1 G=2 T=3, everything else 4 ("invalid").
# Numeric order of the 2-bit codes equals ASCII lexicographic order of ACGT,
# which is what makes numeric minimizer comparison match the reference's
# string comparison (ILP_index.cpp:394). See DESIGN.md.
BASE_LUT = np.full(256, 4, dtype=np.uint8)
for _i, _b in enumerate(b"ACGT"):
    BASE_LUT[_b] = _i
    BASE_LUT[_b + 32] = _i  # lowercase

CODE2BASE = np.frombuffer(b"ACGTN", dtype=np.uint8)


def encode_seq(seq: bytes | str) -> np.ndarray:
    if isinstance(seq, str):
        seq = seq.encode()
    return BASE_LUT[np.frombuffer(seq, dtype=np.uint8)]


def decode_seq(codes: np.ndarray) -> str:
    return CODE2BASE[codes].tobytes().decode()


@dataclasses.dataclass
class GfaData:
    """Raw parse result, before tensorization into a PangenomeGraph."""

    seg_names: list[str]
    node_len: np.ndarray        # int64 [n_vtx]
    node_off: np.ndarray        # int64 [n_vtx + 1], offsets into seq_code
    seq_code: np.ndarray        # uint8 [total_len], 0..4
    edge_u: np.ndarray          # int32 [n_edges]  (forward-strand, deduped)
    edge_v: np.ndarray          # int32 [n_edges]
    walks: list[np.ndarray]     # per walk: int32 vertex ids
    walk_names: list[str]       # "sample.hap" (ILP_index.cpp:98)
    # GFA fidelity extras (round-tripped by write_gfa):
    seg_tags: list[str] | None = None
    #   per segment: raw tab-joined typed tag suffix of its S line, e.g.
    #   "LN:i:30\tSN:Z:chr6" ("" if none) — gfa_aux_parse analog keeps the
    #   bytes, parse_tags() below gives typed access (gfa-io.cpp:117-177)
    walk_meta: list[tuple[str, int, int]] | None = None
    #   per walk: (seq_name, seq_start, seq_end) from W columns 4-6
    #   (gfa-io.cpp:379-389); writer emits them back (not "_ 0 len")

    @property
    def n_vtx(self) -> int:
        return len(self.node_len)

    def node_seq_codes(self, v: int) -> np.ndarray:
        return self.seq_code[self.node_off[v]:self.node_off[v + 1]]

    def node_seq(self, v: int) -> str:
        return decode_seq(self.node_seq_codes(v))


def parse_tags(raw: str) -> dict[str, tuple[str, int | float | str]]:
    """Typed view of a raw tag suffix: 'LN:i:30\\tSN:Z:chr6' ->
    {'LN': ('i', 30), 'SN': ('Z', 'chr6')} (gfa_aux_parse semantics,
    gfa-io.cpp:117-172: i/f typed numerically, A/Z/H/B kept as strings;
    malformed fields are skipped)."""
    out: dict[str, tuple[str, int | float | str]] = {}
    if not raw:
        return out
    for field in raw.split("\t"):
        parts = field.split(":", 2)
        if len(parts) != 3 or len(parts[0]) != 2 or len(parts[1]) != 1:
            continue
        tag, typ, val = parts
        try:
            if typ == "i":
                out[tag] = (typ, int(val))
            elif typ == "f":
                out[tag] = (typ, float(val))
            else:
                out[tag] = (typ, val)
        except ValueError:
            continue
    return out


def format_tags(tags: dict[str, tuple[str, int | float | str]]) -> str:
    """Inverse of parse_tags (gfa_aux_format analog, gfa-io.cpp:174-212)."""
    return "\t".join(f"{t}:{ty}:{v}" for t, (ty, v) in tags.items())


def _open_maybe_gzip(path: str) -> IO[bytes]:
    f = open(path, "rb")
    magic = f.read(2)
    f.seek(0)
    if magic == b"\x1f\x8b":
        return gzip.open(f, "rb")  # type: ignore[return-value]
    return f


def read_gfa(path: str, prefer_native: bool = True) -> GfaData:
    """Parse a GFA file. Uses the native C++ parser when the library is
    available (2-3x faster on multi-MB graphs); the pure-Python path below is
    the behavioral reference and fallback."""
    if prefer_native:
        try:
            from phi_tpu.native import parse_gfa_native
            g = parse_gfa_native(path)
            if g is not None:
                return g
        except ValueError:
            raise
        except Exception:
            pass  # fall back to the Python parser
    return _read_gfa_py(path)


def _read_gfa_py(path: str) -> GfaData:
    seg_names: list[str] = []
    seg_id: dict[str, int] = {}
    seqs: list[bytes] = []          # per segment, raw bytes ("" until its S line)
    seg_tags: list[str] = []        # per segment, raw typed-tag suffix
    declared_len: list[int] = []    # LN:i for '*'-sequence segments
    links: list[tuple[int, int, int, int]] = []  # (u, ou, v, ov); o: 0='+', 1='-'
    walks: list[np.ndarray] = []
    walk_names: list[str] = []
    walk_meta: list[tuple[str, int, int]] = []
    fa_seg = -1                     # embedded-FASTA mode (gfa-io.cpp:479-499)

    def get_seg(name: str) -> int:
        i = seg_id.get(name)
        if i is None:
            i = len(seg_names)
            seg_id[name] = i
            seg_names.append(name)
            seqs.append(b"")
            seg_tags.append("")
            declared_len.append(0)
        return i

    with _open_maybe_gzip(path) as fh:
        for line in fh:
            if len(line) < 2 or line[1:2] != b"\t":
                # embedded-FASTA mode: '>name' headers switch the stream to
                # FASTA; subsequent plain lines append to that segment
                line_s = line.rstrip(b"\r\n")
                if line_s.startswith(b">"):
                    fa_seg = get_seg(line_s[1:].split()[0].decode())
                    seqs[fa_seg] = b""
                elif fa_seg >= 0 and line_s:
                    seqs[fa_seg] += line_s
                continue
            fa_seg = -1
            t = line[0:1]
            if t == b"S":
                fields = line.rstrip(b"\r\n").split(b"\t")
                i = get_seg(fields[1].decode())
                seq = fields[2]
                seqs[i] = b"" if seq == b"*" else seq
                if len(fields) > 3:
                    raw = b"\t".join(fields[3:]).decode()
                    seg_tags[i] = raw
                    if seq == b"*":
                        ln = parse_tags(raw).get("LN")
                        if ln is not None and ln[0] == "i":
                            declared_len[i] = int(ln[1])
            elif t == b"L":
                fields = line.rstrip(b"\r\n").split(b"\t", 5)
                if len(fields) < 5:
                    raise ValueError(f"truncated L line: {line!r}")
                u = get_seg(fields[1].decode())
                v = get_seg(fields[3].decode())
                if fields[2] not in (b"+", b"-") or fields[4] not in (b"+", b"-"):
                    raise ValueError(
                        f"bad L-line orientation {fields[2]!r}/{fields[4]!r}")
                ou = 0 if fields[2] == b"+" else 1
                ov = 0 if fields[4] == b"+" else 1
                links.append((u, ou, v, ov))
            elif t == b"W":
                fields = line.rstrip(b"\r\n").split(b"\t")
                # sample, hap_index, seq_name, start, end, walk (gfa-io.cpp:379-389)
                sample, hap_idx = fields[1].decode(), fields[2].decode()
                walk_names.append(f"{sample}.{hap_idx}")

                def _i(b: bytes) -> int:
                    try:
                        return int(b)
                    except ValueError:
                        return 0
                walk_meta.append((fields[3].decode(), _i(fields[4]),
                                  _i(fields[5])))
                walks.append(_parse_walk(fields[6], get_seg))

    # '*'-sequence segments with a declared LN:i length: keep the tensor
    # invariants (sum(node_len) == len(seq_code)) by filling with N codes
    for i, d in enumerate(declared_len):
        if d > 0 and not seqs[i]:
            seqs[i] = b"N" * d
    n_vtx = len(seg_names)
    node_len = np.array([len(s) for s in seqs], dtype=np.int64)
    node_off = np.zeros(n_vtx + 1, dtype=np.int64)
    np.cumsum(node_len, out=node_off[1:])
    seq_code = encode_seq(b"".join(seqs)) if n_vtx else np.zeros(0, np.uint8)

    edge_u, edge_v = _fold_links(links)
    walks = [_normalize_walk(w, i) for i, w in enumerate(walks)]
    return GfaData(seg_names, node_len, node_off, seq_code,
                   edge_u, edge_v, walks, walk_names,
                   seg_tags=seg_tags, walk_meta=walk_meta)


def _parse_walk(walk_field: bytes, get_seg) -> np.ndarray:
    """Parse '>s1>s2<s3...' into signed vertex ids: seg<<1 | strand."""
    s = walk_field.decode().rstrip()
    out: list[int] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c not in "><":
            raise ValueError(f"bad walk char {c!r}")
        j = i + 1
        while j < n and s[j] not in "><":
            j += 1
        out.append(get_seg(s[i + 1:j]) << 1 | (0 if c == ">" else 1))
        i = j
    return np.array(out, dtype=np.int64)


def _normalize_walk(w: np.ndarray, idx: int) -> np.ndarray:
    """Majority-strand flip (gfa-io.cpp:64-115) then require all-forward
    (ILP_index.cpp:104-107) and halve ids."""
    n_rev = int((w & 1).sum())
    if n_rev * 2 > len(w):
        w = (w[::-1] ^ 1).copy()
    if (w & 1).any():
        raise ValueError(f"walk {idx} has reverse-strand vertices after flip "
                         f"(reference exits here, ILP_index.cpp:104-107)")
    return (w >> 1).astype(np.int32)


def _fold_links(links: list[tuple[int, int, int, int]]) -> tuple[np.ndarray, np.ndarray]:
    if not links:
        z = np.zeros(0, dtype=np.int32)
        return z, z.copy()
    arr = np.array(links, dtype=np.int64)
    u, ou, v, ov = arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3]
    fwd_u = u[ou == 0]
    fwd_v = v[ou == 0]
    comp_u = v[ov == 1]
    comp_v = u[ov == 1]
    eu = np.concatenate([fwd_u, comp_u])
    ev = np.concatenate([fwd_v, comp_v])
    # dedup multi-edges (gfa_arc_dedup analog, gfa-base.cpp:363-419)
    packed = np.unique(eu << 32 | ev)
    return (packed >> 32).astype(np.int32), (packed & 0xFFFFFFFF).astype(np.int32)


def write_gfa(g: GfaData, fh: Iterable | None = None, path: str | None = None) -> str:
    """GFA writer (gfa_print analog, gfa-io.cpp:510-566). Returns the text.
    Round-trips typed S-line tags and W-line seq_name/start/end."""
    lines = ["H\tVN:Z:1.1"]
    for i, name in enumerate(g.seg_names):
        tags = g.seg_tags[i] if g.seg_tags else ""
        suffix = ("\t" + tags) if tags else ""
        lines.append(f"S\t{name}\t{g.node_seq(i)}{suffix}")
    for u, v in zip(g.edge_u.tolist(), g.edge_v.tolist()):
        lines.append(f"L\t{g.seg_names[u]}\t+\t{g.seg_names[v]}\t+\t0M")
    for i, (name, w) in enumerate(zip(g.walk_names, g.walks)):
        sample, hap = name.rsplit(".", 1)
        if g.walk_meta:
            seq_name, st, en = g.walk_meta[i]
        else:
            seq_name, st, en = "_", 0, int(g.node_len[w].sum())
        walk_str = "".join(">" + g.seg_names[v] for v in w.tolist())
        lines.append(f"W\t{sample}\t{hap}\t{seq_name}\t{st}\t{en}\t{walk_str}")
    text = "\n".join(lines) + "\n"
    if path is not None:
        with open(path, "w") as f:
            f.write(text)
    return text
