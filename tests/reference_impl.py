"""Pure-Python reimplementations of the reference's string-based algorithms,
used as test oracles (they mirror /root/reference/src/ILP_index.cpp closely in
behavior, not in code)."""

from __future__ import annotations

_COMP = str.maketrans("ACGTacgt", "TGCAtgca")


def revcomp(s: str) -> str:
    return s.translate(_COMP)[::-1]


def minimizers_string(seq: str, k: int, w: int,
                      skip_non_acgt: bool = True) -> list[tuple[str, int]]:
    """Deque minimizer scan (ILP_index.cpp:359-445 semantics).

    Returns [(canonical_kmer, start_pos)] in emission order, consecutive
    duplicates (by value) removed. With skip_non_acgt, k-mers containing
    non-ACGT characters are excluded (our documented deviation; exact
    reference behavior when the input is pure ACGT).
    """
    seq = seq.upper()
    out: list[tuple[str, int]] = []
    if len(seq) < w + k - 1:
        return out
    from collections import deque
    dq: deque[tuple[str, int]] = deque()
    prev_val: str | None = None
    for i in range(len(seq) - k + 1):
        fwd = seq[i:i + k]
        if skip_non_acgt and any(c not in "ACGT" for c in fwd):
            cur = None
        else:
            cur = min(fwd, revcomp(fwd))
        if cur is not None:
            while dq and dq[-1][0] >= cur:
                dq.pop()
            dq.append((cur, i))
        if dq and dq[0][1] <= i - w:
            dq.popleft()
        if i >= w - 1 and dq:
            best, pos = dq[0]
            if best != prev_val:
                prev_val = best
                out.append((best, pos))
    return out
