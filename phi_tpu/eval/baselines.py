"""Baseline methods for accuracy comparisons.

The reference benchmarks against VG giraffe/call and PanGenie
(data/run_VG.py, data/run_PG.py) — neither tool exists in this environment,
so the role of "context for PHI's accuracy" is filled by native baselines:

- best_panel_hap: the panel walk sharing the most read minimizers, emitted
  as-is (no recombination). This is the floor any single-haplotype method
  (reference-based imputation at its best) could reach — PHI's headline is
  beating it at low coverage by recombining walks.
"""

from __future__ import annotations

import numpy as np

from phi_tpu.graph.pangenome import PangenomeGraph
from phi_tpu.sketch.encode import combine64
from phi_tpu.sketch.minimizer import sketch_sequence


def best_panel_hap(graph: PangenomeGraph,
                   spectrum: tuple[np.ndarray, np.ndarray],
                   k: int, w: int) -> tuple[int, str]:
    """(hap_index, sequence) of the walk with the most distinct read-spectrum
    minimizers."""
    sp_key = combine64(*spectrum)
    best_h, best_n = 0, -1
    for h in range(graph.num_walks):
        hi, lo, _ = sketch_sequence(graph.walk_seq_codes(h), k, w)
        key = np.unique(combine64(hi, lo))
        idx = np.searchsorted(sp_key, key)
        idx_c = np.minimum(idx, max(len(sp_key) - 1, 0))
        n = int(((idx < len(sp_key)) & (sp_key[idx_c] == key)).sum()) \
            if len(sp_key) else 0
        if n > best_n:
            best_h, best_n = h, n
    return best_h, graph.path_seq(
        graph.walk_mat[best_h, :graph.walk_len[best_h]])


def run_best_hap_baseline(gfa_path: str, reads_path: str, truth_path: str,
                          k: int = 31, w: int = 25) -> dict:
    """File-level driver mirroring run_matrix's cell metrics."""
    import time

    from phi_tpu.eval.edits import _read_fasta_first_seq, edit_stats
    from phi_tpu.graph import tensorize
    from phi_tpu.io.gfa import read_gfa
    from phi_tpu.io.reads import load_read_batch
    from phi_tpu.sketch.minimizer import sketch_read_batch, sketch_read_concat
    t0 = time.time()
    graph = tensorize(read_gfa(gfa_path))
    reads = load_read_batch(reads_path)
    if reads.concat is not None:
        spectrum = sketch_read_concat(reads.concat, reads.off, k, w)
    else:
        spectrum = sketch_read_batch(reads.codes, k, w, reads.lengths)
    h, seq = best_panel_hap(graph, spectrum, k, w)
    truth = _read_fasta_first_seq(truth_path)
    st = edit_stats(seq, truth)
    return {"hap": graph.walk_names[h], "edit_distance": st.edit_distance,
            "time_s": round(time.time() - t0, 2)}


def run_greedy_baseline(gfa_path: str, reads_path: str, truth_path: str,
                        k: int = 31, w: int = 25) -> dict:
    """Greedy per-site genotyping stand-in (the VG-call/PanGenie model
    class, data/run_VG.py / run_PG.py): every variant site is decided by
    local read-k-mer support alone — implemented as the PHI solve with a
    near-zero recombination penalty and no distinct-credit refinement, so
    switching between walks is free and duplicate k-mer credit is kept.
    PHI's headline is that joint inference (R=100 + global credit) beats
    this at low coverage, where per-site votes chase sequencing errors."""
    import os
    import tempfile
    import time

    from phi_tpu.config import Options
    from phi_tpu.eval.edits import _read_fasta_first_seq, edit_stats
    from phi_tpu.pipeline import run_pipeline
    t0 = time.time()
    out = tempfile.NamedTemporaryFile(suffix=".fa", delete=False)
    out.close()
    try:
        opt = Options(k=k, w=w, recombination=1e-3, lagrangian_rounds=0)
        res = run_pipeline(gfa_path, reads_path, out.name, opt)
        truth = _read_fasta_first_seq(truth_path)
        st = edit_stats(res.sequence, truth)
        return {"edit_distance": st.edit_distance,
                "recombinations": res.recombination_count,
                "time_s": round(time.time() - t0, 2)}
    finally:
        os.unlink(out.name)
