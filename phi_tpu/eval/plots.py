"""Figure rendering for benchmark matrices — the equivalent of the
reference's data/plots/*.py matplotlib scripts (plot_edits.py etc.), reading
the same '(time, rss, edit)' CSV cells (data/plots/increasing.py:19-22)."""

from __future__ import annotations

import ast
import csv


def read_matrix_csv(path: str):
    """Returns (read_names, coverages, cells) where cells[(read, cov)] =
    (time_s, rss_gb, edit_distance)."""
    with open(path, newline="") as f:
        rows = list(csv.reader(f))
    covs = rows[0][1:]
    reads, cells = [], {}
    for row in rows[1:]:
        reads.append(row[0])
        for cov, cell in zip(covs, row[1:]):
            if cell.strip():
                cells[(row[0], cov)] = ast.literal_eval(cell)
    return reads, covs, cells


def plot_matrix(csv_path: str, out_png: str, metric: int = 2,
                ylabel: str = "edit distance", logy: bool = True) -> None:
    """One line per read set across coverages (metric: 0=time, 1=rss,
    2=edit distance), like the reference's plot_edits.py figures."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    reads, covs, cells = read_matrix_csv(csv_path)
    fig, ax = plt.subplots(figsize=(6, 4))
    for rn in reads:
        ys = [cells[(rn, cv)][metric] for cv in covs if (rn, cv) in cells]
        xs = [cv for cv in covs if (rn, cv) in cells]
        ax.plot(xs, ys, marker="o", label=rn)
    if logy:
        ax.set_yscale("log")
    ax.set_xlabel("coverage")
    ax.set_ylabel(ylabel)
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(out_png, dpi=120)
    plt.close(fig)
