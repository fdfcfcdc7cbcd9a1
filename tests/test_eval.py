from phi_tpu.eval.edits import edit_stats
from phi_tpu.eval.scrape import scrape_log


def test_edit_stats():
    st = edit_stats("ACGTACGT", "ACGTACGA")
    assert st.edit_distance == 1
    assert 0.8 < st.identity < 1.0


def test_scrape_log():
    log = """
[M::ILP_function::56.481*3.51] Indexed reads with spectrum size: 138834
[M::ILP_function::57.199*3.48] Filtered/Retained Minimizers: 77.07/22.93%
[M::ILP_function::57.199*3.48] 14.92% Minimizers are in ILP
[M::ILP_function::65.223*3.20] DP sweeps: 4; lower bound: 77.000; path objective: 77.000; gap: 0.000
Recombination count: 0
Recombined haplotypes: >(CHM13.0,[0,4920302])
[M::ILP_function::65.341*3.20] Haplotype of size: 4920303 written to: /tmp/x.fa
[M::main] Real time: 65.341 sec; CPU: 209.1 sec; Peak RSS: 3.211 GB
"""
    d = scrape_log(log)
    assert d["spectrum_size"] == 138834
    assert d["filtered_pct"] == 77.07
    assert d["retained_pct"] == 22.93
    assert d["pct_in_ilp"] == 14.92
    assert d["recombination_count"] == 0
    assert d["real_time"] == 65.341
    assert d["peak_rss_gb"] == 3.211
    assert d["haplotype_size"] == 4920303
    assert d["recombined_haplotypes"] == ">(CHM13.0,[0,4920302])"


def test_plot_matrix(tmp_path):
    csv_path = tmp_path / "m.csv"
    csv_path.write_text(
        "Reads,0.1x,1x\n"
        "APD,\"(10.0, 1.00, 7551)\",\"(12.0, 1.10, 2220)\"\n"
        "DBB,\"(11.0, 1.05, 9000)\",\"(13.0, 1.20, 2500)\"\n")
    from phi_tpu.eval.plots import plot_matrix, read_matrix_csv
    reads, covs, cells = read_matrix_csv(str(csv_path))
    assert reads == ["APD", "DBB"] and covs == ["0.1x", "1x"]
    assert cells[("APD", "1x")] == (12.0, 1.10, 2220)
    out = tmp_path / "fig.png"
    plot_matrix(str(csv_path), str(out))
    assert out.stat().st_size > 1000


def test_truth_vs_panel(tmp_path):
    from phi_tpu.eval.edits import truth_vs_panel
    (tmp_path / "t.fa").write_text(">t\nACGTACGTAC\n")
    (tmp_path / "p1.fa").write_text(">p1\nACGTACGTAC\n")
    (tmp_path / "p2.fa").write_text(">p2\nACGAACGTAC\n")
    st = truth_vs_panel(str(tmp_path / "t.fa"),
                        [str(tmp_path / "p1.fa"), str(tmp_path / "p2.fa")])
    assert st["distances"] == [0, 1]
    assert st["min"] == 0 and st["max"] == 1


def test_heldout_sweep_low_coverage_accuracy(tmp_path, monkeypatch):
    """Leave-target-out coverage sweep (BASELINE config 3): accuracy improves
    with coverage toward the private-variant floor, and the true mosaic's
    switchpoints are recovered at moderate coverage."""
    monkeypatch.setattr("phi_tpu.eval.scale.CACHE_DIR", str(tmp_path))
    from phi_tpu.config import Options
    from phi_tpu.eval.scale import heldout_sweep
    res = heldout_sweep(n_haps=4, length=60_000, coverages=[0.2, 2.0],
                        seed=1, out_csv=str(tmp_path / "sweep.csv"),
                        opt=Options(lagrangian_rounds=2))
    by_cov = {r.coverage: r for r in res}
    lo, hi = by_cov["0.2x"], by_cov["2x"]
    assert hi.edit_distance < lo.edit_distance
    assert hi.recombinations > 0  # target is a mosaic; panel walks alone lose
    assert (tmp_path / "sweep.csv").read_text().startswith("Reads,")


def test_plot_matrix_renders_png(tmp_path):
    csv_path = tmp_path / "m.csv"
    csv_path.write_text(
        "Reads,0.1x,1x\n"
        "APD,\"(10.0, 1.5, 7551)\",\"(20.0, 2.0, 2220)\"\n"
        "DBB,\"(11.0, 1.6, 9000)\",\"(21.0, 2.1, 1500)\"\n")
    out = tmp_path / "fig.png"
    from phi_tpu.eval.plots import main, read_matrix_csv
    reads, covs, cells = read_matrix_csv(str(csv_path))
    assert cells[("APD", "0.1x")] == (10.0, 1.5, 7551)
    assert main([str(csv_path), str(out)]) == 0
    assert out.stat().st_size > 1000  # a real PNG, not an empty file


def test_best_hap_baseline_loses_to_recombination(tmp_path, monkeypatch):
    """The best-single-panel-hap baseline (VG/PanGenie stand-in) must be
    strictly worse than PHI's recombined haplotype on a mosaic target."""
    monkeypatch.setattr("phi_tpu.eval.scale.CACHE_DIR", str(tmp_path))
    from phi_tpu.config import Options
    from phi_tpu.eval.scale import heldout_sweep
    res = heldout_sweep(n_haps=4, length=60_000, coverages=[2.0], seed=1,
                        opt=Options(lagrangian_rounds=2), with_baseline=True)
    by = {r.read_name: r for r in res}
    assert by["besthap"].edit_distance > by["heldout"].edit_distance


def test_datasets_native_steps(tmp_path):
    """preprocess.py-parity native steps: header rewrite, mean length,
    seqkit-sample-n equivalent, coverage titration counts."""
    import gzip

    from phi_tpu.eval.datasets import (build_mhc_dataset,
                                       downsample_by_coverage,
                                       mean_read_length,
                                       rename_chm13_header, sample_n_reads)
    fa = tmp_path / "MHC-CHM13.0.fa"
    fa.write_text(">CHM13#0\nACGT\n")
    rename_chm13_header(str(fa))
    assert fa.read_text() == ">0\nACGT\n"

    fq = tmp_path / "APD.fastq"
    with open(fq, "w") as f:
        for i in range(200):
            f.write(f"@r{i}\n{'A' * 100}\n+\n{'I' * 100}\n")
    assert mean_read_length(str(fq)) == 100.0
    out = tmp_path / "s.fastq"
    kept = sample_n_reads(str(fq), str(out), 50, seed=1)
    assert kept == 50
    lines = out.read_text().strip().split("\n")
    assert len(lines) == 200
    # input order preserved
    ids = [int(l[2:]) for l in lines[::4]]
    assert ids == sorted(ids)

    produced = downsample_by_coverage(str(tmp_path), str(tmp_path / "ds"),
                                      samples=["APD"], coverages=[0.1, 15],
                                      region_len=10_000)
    assert len(produced) == 2
    # 0.1x of 10 kb at 100 bp mean = 10 reads; 15x keeps all 200
    low = (tmp_path / "ds" / "APD_0.1x.fastq").read_text().strip().split("\n")
    assert len(low) == 4 * 10
    full = (tmp_path / "ds" / "APD_15x.fastq").read_text().strip().split("\n")
    assert len(full) == 4 * 200

    # tool-gated steps skip cleanly in this egress-free environment
    report = build_mhc_dataset(str(tmp_path / "data"))
    assert report["panel"].startswith(("done", "skipped"))
    assert report["pangenome"].startswith(("done", "skipped"))
