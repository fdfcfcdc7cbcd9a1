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
