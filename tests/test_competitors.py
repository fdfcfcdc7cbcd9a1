"""Competitor runners (eval/competitors.py): command pipelines are exercised
with stub executables (the real vg/kmc/PanGenie are not installable here);
the native post-processing (hom-genotype consensus, reverse complement,
edit scoring) is tested for real."""

import os
import stat
import textwrap

from phi_tpu.eval.competitors import (competitor_matrix, hom_consensus,
                                      revcomp, run_pangenie, run_vg)


def _write_exe(path, body):
    with open(path, "w") as f:
        f.write("#!/bin/sh\n" + textwrap.dedent(body))
    os.chmod(path, os.stat(path).st_mode | stat.S_IEXEC)


def test_revcomp():
    assert revcomp("ACGTN") == "NACGT"
    assert revcomp(revcomp("GATTACA")) == "GATTACA"


def test_hom_consensus(tmp_path):
    ref = tmp_path / "ref.fa"
    ref.write_text(">chr1\nACGTACGTACGT\n")
    vcf = tmp_path / "g.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.2\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n"
        "chr1\t2\t.\tC\tT\t.\t.\t.\tGT\t1/1\n"    # hom SNP -> applied
        "chr1\t5\t.\tA\tG\t.\t.\t.\tGT\t0/1\n"    # het -> skipped
        "chr1\t7\t.\tGT\tG\t.\t.\t.\tGT\t1/1\n"   # hom deletion -> applied
        "chr1\t8\t.\tT\tA\t.\t.\t.\tGT\t1/1\n")   # overlaps deletion -> skipped
    out = tmp_path / "cons.fa"
    total, hom, het = hom_consensus(str(vcf), str(ref), str(out))
    assert (total, hom, het) == (4, 3, 1)
    body = "".join(l.strip() for l in out.read_text().splitlines()[1:])
    # A C>T G T A C G(T del) A C G T
    assert body == "ATGTACGACGT"


def test_runners_skip_without_tools(tmp_path, monkeypatch):
    monkeypatch.setenv("PATH", str(tmp_path))  # empty PATH dir
    r = run_vg("g.gbz", "r.fq", str(tmp_path / "o.fa"))
    assert r.skipped and "vg" in r.skipped
    r = run_pangenie("r.fq", "ref.fa", "v.vcf", str(tmp_path / "o2.fa"))
    assert r.skipped and "PanGenie" in r.skipped


def test_run_vg_stub_pipeline(tmp_path, monkeypatch):
    bindir = tmp_path / "bin"
    bindir.mkdir()
    calls = tmp_path / "calls.log"
    # stub vg: records subcommands; `paths` emits a FASTA on stdout
    _write_exe(bindir / "vg", f"""\
        echo "vg $1" >> {calls}
        if [ "$1" = "paths" ]; then printf '>recombination\\nACGTTT\\n'; fi
        exit 0
        """)
    _write_exe(bindir / "kmc", f'echo "kmc" >> {calls}\nexit 0\n')
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")
    out = tmp_path / "vg_out.fa"
    res = run_vg("graph.gbz", "reads.fq", str(out), threads=2,
                 tmp_dir=str(tmp_path / "tmp"))
    assert res.skipped is None and res.out_fa == str(out)
    seq = "".join(l.strip() for l in out.read_text().splitlines()[1:])
    assert seq == revcomp("ACGTTT")  # seqtk seq -r step
    seq_calls = calls.read_text().splitlines()
    # vg_haplotypes.py order: index, gbwt, haplotypes, kmc, haplotypes, paths
    assert seq_calls == ["vg index", "vg gbwt", "vg haplotypes", "kmc",
                         "vg haplotypes", "vg paths"]


def test_run_pangenie_stub_and_matrix(tmp_path, monkeypatch):
    bindir = tmp_path / "bin"
    bindir.mkdir()
    ref = tmp_path / "ref.fa"
    ref.write_text(">chr1\nACGTACGT\n")
    # stub PanGenie: writes <prefix>_genotyping.vcf with one hom SNP
    _write_exe(bindir / "PanGenie", """\
        prefix=""
        while [ $# -gt 0 ]; do
          if [ "$1" = "-o" ]; then prefix="$2"; fi
          shift
        done
        cat > "${prefix}_genotyping.vcf" <<'EOF'
##fileformat=VCFv4.2
#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO	FORMAT	S
chr1	4	.	T	C	.	.	.	GT	1/1
EOF
        """)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")
    out = tmp_path / "pg_out.fa"
    res = run_pangenie("reads.fq", str(ref), "in.vcf", str(out))
    assert res.skipped is None
    seq = "".join(l.strip() for l in out.read_text().splitlines()[1:])
    assert seq == "ACGCACGT"

    truth = tmp_path / "truth.fa"
    truth.write_text(">t\nACGTACGT\n")
    csv_path = tmp_path / "pg.csv"
    rows = competitor_matrix(
        "PanGenie", [("S", "1x", "reads.fq", str(truth))],
        ref_path=str(ref), vcf_path="in.vcf", out_csv=str(csv_path),
        work_dir=str(tmp_path / "work"))
    assert len(rows) == 1 and rows[0].edit_distance == 1
    assert "(0." in csv_path.read_text() or "(" in csv_path.read_text()
