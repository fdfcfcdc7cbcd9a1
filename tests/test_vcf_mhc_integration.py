"""BASELINE config 2: VCF input path on the real reference fixtures —
vcf2graph(MHC_4.vcf.gz + MHC-CHM13.0.fa.gz) + CHM13 reads must reproduce the
CHM13 haplotype exactly (the reference runs this through vcf2gfa.py + vg)."""

import gzip

import pytest

from phi_tpu import native
from phi_tpu.anchors.join import build_anchor_tables, sketch_haplotypes
from phi_tpu.config import Options
from phi_tpu.graph import tensorize
from phi_tpu.io.reads import load_read_batch
from phi_tpu.pipeline import _solve_with_refinement
from phi_tpu.sketch.minimizer import sketch_read_batch
from phi_tpu.vcfio import vcf_to_graph

VCF = "/root/reference/test/MHC_4.vcf.gz"
REF = "/root/reference/test/MHC-CHM13.0.fa.gz"
READS = "/root/reference/test/CHM13_reads.fq.gz"


@pytest.mark.slow
def test_vcf_input_reproduces_chm13():
    G = tensorize(vcf_to_graph(VCF, REF))
    assert G.num_walks == 5  # REF + HG002 x2 + HG005 x2
    reads = load_read_batch(READS)
    opt = Options()
    spectrum = sketch_read_batch(reads.codes, opt.k, opt.w, reads.lengths)
    sk = sketch_haplotypes(G, opt.k, opt.w)
    an = build_anchor_tables(G, opt.k, sk, spectrum, opt.threshold)
    res = _solve_with_refinement(G, an, opt)
    out = G.path_seq(res.vertices)
    truth = []
    with gzip.open(REF, "rt") as f:
        for line in f:
            if not line.startswith(">"):
                truth.append(line.strip())
    assert native.edit_distance(out, "".join(truth)) == 0
    assert res.true_objective == pytest.approx(res.dp_objective, abs=0.5)
