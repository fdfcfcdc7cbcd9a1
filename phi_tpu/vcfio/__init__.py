from phi_tpu.vcfio.vcf2graph import vcf_to_graph  # noqa: F401
