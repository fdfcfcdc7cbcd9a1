from phi_tpu.graph.pangenome import PangenomeGraph, tensorize  # noqa: F401
