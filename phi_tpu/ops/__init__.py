from phi_tpu.ops.search import pair_searchsorted  # noqa: F401
