from phi_tpu.parallel.sharded import make_mesh, sharded_full_step  # noqa: F401
