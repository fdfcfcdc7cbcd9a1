from phi_tpu.sketch.minimizer import sketch_sequence, sketch_read_batch  # noqa: F401
