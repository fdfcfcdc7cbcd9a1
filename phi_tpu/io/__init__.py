from phi_tpu.io.gfa import read_gfa  # noqa: F401
from phi_tpu.io.reads import read_seq_file  # noqa: F401
