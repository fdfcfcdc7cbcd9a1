from phi_tpu.solve.prep import SolverTables, build_solver_tables  # noqa: F401
from phi_tpu.solve.dp import solve_dp  # noqa: F401
from phi_tpu.solve.decode import decode_path, DecodeResult  # noqa: F401
