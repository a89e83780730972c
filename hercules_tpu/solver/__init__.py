from .assemble import SolverTables, assemble
from .step import make_step, run_solver
