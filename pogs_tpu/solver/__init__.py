"""Solver cores: graph-form ADMM (and cone/HSDE — see pogs_tpu.cone)."""

from pogs_tpu.solver.admm import LoopState as SolverState, admm_loop
from pogs_tpu.solver.graph import GraphFormSolver, admm_solve

__all__ = ["SolverState", "admm_loop", "GraphFormSolver", "admm_solve"]
