"""Multi-chip scaling: meshes, sharded problems, batched λ-paths."""

from pogs_tpu.parallel.mesh import make_mesh, shard_matrix, replicate
from pogs_tpu.parallel.batch import (
    solve_lasso_path, batched_graph_solve, batched_cone_solve,
    batched_qp_solve, warm_path_graph_solve, warm_path_cone_solve,
)

__all__ = [
    "make_mesh",
    "shard_matrix",
    "replicate",
    "solve_lasso_path",
    "batched_graph_solve",
    "batched_cone_solve",
    "batched_qp_solve",
    "warm_path_graph_solve",
    "warm_path_cone_solve",
]
