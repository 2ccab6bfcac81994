"""Dense/sparse linear-algebra substrate (equilibration, norms, CGLS)."""

from pogs_tpu.linalg.equil import equilibrate, sinkhorn_knopp, EquilResult
from pogs_tpu.linalg.norm import norm2_est
from pogs_tpu.linalg.cgls import cgls_solve

__all__ = ["equilibrate", "sinkhorn_knopp", "EquilResult", "norm2_est", "cgls_solve"]
