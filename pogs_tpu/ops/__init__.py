"""Pallas TPU kernels for the solver hot paths.

SURVEY.md §7 step 10: custom kernels where XLA fusion falls short.  The
flagship is :mod:`pogs_tpu.ops.fused_admm` — the whole ADMM while-loop as
one VMEM-resident Pallas kernel for problems that fit on-chip.
"""

from pogs_tpu.ops.fused_admm import (
    fused_admm_eligible,
    fused_admm_loop,
    pad_to,
)
from pogs_tpu.ops.fused_hsde import (
    fused_hsde_eligible,
    fused_hsde_solve,
)

__all__ = [
    "fused_admm_eligible", "fused_admm_loop", "pad_to",
    "fused_hsde_eligible", "fused_hsde_solve",
]
