"""Shared utilities."""

from pogs_tpu.utils.precision import highest_precision
from pogs_tpu.utils.qps import (
    load_qps,
    loads_qps,
    qps_to_solve_qp_kwargs,
    save_qps,
)

__all__ = [
    "highest_precision",
    "load_qps",
    "loads_qps",
    "qps_to_solve_qp_kwargs",
    "save_qps",
]
