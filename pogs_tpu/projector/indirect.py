"""Indirect (CGLS) graph projector — for sparse / very large A.

Counterpart of ProjectorCgls (src/cpu/projector/projector_cgls.cpp:52-88):
warm-started delta formulation — solve

    minimize ‖A Δx − (y0 − A x0)‖² + s ‖Δx‖²

by CGLS (numerically stabler than CG on the normal equations), then
x = x0 + Δx, y = A x.  The inner iteration is an on-device while_loop with
a residual-tied tolerance supplied by the ADMM loop.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from pogs_tpu.linalg.cgls import cgls_solve

_PRECISION = lax.Precision.HIGHEST


class CglsProjector:
    def __init__(self, max_iter: int = 500):
        self.max_iter = max_iter

    def init(self, A, s=1.0):
        return {"s": jnp.asarray(s, A.dtype)}

    def project(self, A, factor, x0, y0, tol, x_warm=None):
        s = factor["s"]

        if hasattr(A, "mv"):
            matvec, rmatvec = A.mv, A.rmv
        else:
            def matvec(v):
                return jnp.matmul(A, v, precision=_PRECISION)

            def rmatvec(v):
                return jnp.matmul(A.T, v, precision=_PRECISION)

        b = y0 - matvec(x0)
        dx0 = (x_warm - x0) if x_warm is not None else jnp.zeros_like(x0)
        dx, _ = cgls_solve(matvec, rmatvec, b, dx0, s, tol, self.max_iter)
        x = x0 + dx
        y = matvec(x)
        return x, y
