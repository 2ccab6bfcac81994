"""Conjugate-Gradient Least Squares with shift, as an on-device while_loop.

Solves   minimize ‖A x − b‖² + shift ‖x‖²   from a warm start x0.

TPU-native counterpart of src/cpu/include/cgls.h (convergence when
‖s‖ ≤ tol·‖s₀‖ or tol·‖x‖ ≥ 1, with s = Aᵀr − shift·x, cgls.h:298-305).
The operator is passed as a pair of closures so dense, sharded, and sparse
matvecs all reuse the same loop.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def cgls_solve(
    matvec: Callable,
    rmatvec: Callable,
    b,
    x0,
    shift,
    tol,
    max_iter: int = 500,
):
    """Returns (x, iterations). All inputs may be traced."""
    dt = b.dtype
    shift = jnp.asarray(shift, dt)
    tol = jnp.asarray(tol, dt)
    eps = jnp.asarray(jnp.finfo(dt).eps, dt)

    r = b - matvec(x0)
    s = rmatvec(r) - shift * x0
    p = s
    norms0 = jnp.linalg.norm(s)
    gamma = norms0 * norms0

    def cond(carry):
        x, r, p, gamma, k, done = carry
        return jnp.logical_and(k < max_iter, jnp.logical_not(done))

    def body(carry):
        x, r, p, gamma, k, _ = carry
        q = matvec(p)
        normp2 = jnp.vdot(p, p)
        normq2 = jnp.vdot(q, q)
        delta = normq2 + shift * normp2
        delta = jnp.where(delta <= 0, eps, delta)
        alpha = gamma / delta
        x = x + alpha * p
        r = r - alpha * q
        s = rmatvec(r) - shift * x
        gamma_new = jnp.vdot(s, s)
        beta = gamma_new / gamma
        p = s + beta * p
        norms = jnp.sqrt(gamma_new)
        normx = jnp.linalg.norm(x)
        done = jnp.logical_or(norms <= norms0 * tol, normx * tol >= 1.0)
        return (x, r, p, gamma_new, k + 1, done)

    init_done = norms0 < eps
    x, _, _, _, k, _ = jax.lax.while_loop(
        cond, body, (x0, r, p, gamma, jnp.asarray(0, jnp.int32), init_done)
    )
    return x, k
