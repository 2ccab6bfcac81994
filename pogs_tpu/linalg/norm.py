"""Spectral-norm estimation by power iteration (equil_helper.h:107-135)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

NORM_EST_TOL = 1e-4
NORM_EST_MAX_ITER = 50


def norm2_est(A, tol: float = NORM_EST_TOL, max_iter: int = NORM_EST_MAX_ITER, seed: int = 0):
    """Estimate ‖A‖₂ with power iteration on AᵀA (MATLAB normest scheme).

    Runs as an on-device ``lax.while_loop`` with relative-change stopping,
    mirroring Norm2Est in the reference. Deterministic start vector.
    """
    m, n = A.shape
    dt = A.dtype
    if hasattr(A, "mv"):
        amv, armv = A.mv, A.rmv
    else:
        amv, armv = (lambda v: A @ v), (lambda v: A.T @ v)
    x0 = jax.random.uniform(jax.random.PRNGKey(seed), (n,), dtype=jnp.float32).astype(dt)
    tol = jnp.asarray(tol, dt)

    def cond(carry):
        _, norm_est, norm_est_last, i = carry
        return jnp.logical_and(
            jnp.logical_and(i < max_iter, norm_est > 0),
            jnp.abs(norm_est - norm_est_last) >= tol * norm_est,
        )

    def body(carry):
        x, norm_est, _, i = carry
        sx = amv(x)
        x = armv(sx)
        normx = jnp.linalg.norm(x)
        norm_sx = jnp.linalg.norm(sx)
        # A zero operator (A = 0, or a padding-only shard) must yield
        # ‖A‖₂ = 0, not 0/0 = NaN: an NaN estimate poisons nrm_s/nrm_r in
        # the ADMM loop and aborts the solve NAN_FOUND at iteration 0.
        safe = normx > 0
        x = jnp.where(safe, x / jnp.where(safe, normx, 1.0), jnp.zeros_like(x))
        est = jnp.where(norm_sx > 0, normx / norm_sx, jnp.zeros_like(normx))
        return (x, est, norm_est, i + 1)

    # One unconditional first sweep, then iterate to tolerance.
    init = body((x0, jnp.asarray(0.0, dt), jnp.asarray(0.0, dt), 0))
    _, norm_est, _, _ = jax.lax.while_loop(cond, body, init)
    return norm_est
