"""Equilibration, norm estimation, CGLS, and projector unit tests."""

import numpy as np
import jax.numpy as jnp

from pogs_tpu.linalg.equil import equilibrate
from pogs_tpu.linalg.norm import norm2_est
from pogs_tpu.linalg.cgls import cgls_solve
from pogs_tpu.projector.direct import DirectProjector
from pogs_tpu.projector.indirect import CglsProjector


def _random_matrix(rng, m, n, scale_rows=True):
    A = rng.normal(size=(m, n))
    if scale_rows:
        # Badly scaled rows/cols to give equilibration something to do.
        A *= np.exp(rng.uniform(-3, 3, size=(m, 1)))
        A *= np.exp(rng.uniform(-3, 3, size=(1, n)))
    return A


def test_equilibrate_consistency(rng):
    A = jnp.asarray(_random_matrix(rng, 40, 25), jnp.float64)
    eq = equilibrate(A)
    # A_eq must equal d * A * e exactly (the scalings fold in normalization).
    np.testing.assert_allclose(
        np.asarray(eq.A),
        np.asarray(A) * np.asarray(eq.d)[:, None] * np.asarray(eq.e)[None, :],
        rtol=1e-10,
    )
    # Frobenius normalization: ||A_eq||_F = sqrt(min(m, n)).
    np.testing.assert_allclose(float(jnp.linalg.norm(eq.A)), np.sqrt(25), rtol=1e-10)


def test_equilibrate_balances_norms(rng):
    A = jnp.asarray(_random_matrix(rng, 60, 40), jnp.float64)
    eq = equilibrate(A)
    rn = np.linalg.norm(np.asarray(eq.A), axis=1)
    cn = np.linalg.norm(np.asarray(eq.A), axis=0)
    # Row and column norms should be much more uniform than the input's.
    assert rn.max() / rn.min() < 4.0
    assert cn.max() / cn.min() < 4.0


def test_norm2_est(rng):
    A = jnp.asarray(rng.normal(size=(50, 30)), jnp.float64)
    est = float(norm2_est(A))
    true = np.linalg.norm(np.asarray(A), 2)
    assert abs(est - true) / true < 1e-3


def test_cgls_matches_direct(rng):
    m, n = 40, 25
    A = jnp.asarray(rng.normal(size=(m, n)), jnp.float64)
    b = jnp.asarray(rng.normal(size=m), jnp.float64)
    shift = 0.7
    x, k = cgls_solve(
        lambda v: A @ v, lambda v: A.T @ v, b, jnp.zeros(n, jnp.float64),
        shift, 1e-12, 200,
    )
    ref = np.linalg.solve(np.asarray(A.T @ A) + shift * np.eye(n), np.asarray(A.T @ b))
    np.testing.assert_allclose(np.asarray(x), ref, rtol=1e-8)
    assert int(k) < 200


def _check_projection(A, x, y, x0, y0, s=1.0, tol=1e-8):
    A, x, y, x0, y0 = map(np.asarray, (A, x, y, x0, y0))
    # Feasibility y = Ax and stationarity A'(Ax - y0) + s (x - x0) = 0.
    np.testing.assert_allclose(y, A @ x, atol=tol)
    kkt = A.T @ (A @ x - y0) + s * (x - x0)
    np.testing.assert_allclose(kkt, 0.0, atol=tol)


def test_direct_projector_tall(rng):
    m, n = 40, 25
    A = jnp.asarray(rng.normal(size=(m, n)) / np.sqrt(m), jnp.float64)
    for method in ("inverse", "cholesky"):
        proj = DirectProjector(method=method)
        factor = proj.init(A, s=1.0)
        x0 = jnp.asarray(rng.normal(size=n), jnp.float64)
        y0 = jnp.asarray(rng.normal(size=m), jnp.float64)
        x, y = proj.project(A, factor, x0, y0)
        _check_projection(A, x, y, x0, y0)


def test_direct_projector_wide(rng):
    m, n = 25, 40
    A = jnp.asarray(rng.normal(size=(m, n)) / np.sqrt(n), jnp.float64)
    for method in ("inverse", "cholesky"):
        proj = DirectProjector(method=method)
        factor = proj.init(A, s=1.0)
        x0 = jnp.asarray(rng.normal(size=n), jnp.float64)
        y0 = jnp.asarray(rng.normal(size=m), jnp.float64)
        x, y = proj.project(A, factor, x0, y0)
        _check_projection(A, x, y, x0, y0)


def test_cgls_projector(rng):
    m, n = 40, 25
    A = jnp.asarray(rng.normal(size=(m, n)) / np.sqrt(m), jnp.float64)
    proj = CglsProjector()
    factor = proj.init(A, s=1.0)
    x0 = jnp.asarray(rng.normal(size=n), jnp.float64)
    y0 = jnp.asarray(rng.normal(size=m), jnp.float64)
    x, y = proj.project(A, factor, x0, y0, tol=1e-12, x_warm=x0)
    _check_projection(A, x, y, x0, y0, tol=1e-6)
