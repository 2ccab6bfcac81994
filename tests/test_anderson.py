"""Anderson acceleration: unit behavior + solver integration."""

import numpy as np
import pytest
import jax.numpy as jnp

from pogs_tpu.solver.anderson import anderson_init, anderson_step
from pogs_tpu import (
    Function, FunctionVector, GraphFormSolver, SolverSettings, Status,
)


def test_anderson_accelerates_linear_contraction(rng):
    """AA should beat plain iteration on x <- Mx + b with slow contraction."""
    n = 20
    Q = rng.normal(size=(n, n))
    Q, _ = np.linalg.qr(Q)
    M = Q @ np.diag(np.linspace(0.1, 0.97, n)) @ Q.T  # spectral radius 0.97
    bvec = rng.normal(size=n)
    x_star = np.linalg.solve(np.eye(n) - M, bvec)
    Mj = jnp.asarray(M, jnp.float64)
    bj = jnp.asarray(bvec, jnp.float64)

    def G(x):
        return Mj @ x + bj

    # plain iteration
    x = jnp.zeros(n, jnp.float64)
    for _ in range(50):
        x = G(x)
    err_plain = float(jnp.linalg.norm(x - jnp.asarray(x_star)))

    # AA iteration
    x = jnp.zeros(n, jnp.float64)
    st = anderson_init(n, 5, jnp.float64)
    for _ in range(50):
        x_new = G(x)
        x, st = anderson_step(st, x, x_new)
    err_aa = float(jnp.linalg.norm(x - jnp.asarray(x_star)))

    assert err_aa < err_plain * 1e-3, (err_aa, err_plain)


def test_anderson_solver_integration(rng):
    """use_anderson=True must still converge to the right answer."""
    m, n = 60, 30
    A = rng.normal(size=(m, n))
    b = rng.normal(size=m)
    lam = 0.2 * np.max(np.abs(A.T @ b))
    f = FunctionVector(Function.SQUARE, m, b=b, dtype=jnp.float64)
    g = FunctionVector(Function.ABS, n, c=lam, dtype=jnp.float64)

    base = SolverSettings(abs_tol=1e-7, rel_tol=1e-7)
    res_plain = GraphFormSolver(A, dtype=jnp.float64).solve(f, g, settings=base)
    res_aa = GraphFormSolver(A, dtype=jnp.float64).solve(
        f, g, settings=base.replace(use_anderson=True))
    assert res_aa.status == Status.SUCCESS
    np.testing.assert_allclose(np.asarray(res_aa.x), np.asarray(res_plain.x),
                               atol=1e-4)


def test_anderson_hsde_lp():
    import pytest
    """Anderson-accelerated HSDE still solves the LP correctly
    (safeguarded type-II AA on the DR fixed point, arXiv:1908.11482)."""
    import numpy as np
    from pogs_tpu.types import Cone, ConeConstraint, SolverSettings, Status
    from pogs_tpu.solver.cone import ConeSolver

    A = np.array([[1.0, 1.0], [-1.0, 0.0], [0.0, -1.0]])
    b = np.array([1.0, 0.0, 0.0])
    c = np.array([1.0, 2.0])
    Ky = [ConeConstraint(Cone.ZERO, [0]), ConeConstraint(Cone.NON_NEG, [1, 2])]

    st = SolverSettings(abs_tol=1e-7, rel_tol=1e-7, use_anderson=True)
    solver = ConeSolver(A, Ky=Ky, settings=st, dtype="float64")
    res = solver.solve(b, c)
    assert res.status == Status.SUCCESS
    assert float(res.optval) == pytest.approx(1.0, abs=1e-4)
