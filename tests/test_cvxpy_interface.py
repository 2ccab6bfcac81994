"""CVXPY integration tests (skipped when cvxpy is not installed).

Mirrors python/test_cvxpy_graphform.py and python/test_cvxpy_interface.py:
graph-form detection for lasso/ridge, value agreement with the conic path,
and the registered ConicSolver plugin on LP/SOCP.
"""

import numpy as np
import pytest

cp = pytest.importorskip("cvxpy")

from pogs_tpu.api.cvxpy_interface import (  # noqa: E402
    detect_graph_form, pogs_solve, register_solver,
)


@pytest.fixture(scope="module", autouse=True)
def _register():
    assert register_solver()


def test_detect_lasso(rng):
    A = rng.normal(size=(30, 10))
    b = rng.normal(size=30)
    x = cp.Variable(10)
    prob = cp.Problem(cp.Minimize(0.5 * cp.sum_squares(A @ x - b)
                                  + 0.3 * cp.norm(x, 1)))
    det = detect_graph_form(prob)
    assert det is not None and det["type"] == "lasso"
    np.testing.assert_allclose(det["params"]["lambd"], 0.3)


def test_detect_ridge(rng):
    A = rng.normal(size=(30, 10))
    b = rng.normal(size=30)
    x = cp.Variable(10)
    prob = cp.Problem(cp.Minimize(0.5 * cp.sum_squares(A @ x - b)
                                  + 0.2 * cp.sum_squares(x)))
    det = detect_graph_form(prob)
    assert det is not None and det["type"] == "ridge"


def test_detect_nonneg_ls(rng):
    A = rng.normal(size=(30, 10))
    b = rng.normal(size=30)
    x = cp.Variable(10)
    prob = cp.Problem(cp.Minimize(0.5 * cp.sum_squares(A @ x - b)), [x >= 0])
    det = detect_graph_form(prob)
    assert det is not None and det["type"] == "nonneg_ls"


def test_pogs_solve_lasso_matches_cvxpy(rng):
    A = rng.normal(size=(40, 15))
    b = rng.normal(size=40)
    lam = 0.2 * np.max(np.abs(A.T @ b))
    x = cp.Variable(15)
    prob = cp.Problem(cp.Minimize(0.5 * cp.sum_squares(A @ x - b)
                                  + lam * cp.norm(x, 1)))
    val = pogs_solve(prob, abs_tol=1e-7, rel_tol=1e-7)
    ref = cp.Problem(cp.Minimize(0.5 * cp.sum_squares(A @ x - b)
                                 + lam * cp.norm(x, 1))).solve()
    np.testing.assert_allclose(val, ref, rtol=1e-3)


def test_plugin_lp(rng):
    n = 8
    x = cp.Variable(n)
    c = rng.normal(size=n)
    prob = cp.Problem(cp.Minimize(c @ x), [x >= -1, x <= 1])
    val = prob.solve(solver="POGS_TPU", abs_tol=1e-6, rel_tol=1e-6,
                     max_iter=20000)
    np.testing.assert_allclose(val, -np.sum(np.abs(c)), atol=1e-3)
    np.testing.assert_allclose(np.asarray(x.value), -np.sign(c), atol=1e-3)


def test_plugin_socp(rng):
    n = 6
    x = cp.Variable(n)
    c = rng.normal(size=n)
    prob = cp.Problem(cp.Minimize(c @ x), [cp.norm(x, 2) <= 1])
    val = prob.solve(solver="POGS_TPU", abs_tol=1e-6, rel_tol=1e-6,
                     max_iter=20000)
    np.testing.assert_allclose(val, -np.linalg.norm(c), atol=1e-3)
