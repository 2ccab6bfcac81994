"""End-to-end conic solves on CVXPY-free SCS-convention fixtures
(VERDICT round-2 item 6).

Each test drives ``solve_cone_problem`` — the exact entry the cvxpy
ConicSolver plugin calls (api/cvxpy_interface.py:369-377) — on fabricated
`(c, A, b, dims)` data, checking the optimal value against an oracle that
does not involve the solver under test (analytic geometry, scipy HiGHS,
or scipy SLSQP).  The SDP fixture runs with ``assume_svec=True``, the
plugin's setting, so the √2-svec row/column rescaling path is exercised
without cvxpy.  Reference counterpart: python/test_cvxpy_interface.py +
tests/test_cvx.py (which require cvxpy and therefore skip here).
"""

import numpy as np
import pytest

from pogs_tpu.api.cone import solve_cone_problem
from pogs_tpu.api.cvxpy_interface import _scs_dims_to_dict
from pogs_tpu.types import Status

from tests import conic_fixtures as fx

F64 = dict(dtype=np.float64, abs_tol=1e-6, rel_tol=1e-6, max_iter=10000)


def _solve(fixture, **kw):
    args = dict(F64)
    args.update(kw)
    return solve_cone_problem(fixture["c"], fixture["A"], fixture["b"],
                              fixture["dims"], P=fixture.get("P"), **args)


def test_lp_fixture_vs_highs():
    from scipy.optimize import linprog

    f = fx.lp_fixture()
    c, G, h, A_eq, b_eq = f["lp_data"]
    ref = linprog(c, A_ub=G, b_ub=h, A_eq=A_eq, b_eq=b_eq,
                  bounds=[(None, None)] * len(c), method="highs")
    assert ref.status == 0
    out = _solve(f)
    assert out["status"] == int(Status.SUCCESS)
    assert out["optval"] == pytest.approx(ref.fun, rel=1e-6, abs=1e-6)


def test_qp_fixture_vs_slsqp():
    from scipy.optimize import minimize

    f = fx.qp_fixture()
    P, c, n = f["P"], f["c"], len(f["c"])
    ref = minimize(
        lambda x: 0.5 * x @ P @ x + c @ x, np.zeros(n),
        jac=lambda x: P @ x + c,
        constraints=[{"type": "eq", "fun": lambda x: x.sum() - 1.0,
                      "jac": lambda x: np.ones(n)}],
        bounds=[(-1.0, 1.0)] * n, method="SLSQP",
        options={"maxiter": 500, "ftol": 1e-12})
    out = _solve(f)
    assert out["status"] == int(Status.SUCCESS)
    assert out["optval"] == pytest.approx(float(ref.fun), rel=1e-6, abs=1e-6)


def test_socp_fixture_analytic():
    f = fx.socp_fixture()
    out = _solve(f)
    assert out["status"] == int(Status.SUCCESS)
    assert out["optval"] == pytest.approx(f["optval"], rel=1e-5)
    np.testing.assert_allclose(
        out["x"], -f["c"] / np.linalg.norm(f["c"]), atol=1e-4)


def test_socp_ls_fixture_analytic():
    f = fx.socp_ls_fixture()
    out = _solve(f)
    assert out["status"] == int(Status.SUCCESS)
    assert out["optval"] == pytest.approx(f["optval"], rel=1e-5, abs=1e-6)


def test_sdp_fixture_svec_path():
    """λ_min SDP through the plugin's assume_svec=True convention."""
    f = fx.sdp_fixture()
    out = _solve(f, assume_svec=True)
    assert out["status"] == int(Status.SUCCESS)
    assert out["optval"] == pytest.approx(f["optval"], rel=1e-4, abs=1e-5)
    # Reconstruct X from the svec variable and verify feasibility: the
    # optimizer is the rank-1 projector onto C's minimal eigenvector.
    d, x = f["d"], np.asarray(out["x"])
    X = np.zeros((d, d))
    kk = 0
    for j in range(d):
        for i in range(j, d):
            v = x[kk] / (1.0 if i == j else np.sqrt(2.0))
            X[i, j] = X[j, i] = v
            kk += 1
    assert np.trace(X) == pytest.approx(1.0, abs=1e-5)
    evals = np.linalg.eigvalsh(X)
    assert evals.min() >= -1e-5
    assert np.trace(f["C"] @ X) == pytest.approx(f["optval"], abs=1e-4)


def test_exp_primal_fixture_analytic():
    f = fx.exp_primal_fixture()
    out = _solve(f)
    assert out["status"] == int(Status.SUCCESS)
    assert out["optval"] == pytest.approx(f["optval"], rel=1e-4)


def test_exp_dual_fixture_analytic():
    f = fx.exp_dual_fixture()
    out = _solve(f)
    assert out["status"] == int(Status.SUCCESS)
    assert out["optval"] == pytest.approx(f["optval"], rel=1e-4, abs=1e-6)


def test_mixed_fixture_vs_slsqp():
    from scipy.optimize import minimize

    f = fx.mixed_fixture()
    c, x0, r, n = f["c"], f["x0"], f["r"], len(f["c"])
    ref = minimize(
        lambda x: c @ x, x0, jac=lambda x: c,
        constraints=[
            {"type": "eq", "fun": lambda x: x.sum() - 1.0,
             "jac": lambda x: np.ones(n)},
            {"type": "ineq", "fun": lambda x: r**2 - (x - x0) @ (x - x0),
             "jac": lambda x: -2.0 * (x - x0)},
        ],
        bounds=[(0.0, None)] * n, method="SLSQP",
        options={"maxiter": 500, "ftol": 1e-12})
    assert ref.success
    out = _solve(f)
    assert out["status"] == int(Status.SUCCESS)
    assert out["optval"] == pytest.approx(float(ref.fun), rel=1e-4, abs=1e-5)


def test_scs_dims_adapter_matches_plugin():
    """_scs_dims_to_dict consumes cvxpy's ConeDims attribute names; feed it
    a stub with those attributes and check the translation the plugin
    performs before calling solve_cone_problem."""

    class StubDims:
        zero = 2
        nonneg = 5
        soc = [3, 4]
        psd = [2]
        exp = 1

    d = _scs_dims_to_dict(StubDims())
    assert d == {"f": 2, "l": 5, "q": [3, 4], "s": [2], "ep": 1, "ed": 0}
