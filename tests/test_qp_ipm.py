"""Host IPM fast path (solver/qp_ipm.py) — VERDICT round-3 item 4.

The IPM is the mid-size-QP seed/solve accelerator: Mehrotra predictor-
corrector with a sparse-or-dense KKT factorization per step, certified by
the same relative KKT residuals the PDAS polish uses.  These tests pin:

  * standalone convergence + certificates across problem structures
    (sparse CVXQP, dense DUAL-style, equality-only, degenerate rows),
  * the full solve-path integration (solve_cone with P routes through
    the IPM first and returns SUCCESS with a tight certificate),
  * the fall-through contract: infeasible problems must NOT be claimed
    solved by the IPM — the splitting path owns certificates.

Reference contrast: the reference's QP handling stops at a warning about
the HSDE/QP mismatch (src/cpu/pogs.cpp:1935-1944); it has no
direct-method QP path at all.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "benchmarks"))

from maros_meszaros import (  # noqa: E402
    cvxqp_problem, dual_style, problems, solve_with_pogs_tpu, to_cone_form,
)

from pogs_tpu.types import Cone, ConeConstraint, Status  # noqa: E402
from pogs_tpu.solver.qp_ipm import ipm_solve  # noqa: E402
from pogs_tpu.solver.qp_polish import kkt_residuals, row_kinds  # noqa: E402


def _cones(m, n_eq):
    Ky = []
    if n_eq:
        Ky.append(ConeConstraint(Cone.ZERO, range(n_eq)))
    if m > n_eq:
        Ky.append(ConeConstraint(Cone.NON_NEG, range(n_eq, m)))
    return Ky


def _run_ipm(p, tol=1e-9):
    P, c, A_bar, b_bar, n_eq = to_cone_form(p)
    kind = row_kinds(A_bar.shape[0], _cones(A_bar.shape[0], n_eq))
    out = ipm_solve(P, c, A_bar, b_bar, kind, tol=tol)
    assert out is not None, f"IPM failed on {p['name']}"
    res = kkt_residuals(P, c, A_bar, b_bar, kind, out["x"], out["lam"])
    return out, res, (P, c)


@pytest.mark.parametrize("variant,optval", [
    (1, 1.1590718e4), (2, 8.1209405e3), (3, 1.1943432e4),
])
def test_ipm_cvxqp_small_published_optima(variant, optval):
    p = cvxqp_problem(variant, 100, optval)
    out, res, (P, c) = _run_ipm(p)
    assert max(res.values()) < 1e-9
    obj = 0.5 * out["x"] @ (P @ out["x"]) + c @ out["x"] + p["c0"]
    assert abs(obj - optval) / abs(optval) < 1e-6


def test_ipm_hs_family_and_structures():
    """Tiny HS problems (dense route), including the equality-only ones
    that exercise the refined single-solve branch."""
    for p in problems():
        out, res, _ = _run_ipm(p)
        assert max(res.values()) < 1e-8, (p["name"], res)


def test_ipm_degenerate_duplicate_rows():
    p = cvxqp_problem(1, 100, 1.1590718e4, name="DEGEN", duplicate_rows=10)
    out, res, (P, c) = _run_ipm(p)
    assert max(res.values()) < 1e-9
    obj = 0.5 * out["x"] @ (P @ out["x"]) + c @ out["x"]
    assert abs(obj - p["optval"]) / abs(p["optval"]) < 1e-6


def test_ipm_dense_covariance_qp():
    """DUAL-style dense ill-conditioned covariance QP takes the dense
    KKT route (density ~1)."""
    p = dual_style(n=150, cond=1e6)
    out, res, _ = _run_ipm(p)
    assert max(res.values()) < 1e-9
    # Simplex feasibility of the solution itself.
    assert abs(out["x"].sum() - 1.0) < 1e-8
    assert out["x"].min() > -1e-9


def test_ipm_duals_match_cone_convention():
    """lam must satisfy stationarity with the cone sign convention
    (lam >= 0 on NonNeg rows) — the contract kkt_residuals certifies."""
    p = cvxqp_problem(1, 100, np.nan)
    out, res, _ = _run_ipm(p)
    assert res["sign"] == 0.0
    assert res["stat"] < 1e-9


def test_solve_path_cvxqp1m_fast_and_certified():
    """Full solve path: CVXQP1_M (n=1000) must SUCCEED with a tight
    solver-independent certificate — the round-4 '<= 2 s warm' target is
    enforced as a structural property here (the IPM route, not staged
    HSDE segments: <= 60 reported iterations instead of ~500)."""
    from maros_meszaros import kkt_certificate

    p = cvxqp_problem(1, 1000, 1.0875115673e6)
    res = solve_with_pogs_tpu(p, dtype=np.float64)
    assert res["status"] == int(Status.SUCCESS)
    assert res["num_iters"] <= 60
    assert abs(res["objective"] - p["optval"]) / p["optval"] < 1e-8
    cert = kkt_certificate(p, res["x"])
    assert max(cert.values()) < 1e-9


def test_solve_path_n2000_success():
    """VERDICT item 4 'done' condition: an n >= 2000 instance solves
    SUCCESS (previously excluded by K_QP_STAGED_N_MAX=2000)."""
    from maros_meszaros import kkt_certificate

    p = cvxqp_problem(1, 2000, np.nan)
    res = solve_with_pogs_tpu(p, dtype=np.float64)
    assert res["status"] == int(Status.SUCCESS)
    cert = kkt_certificate(p, res["x"])
    assert max(cert.values()) < 1e-8


def test_ipm_returns_none_on_infeasible():
    """x >= 1 and x <= 0: the IPM must fall through (None), leaving the
    INFEASIBLE certificate to the HSDE path (tested end-to-end in
    test_qp_api.py)."""
    n = 8
    P = np.eye(n)
    c = np.zeros(n)
    A = np.vstack([np.eye(n), -np.eye(n)])
    b = np.concatenate([np.zeros(n), -np.ones(n)])  # x <= 0, -x <= -1
    kind = np.ones(2 * n, np.int8)
    out = ipm_solve(P, c, A, b, kind, tol=1e-9, max_iter=30)
    if out is not None:  # if it "converged", the certificate must reject
        res = kkt_residuals(P, c, A, b, kind, out["x"], out["lam"])
        assert max(res.values()) > 1e-6
