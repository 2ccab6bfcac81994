"""Packaged QP API (api/qp.py): solve_qp vs SLSQP/closed-form oracles,
dual splitting + KKT checks, warm re-solve, sparse inputs.

The reference has no user-facing QP entry (its QP-via-HSDE is broken by
its own admission, src/cpu/pogs.cpp:1510-1514); these tests pin the
pogs_tpu-only surface end to end.
"""

import numpy as np
import pytest
import scipy.sparse as sp
from scipy.optimize import minimize

from pogs_tpu import Status, solve_qp

TOL = dict(abs_tol=1e-7, rel_tol=1e-7, max_iter=20000, dtype=np.float64)


def _rand_qp(rng, n=12, n_eq=3, n_in=8, cond=100.0):
    Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    P = Q @ np.diag(np.geomspace(1.0, cond, n)) @ Q.T
    q = rng.standard_normal(n)
    A = rng.standard_normal((n_eq, n))
    b = rng.standard_normal(n_eq)
    G = rng.standard_normal((n_in, n))
    # h chosen so some constraints are active, some slack
    x0 = rng.standard_normal(n) * 0.1
    h = G @ x0 + np.where(rng.random(n_in) < 0.5, 0.0, 0.8)
    return P, q, G, h, A, b


def _slsqp(P, q, G=None, h=None, A=None, b=None, lb=None, ub=None):
    n = q.shape[0]
    cons = []
    if G is not None:
        cons.append({"type": "ineq", "fun": lambda x: h - G @ x,
                     "jac": lambda x: -G})
    if A is not None:
        cons.append({"type": "eq", "fun": lambda x: A @ x - b,
                     "jac": lambda x: A})
    bounds = None
    if lb is not None or ub is not None:
        lo = np.full(n, -np.inf) if lb is None else lb
        hi = np.full(n, np.inf) if ub is None else ub
        bounds = list(zip(lo, hi))
    res = minimize(lambda x: 0.5 * x @ P @ x + q @ x, np.zeros(n),
                   jac=lambda x: P @ x + q, constraints=cons, bounds=bounds,
                   method="SLSQP", options={"maxiter": 500, "ftol": 1e-14})
    assert res.success, res.message
    return res


def test_qp_eq_ineq_vs_slsqp(rng):
    P, q, G, h, A, b = _rand_qp(rng)
    ref = _slsqp(P, q, G, h, A, b)
    out = solve_qp(P, q, G=G, h=h, A=A, b=b, **TOL)
    assert Status(out["status"]) == Status.SUCCESS
    assert out["optval"] == pytest.approx(ref.fun, rel=1e-6, abs=1e-7)
    np.testing.assert_allclose(out["x"], ref.x, atol=2e-5)


def test_qp_dual_kkt(rng):
    P, q, G, h, A, b = _rand_qp(rng)
    out = solve_qp(P, q, G=G, h=h, A=A, b=b, **TOL)
    y, z = out["y_eq"], out["z_ineq"]
    scale = 1.0 + max(np.abs(P @ out["x"] + q).max(), np.abs(h).max())
    # stationarity: Px + q + A'y + G'z = 0
    stat = P @ out["x"] + q + A.T @ y + G.T @ z
    assert np.abs(stat).max() < 1e-5 * scale
    # dual feasibility + complementarity on the inequality block
    s = h - G @ out["x"]
    assert z.min() > -1e-7 * scale
    assert np.abs(z * s).max() < 1e-5 * scale


def test_qp_bounds_only_box(rng):
    n = 10
    Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    P = Q @ np.diag(np.geomspace(1.0, 50.0, n)) @ Q.T
    q = rng.standard_normal(n) * 3
    lb = -0.4 * np.ones(n)
    ub = 0.3 * np.ones(n)
    ref = _slsqp(P, q, lb=lb, ub=ub)
    out = solve_qp(P, q, lb=lb, ub=ub, **TOL)
    assert Status(out["status"]) == Status.SUCCESS
    np.testing.assert_allclose(out["x"], ref.x, atol=2e-5)
    assert out["x"].min() >= lb[0] - 1e-6 and out["x"].max() <= ub[0] + 1e-6
    # bound-dual stationarity: Px + q + z_ub - z_lb = 0
    stat = P @ out["x"] + q + out["z_ub"] - out["z_lb"]
    assert np.abs(stat).max() < 1e-4 * (1 + np.abs(q).max())
    assert out["z_ub"].min() > -1e-8 and out["z_lb"].min() > -1e-8


def test_qp_partial_bounds(rng):
    """Mixed finite/infinite bounds only stack the finite rows."""
    n = 8
    P = np.eye(n)
    q = -np.arange(1.0, n + 1.0)
    lb = np.full(n, -np.inf)
    lb[::2] = 0.5  # only even coordinates bounded below... binding? x*=k>=0.5
    ub = np.full(n, np.inf)
    ub[1] = 1.0  # x1* would be 2 -> clamps to 1
    ref = _slsqp(P, q, lb=lb, ub=ub)
    out = solve_qp(P, q, lb=lb, ub=ub, **TOL)
    np.testing.assert_allclose(out["x"], ref.x, atol=2e-5)
    # infinite-bound coordinates must carry exactly-zero bound duals
    assert np.all(out["z_lb"][1::2] == 0.0)
    assert np.all(out["z_ub"][[0] + list(range(2, n))] == 0.0)


def test_qp_sparse_inputs(rng):
    P, q, G, h, A, b = _rand_qp(rng, n=16, n_eq=4, n_in=10)
    ref = _slsqp(P, q, G, h, A, b)
    out = solve_qp(P, q, G=sp.csr_matrix(G), h=h, A=sp.csr_matrix(A), b=b,
                   **TOL)
    assert Status(out["status"]) == Status.SUCCESS
    np.testing.assert_allclose(out["x"], ref.x, atol=5e-5)


def test_qp_warm_resolve(rng):
    """MPC pattern: perturb h/b, reuse result['solver'] with warm_start."""
    P, q, G, h, A, b = _rand_qp(rng)
    out = solve_qp(P, q, G=G, h=h, A=A, b=b, **TOL)
    h2 = h + 1e-3 * rng.standard_normal(h.shape)
    b2 = b + 1e-3 * rng.standard_normal(b.shape)
    warm = solve_qp(P, q, G=G, h=h2, A=A, b=b2, solver=out["solver"],
                    warm_start=True, **TOL)
    ref = _slsqp(P, q, G, h2, A, b2)
    np.testing.assert_allclose(warm["x"], ref.x, atol=5e-5)
    assert warm["iterations"] <= out["iterations"]


def test_qp_unconstrained_closed_form(rng):
    n = 9
    Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    P = Q @ np.diag(np.geomspace(1.0, 30.0, n)) @ Q.T
    q = rng.standard_normal(n)
    out = solve_qp(P, q)
    np.testing.assert_allclose(out["x"], np.linalg.solve(P, -q), atol=1e-9)
    assert out["status_name"] == "SUCCESS"


def test_qp_unconstrained_unbounded_raises(rng):
    P = np.diag([1.0, 0.0])  # singular; q outside range(P)
    q = np.array([0.0, 1.0])
    with pytest.raises(ValueError, match="unbounded"):
        solve_qp(P, q)


def test_qp_infeasible_status(rng):
    """Infeasible QPs must certify INFEASIBLE, not return garbage."""
    P = np.eye(2)
    q = np.zeros(2)
    A = np.array([[1.0, 0.0], [1.0, 0.0]])  # x0 = 0 AND x0 = 1
    b = np.array([0.0, 1.0])
    out = solve_qp(P, q, A=A, b=b, max_iter=5000, dtype=np.float64, **{
        k: v for k, v in TOL.items() if k in ("abs_tol", "rel_tol")})
    assert Status(out["status"]) == Status.INFEASIBLE
    out2 = solve_qp(P, q, lb=np.ones(2), ub=np.zeros(2), max_iter=5000,
                    dtype=np.float64)
    assert Status(out2["status"]) == Status.INFEASIBLE


def test_qp_mismatched_args_raise(rng):
    P = np.eye(2)
    q = np.zeros(2)
    with pytest.raises(ValueError, match="G and h"):
        solve_qp(P, q, G=np.eye(2))
    with pytest.raises(ValueError, match="A and b"):
        solve_qp(P, q, b=np.zeros(1))


def test_qp_staged_early_exit():
    """The staged SOCP route (cone.py::_solve_qp_as_socp) must exit at
    the first segment whose PDAS polish certifies the optimum, instead
    of running the DR loop to max_iter.  HS21-shaped tiny QP: the DR
    tail stalls (pre-staging this burned all 40000 iterations before the
    polish rescued it), but the active set is identified within one
    500-iteration segment."""
    from pogs_tpu.solver.cone import K_QP_SEGMENT_ITERS

    P = np.diag([0.02, 2.0])
    q = np.zeros(2)
    G = np.array([[-10.0, 1.0]])
    h = np.array([-10.0])
    lb = np.array([2.0, -50.0])
    ub = np.array([50.0, 50.0])
    out = solve_qp(P, q, G=G, h=h, lb=lb, ub=ub, abs_tol=1e-6,
                   rel_tol=1e-6, max_iter=40000, dtype=np.float64)
    assert Status(out["status"]) == Status.SUCCESS
    assert out["num_iters"] <= 2 * K_QP_SEGMENT_ITERS
    assert abs(out["optval"] - 0.04) < 1e-6          # before the -100 shift
    np.testing.assert_allclose(out["x"], [2.0, 0.0], atol=1e-6)


def test_qp_staged_warm_resolve_consistent():
    """Warm re-solve through the staged route: perturbing h on the same
    solver handle must converge to the perturbed optimum."""
    rng = np.random.default_rng(7)
    P, q, G, h, A, b = _rand_qp(rng)
    out = solve_qp(P, q, G, h, A, b, max_iter=4000, abs_tol=1e-7,
                   rel_tol=1e-7, dtype=np.float64)
    assert Status(out["status"]) == Status.SUCCESS
    h2 = h + 1e-3
    out2 = solve_qp(P, q, G, h2, A, b, max_iter=4000, abs_tol=1e-7,
                    rel_tol=1e-7, dtype=np.float64,
                    solver=out["solver"], warm_start=True)
    ref = _slsqp(P, q, G, h2, A, b)
    assert Status(out2["status"]) == Status.SUCCESS
    assert abs(out2["optval"] - ref.fun) < 1e-5 * max(1.0, abs(ref.fun))


# ---- presolve ------------------------------------------------------------

def test_presolve_fixed_vars_and_emptied_row(rng):
    """Fixed variables (lb == ub) are substituted out; a row supported
    only on fixed variables is feasibility-checked and dropped; the
    expanded duals satisfy the full-problem stationarity convention."""
    n = 8
    M = rng.standard_normal((n, n))
    P = M @ M.T + 0.5 * np.eye(n)
    q = rng.standard_normal(n)
    lb = np.full(n, -2.0)
    ub = np.full(n, 2.0)
    lb[2] = ub[2] = 0.7
    lb[5] = ub[5] = -1.3
    G = rng.standard_normal((4, n))
    h = G @ (0.1 * np.ones(n)) + 0.5
    G = np.vstack([G, np.zeros(n)])
    G[-1, 2], G[-1, 5] = 1.0, 2.0
    h = np.concatenate([h, [0.7 - 2.6 + 1.0]])  # holds after substitution

    out = solve_qp(P, q, G, h, lb=lb, ub=ub, abs_tol=1e-8, rel_tol=1e-8,
                   dtype=np.float64)
    assert Status(out["status"]) == Status.SUCCESS
    assert out["presolve"] == {"fixed_variables": 2, "dropped_ineq_rows": 1,
                               "dropped_eq_rows": 0}
    assert out["x"][2] == 0.7 and out["x"][5] == -1.3
    ref = _slsqp(P, q, G, h, lb=lb, ub=ub)
    assert abs(out["optval"] - ref.fun) < 1e-6
    r = P @ out["x"] + q + G.T @ out["z_ineq"] + out["z_ub"] - out["z_lb"]
    assert np.abs(r).max() < 1e-5

    # Violating the emptied row is certified INFEASIBLE without a solve.
    h_bad = h.copy()
    h_bad[-1] = 0.7 - 2.6 - 1.0
    out2 = solve_qp(P, q, G, h_bad, lb=lb, ub=ub, dtype=np.float64)
    assert Status(out2["status"]) == Status.INFEASIBLE


def test_presolve_inconsistent_bounds():
    P = np.eye(2)
    q = np.zeros(2)
    out = solve_qp(P, q, lb=np.array([3.0, 0.0]), ub=np.array([2.0, 1.0]))
    assert Status(out["status"]) == Status.INFEASIBLE
    assert "lb > ub" in out["presolve"]


def test_presolve_all_vars_fixed():
    """Every variable fixed: the answer is closed-form; constraints are
    feasibility-checked against the fixed point."""
    P = np.diag([1.0, 2.0])
    q = np.array([0.5, -1.0])
    lb = ub = np.array([1.0, -2.0])
    G = np.array([[1.0, 1.0]])
    out = solve_qp(P, q, G, np.array([0.0]), lb=lb, ub=ub)
    assert Status(out["status"]) == Status.SUCCESS
    np.testing.assert_allclose(out["x"], [1.0, -2.0])
    assert abs(out["optval"] - (0.5 * (1 + 8) + 0.5 + 2.0)) < 1e-10
    out2 = solve_qp(P, q, G, np.array([-2.0]), lb=lb, ub=ub)
    assert Status(out2["status"]) == Status.INFEASIBLE


def test_presolve_warm_resolve_new_fixed_values(rng):
    """Warm re-solve may change the fixed VALUES (solve-time data) but
    not the fixed index set (structure baked into the handle)."""
    n = 8
    M = rng.standard_normal((n, n))
    P = M @ M.T + 0.5 * np.eye(n)
    q = rng.standard_normal(n)
    lb = np.full(n, -2.0)
    ub = np.full(n, 2.0)
    lb[2] = ub[2] = 0.7
    G = rng.standard_normal((4, n))
    h = G @ (0.1 * np.ones(n)) + 0.5
    out = solve_qp(P, q, G, h, lb=lb, ub=ub, abs_tol=1e-8, rel_tol=1e-8,
                   dtype=np.float64)
    lb2 = lb.copy()
    ub2 = ub.copy()
    lb2[2] = ub2[2] = 0.9
    out2 = solve_qp(P, q, G, h, lb=lb2, ub=ub2, abs_tol=1e-8, rel_tol=1e-8,
                    dtype=np.float64, solver=out["solver"], warm_start=True)
    ref = _slsqp(P, q, G, h, lb=lb2, ub=ub2)
    assert abs(out2["optval"] - ref.fun) < 1e-6
    lb3 = lb.copy()
    lb3[2] = -2.0  # un-fixes x2: structural change
    with pytest.raises(ValueError, match="fixed-variable pattern"):
        solve_qp(P, q, G, h, lb=lb3, ub=ub, solver=out["solver"],
                 warm_start=True)


def test_presolve_sparse_G(rng):
    n = 10
    M = rng.standard_normal((n, n))
    P = M @ M.T + np.eye(n)
    q = rng.standard_normal(n)
    lb = np.full(n, -1.0)
    ub = np.full(n, 1.0)
    lb[4] = ub[4] = 0.25
    Gs = sp.random(6, n, density=0.4, random_state=5, format="csr")
    h = np.full(6, 0.3)
    out = solve_qp(P, q, Gs, h, lb=lb, ub=ub, abs_tol=1e-8, rel_tol=1e-8,
                   dtype=np.float64)
    assert Status(out["status"]) == Status.SUCCESS
    ref = _slsqp(P, q, Gs.toarray(), h, lb=lb, ub=ub)
    assert abs(out["optval"] - ref.fun) < 1e-6


def test_presolve_off_matches_on(rng):
    """presolve=False must agree with presolve=True on a reducible QP."""
    n = 6
    M = rng.standard_normal((n, n))
    P = M @ M.T + np.eye(n)
    q = rng.standard_normal(n)
    lb = np.full(n, -1.0)
    ub = np.full(n, 1.0)
    lb[0] = ub[0] = 0.5
    on = solve_qp(P, q, lb=lb, ub=ub, abs_tol=1e-8, rel_tol=1e-8,
                  dtype=np.float64)
    off = solve_qp(P, q, lb=lb, ub=ub, abs_tol=1e-8, rel_tol=1e-8,
                   dtype=np.float64, presolve=False)
    assert abs(on["optval"] - off["optval"]) < 1e-6
    np.testing.assert_allclose(on["x"], off["x"], atol=1e-5)


# ---- solve_lp ------------------------------------------------------------

def test_solve_lp_vs_linprog(rng):
    from scipy.optimize import linprog

    from pogs_tpu import solve_lp

    n = 12
    c = rng.standard_normal(n)
    G = rng.standard_normal((20, n))
    h = G @ (0.1 * np.ones(n)) + 1.0
    A = rng.standard_normal((3, n))
    b = A @ (0.1 * np.ones(n))
    lb = np.full(n, -2.0)
    ub = np.full(n, 2.0)
    ref = linprog(c, A_ub=G, b_ub=h, A_eq=A, b_eq=b,
                  bounds=list(zip(lb, ub)), method="highs")
    assert ref.status == 0
    out = solve_lp(c, G, h, A, b, lb=lb, ub=ub, abs_tol=1e-7, rel_tol=1e-7,
                   max_iter=20000, dtype=np.float64)
    assert Status(out["status"]) == Status.SUCCESS
    assert abs(out["optval"] - ref.fun) < 1e-5 * max(1.0, abs(ref.fun))
    # stationarity with the split duals
    r = (c + G.T @ out["z_ineq"] + A.T @ out["y_eq"]
         + out["z_ub"] - out["z_lb"])
    assert np.abs(r).max() < 1e-4


def test_solve_lp_presolve_fixed_vars(rng):
    from scipy.optimize import linprog

    from pogs_tpu import solve_lp

    n = 8
    c = rng.standard_normal(n)
    G = rng.standard_normal((10, n))
    h = G @ (0.05 * np.ones(n)) + 0.8
    lb = np.full(n, -1.0)
    ub = np.full(n, 1.0)
    lb[3] = ub[3] = 0.4  # QPS FX-style fixed variable
    ref = linprog(c, A_ub=G, b_ub=h, bounds=list(zip(lb, ub)),
                  method="highs")
    assert ref.status == 0
    out = solve_lp(c, G, h, lb=lb, ub=ub, abs_tol=1e-7, rel_tol=1e-7,
                   max_iter=20000, dtype=np.float64)
    assert Status(out["status"]) == Status.SUCCESS
    assert out["presolve"]["fixed_variables"] == 1
    assert out["x"][3] == 0.4
    assert abs(out["optval"] - ref.fun) < 1e-5 * max(1.0, abs(ref.fun))


def test_solve_lp_unconstrained():
    from pogs_tpu import solve_lp

    out = solve_lp(np.zeros(3))
    assert Status(out["status"]) == Status.SUCCESS and out["optval"] == 0.0
    with pytest.raises(ValueError, match="unbounded"):
        solve_lp(np.array([1.0, 0.0]))


# ---- diagonal Hessian (separable quadratic) --------------------------------

def test_diag_P_matches_dense(rng):
    """A 1-D P (and an equivalent sparse-diagonal P) must agree with the
    dense np.diag(P) solve on every output."""
    n = 10
    p = rng.uniform(0.5, 3.0, n)
    q = rng.standard_normal(n)
    G = rng.standard_normal((6, n))
    h = G @ (0.1 * np.ones(n)) + 0.5
    kw = dict(abs_tol=1e-8, rel_tol=1e-8, dtype=np.float64)
    dense = solve_qp(np.diag(p), q, G, h, **kw)
    diag = solve_qp(p, q, G, h, **kw)
    spdiag = solve_qp(sp.diags(p).tocsr(), q, G, h, **kw)
    for out in (diag, spdiag):
        assert Status(out["status"]) == Status.SUCCESS
        assert abs(out["optval"] - dense["optval"]) < 1e-7
        np.testing.assert_allclose(out["x"], dense["x"], atol=1e-6)


def test_diag_P_separable_closed_form(rng):
    """Bounds-only separable QP (diagonal P): answered by the exact
    per-coordinate closed form, no iteration — instant even at n = 10^5."""
    n = 100_000
    p = rng.uniform(0.5, 2.0, n)
    q = rng.standard_normal(n)
    lb = np.full(n, -0.5)
    ub = np.full(n, 0.5)
    x_star = np.clip(-q / p, lb, ub)
    out = solve_qp(p, q, lb=lb, ub=ub)
    assert Status(out["status"]) == Status.SUCCESS
    np.testing.assert_allclose(out["x"], x_star)
    # stationarity with the returned bound multipliers
    r = p * out["x"] + q + out["z_ub"] - out["z_lb"]
    assert np.abs(r).max() < 1e-12
    # unbounded detection: a zero-curvature coordinate with an open end
    out2 = solve_qp(np.zeros(2), np.array([1.0, 0.0]),
                    lb=np.array([-np.inf, 0.0]), ub=np.array([1.0, 2.0]))
    assert Status(out2["status"]) == Status.UNBOUNDED


def test_diag_P_large_n_staged_polish(rng):
    """Diagonal P + general sparse rows past the dense-polish bound
    (n > K_QP_STAGED_N_MAX): the diagonal PDAS path (bound-row
    elimination + small Schur complement) still certifies the optimum at
    the first segment boundary — no (n, n) object is ever formed."""
    from pogs_tpu.solver.cone import K_QP_SEGMENT_ITERS, K_QP_STAGED_N_MAX
    from pogs_tpu.solver.qp_polish import kkt_residuals

    n = K_QP_STAGED_N_MAX + 1000
    p = rng.uniform(0.5, 2.0, n)
    q = rng.standard_normal(n)
    lb = np.full(n, -0.5)
    ub = np.full(n, 0.5)
    G = sp.random(20, n, density=0.005, random_state=7, format="csr")
    h = np.full(20, -0.05)
    out = solve_qp(p, q, G, h, lb=lb, ub=ub, abs_tol=1e-6, rel_tol=1e-6,
                   max_iter=4000, dtype=np.float64)
    assert Status(out["status"]) == Status.SUCCESS
    assert out["num_iters"] <= 2 * K_QP_SEGMENT_ITERS
    A_bar = sp.vstack([G, sp.eye(n), -sp.eye(n)]).tocsr()
    b_bar = np.concatenate([h, ub, -lb])
    lam = np.concatenate([out["z_ineq"], out["z_ub"], out["z_lb"]])
    res = kkt_residuals(p, q, A_bar, b_bar,
                        np.ones(A_bar.shape[0], np.int8), out["x"], lam)
    assert max(res.values()) < 1e-8


def test_diag_P_presolve_fixed_vars(rng):
    n = 8
    p = rng.uniform(0.5, 2.0, n)
    q = rng.standard_normal(n)
    lb = np.full(n, -1.0)
    ub = np.full(n, 1.0)
    lb[3] = ub[3] = 0.25
    out = solve_qp(p, q, lb=lb, ub=ub, abs_tol=1e-8, rel_tol=1e-8,
                   dtype=np.float64)
    assert out["presolve"]["fixed_variables"] == 1
    ref = _slsqp(np.diag(p), q, lb=lb, ub=ub)
    assert abs(out["optval"] - ref.fun) < 1e-6


def test_diag_P_unconstrained():
    p = np.array([2.0, 4.0])
    q = np.array([-2.0, 8.0])
    out = solve_qp(p, q)
    np.testing.assert_allclose(out["x"], [1.0, -2.0])
    with pytest.raises(ValueError, match="unbounded"):
        solve_qp(np.array([1.0, 0.0]), np.array([0.0, 1.0]))
