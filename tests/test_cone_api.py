"""Cone API tests: SCS-style dims interface + auto-rho heuristics.

Mirrors python/test_pogs_solver.py (LP via solve_cone_problem) and the
dims-mapping logic of pogs_cvxpy.py:230-277.
"""

import numpy as np
import jax.numpy as jnp
from scipy.optimize import linprog

from pogs_tpu import solve_cone_problem, dims_to_cones, auto_rho, Status
from pogs_tpu.types import Cone


def test_dims_to_cones_ordering():
    dims = {"f": 2, "l": 3, "q": [3, 4], "s": [2], "ep": 1, "ed": 1}
    cones = dims_to_cones(dims)
    kinds = [c.cone for c in cones]
    assert kinds == [Cone.ZERO, Cone.NON_NEG, Cone.SOC, Cone.SOC,
                     Cone.SDP, Cone.EXP_PRIMAL, Cone.EXP_DUAL]
    # offsets are contiguous
    all_idx = [i for c in cones for i in c.indices]
    assert all_idx == list(range(2 + 3 + 3 + 4 + 3 + 3 + 3))


def test_auto_rho_modes(rng):
    A = rng.normal(size=(10, 5))
    b = rng.normal(size=10)
    c = rng.normal(size=5)
    r1 = auto_rho(A, b, c, {"l": 10})
    assert 1e-3 <= r1 <= 1e3
    r2 = auto_rho(A, b, c, {"q": [10]})
    assert 1e-4 <= r2 <= 1e1
    assert auto_rho(A, b, c, {"l": 10}, scale=2.0) == 2 * r1


def test_solve_cone_problem_lp(rng):
    # LP in SCS form: 3 equality rows + inequality rows.
    m_eq, m_in, n = 4, 16, 8
    Aeq = rng.normal(size=(m_eq, n))
    x0 = rng.random(n)
    beq = Aeq @ x0
    Ain = np.vstack([np.eye(n), -np.eye(n)])[:m_in]
    bin_ = Ain @ x0 + rng.random(m_in)
    A = np.vstack([Aeq, Ain])
    b = np.concatenate([beq, bin_])
    c = rng.normal(size=n)
    out = solve_cone_problem(c, A, b, {"f": m_eq, "l": m_in},
                             abs_tol=1e-6, rel_tol=1e-6, max_iter=20000,
                             dtype=jnp.float64)
    assert out["status"] == Status.SUCCESS
    ref = linprog(c, A_eq=Aeq, b_eq=beq, A_ub=Ain, b_ub=bin_,
                  bounds=(None, None), method="highs")
    assert ref.success
    np.testing.assert_allclose(out["optval"], ref.fun, rtol=1e-3, atol=1e-4)
    assert out["primal_res_ratio"] < 10


def test_solve_cone_problem_socp(rng):
    # min c'x s.t. ||x - x0|| <= 2 (SOC), in SCS layout.
    n = 6
    x0 = rng.normal(size=n)
    c = rng.normal(size=n)
    # rows: s = b - Ax, SOC block (2, x0 - x ... wait: (t, z): t=2, z=x-x0)
    A = np.vstack([np.zeros((1, n)), np.eye(n)])
    b = np.concatenate([[2.0], x0])
    out = solve_cone_problem(c, A, b, {"q": [n + 1]},
                             abs_tol=1e-6, rel_tol=1e-6, max_iter=20000,
                             dtype=jnp.float64)
    assert out["status"] == Status.SUCCESS
    expect = x0 - 2 * c / np.linalg.norm(c)
    np.testing.assert_allclose(out["x"], expect, atol=1e-3)


def test_solve_cone_problem_qp(rng):
    # min 0.5 x'Px + c'x s.t. x >= 0 via dims + P (correct QP handling).
    n = 5
    M = rng.normal(size=(n, n))
    P = M @ M.T + np.eye(n)
    x_star = rng.random(n) + 0.5
    c = -(P @ x_star)
    A = -np.eye(n)
    b = np.zeros(n)
    out = solve_cone_problem(c, A, b, {"l": n}, P=P,
                             abs_tol=1e-6, rel_tol=1e-6, max_iter=20000,
                             dtype=jnp.float64)
    assert out["status"] == Status.SUCCESS
    np.testing.assert_allclose(out["x"], x_star, atol=1e-3)


def test_solve_cone_problem_sdp(rng):
    # min tr(C X) s.t. X >= 0 (PSD), tr(X) = 1 — smallest eigenvalue problem.
    # Packed lower-tri column-major x of dim L = nmat(nmat+1)/2.
    nmat = 3
    L = nmat * (nmat + 1) // 2
    Cr = rng.normal(size=(nmat, nmat))
    Csym = (Cr + Cr.T) / 2

    rows, cols, cvec, tvec = [], [], [], []
    k = 0
    for col in range(nmat):
        for row in range(col, nmat):
            w = 1.0 if row == col else 2.0  # off-diag counted twice in trace
            cvec.append(w * Csym[row, col])
            tvec.append(1.0 if row == col else 0.0)
            k += 1
    cvec = np.asarray(cvec)
    tvec = np.asarray(tvec)

    # rows: [trace equality (zero cone); X in SDP cone: s = 0 - (-I) x = x]
    A = np.vstack([tvec[None, :], -np.eye(L)])
    b = np.concatenate([[1.0], np.zeros(L)])
    out = solve_cone_problem(cvec, A, b, {"f": 1, "s": [nmat]},
                             abs_tol=1e-6, rel_tol=1e-6, max_iter=40000,
                             dtype=jnp.float64)
    assert out["status"] == Status.SUCCESS
    lam_min = np.linalg.eigvalsh(Csym)[0]
    np.testing.assert_allclose(out["optval"], lam_min, atol=1e-3)
