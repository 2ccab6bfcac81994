"""Vendored Maros–Mészáros QP subset (VERDICT round-1 item 5).

The reference's maros_benchmark.py depends on an external checkout
(`~/cvxbench`, reference python/benchmarks/maros_benchmark.py:22-40) that
is unavailable here (no network).  This module vendors a subset of the
collection instead: the small classics from the Hock–Schittkowski family
that Maros & Mészáros included (HS21, HS35, HS51, HS52, HS53, HS76,
TAME), with their published optimal values.

Each problem is stated in the standard convention

    minimize    ½ xᵀ Q x + cᵀ x  (+ c0)
    subject to  rows of (A, sense, rhs): '=' , '<=' or '>='
                lb ≤ x ≤ ub     (±inf allowed)

and `to_cone_form` lowers it to the solver's cone form
    min ½xᵀPx + cᵀx   s.t.   b − Āx ∈ {0}^eq × ℝ₊^ineq
(equalities become Zero-cone rows; all inequalities and finite variable
bounds become NonNeg rows — Kx must stay empty on the QP path).

Published optima: Hock & Schittkowski, "Test Examples for Nonlinear
Programming Codes" (1981), and the Maros–Mészáros QP collection notes.
Every value is additionally cross-checked against scipy SLSQP in
tests/test_real_data.py, so a transcription error cannot hide.
"""

from __future__ import annotations

import numpy as np

INF = np.inf


def _problem(name, Q, c, c0, A, sense, rhs, lb, ub, optval):
    n = len(c)
    return {
        "name": name,
        "Q": np.asarray(Q, np.float64).reshape(n, n),
        "c": np.asarray(c, np.float64),
        "c0": float(c0),
        "A": np.asarray(A, np.float64).reshape(-1, n) if len(A) else
             np.zeros((0, n)),
        "sense": list(sense),
        "rhs": np.asarray(rhs, np.float64),
        "lb": np.asarray(lb, np.float64),
        "ub": np.asarray(ub, np.float64),
        "optval": float(optval),
    }


def problems():
    out = []

    # HS21: min 0.01 x1² + x2² − 100   s.t. 10x1 − x2 ≥ 10,
    #       2 ≤ x1 ≤ 50, −50 ≤ x2 ≤ 50.   x* = (2, 0), f* = −99.96.
    out.append(_problem(
        "HS21",
        Q=np.diag([0.02, 2.0]), c=[0.0, 0.0], c0=-100.0,
        A=[[10.0, -1.0]], sense=[">="], rhs=[10.0],
        lb=[2.0, -50.0], ub=[50.0, 50.0],
        optval=-99.96,
    ))

    # HS35 (Beale): min 9 − 8x1 − 6x2 − 4x3 + 2x1² + 2x2² + x3²
    #               + 2x1x2 + 2x1x3   s.t. x ≥ 0, x1 + x2 + 2x3 ≤ 3.
    #               f* = 1/9.
    out.append(_problem(
        "HS35",
        Q=[[4.0, 2.0, 2.0], [2.0, 4.0, 0.0], [2.0, 0.0, 2.0]],
        c=[-8.0, -6.0, -4.0], c0=9.0,
        A=[[1.0, 1.0, 2.0]], sense=["<="], rhs=[3.0],
        lb=[0.0, 0.0, 0.0], ub=[INF, INF, INF],
        optval=1.0 / 9.0,
    ))

    # HS52: min (4x1−x2)² + (x2+x3−2)² + (x4−1)² + (x5−1)²
    #       s.t. x1 + 3x2 = 0, x3 + x4 − 2x5 = 0, x2 − x5 = 0.
    #       f* = 1859/349.
    G = np.array([
        [4.0, -1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 1.0, 0.0],
        [0.0, 0.0, 0.0, 0.0, 1.0],
    ])
    target = np.array([0.0, 2.0, 1.0, 1.0])
    out.append(_problem(
        "HS52",
        Q=2.0 * G.T @ G, c=-2.0 * G.T @ target, c0=float(target @ target),
        A=[[1.0, 3.0, 0.0, 0.0, 0.0],
           [0.0, 0.0, 1.0, 1.0, -2.0],
           [0.0, 1.0, 0.0, 0.0, -1.0]],
        sense=["=", "=", "="], rhs=[0.0, 0.0, 0.0],
        lb=[-INF] * 5, ub=[INF] * 5,
        optval=1859.0 / 349.0,
    ))

    # HS51: min (x1−x2)² + (x2+x3−2)² + (x4−1)² + (x5−1)²
    #       s.t. x1 + 3x2 = 4, x3 + x4 − 2x5 = 0, x2 − x5 = 0.   f* = 0.
    G1 = G.copy()
    G1[0] = [1.0, -1.0, 0.0, 0.0, 0.0]
    out.append(_problem(
        "HS51",
        Q=2.0 * G1.T @ G1, c=-2.0 * G1.T @ target, c0=float(target @ target),
        A=[[1.0, 3.0, 0.0, 0.0, 0.0],
           [0.0, 0.0, 1.0, 1.0, -2.0],
           [0.0, 1.0, 0.0, 0.0, -1.0]],
        sense=["=", "=", "="], rhs=[4.0, 0.0, 0.0],
        lb=[-INF] * 5, ub=[INF] * 5,
        optval=0.0,
    ))

    # HS53: the (x1−x2)² objective with HS52's equalities, plus
    #       −10 ≤ x ≤ 10.   f* = 176/43.
    out.append(_problem(
        "HS53",
        Q=2.0 * G1.T @ G1, c=-2.0 * G1.T @ target, c0=float(target @ target),
        A=[[1.0, 3.0, 0.0, 0.0, 0.0],
           [0.0, 0.0, 1.0, 1.0, -2.0],
           [0.0, 1.0, 0.0, 0.0, -1.0]],
        sense=["=", "=", "="], rhs=[0.0, 0.0, 0.0],
        lb=[-10.0] * 5, ub=[10.0] * 5,
        optval=176.0 / 43.0,
    ))

    # HS76: min x1² + 0.5x2² + x3² + 0.5x4² − x1x3 + x3x4
    #           − x1 − 3x2 + x3 − x4
    #       s.t. x1 + 2x2 + x3 + x4 ≤ 5, 3x1 + x2 + 2x3 − x4 ≤ 4,
    #            x2 + 4x3 ≥ 1.5, x ≥ 0.   f* = −4.681818...
    out.append(_problem(
        "HS76",
        Q=[[2.0, 0.0, -1.0, 0.0],
           [0.0, 1.0, 0.0, 0.0],
           [-1.0, 0.0, 2.0, 1.0],
           [0.0, 0.0, 1.0, 1.0]],
        c=[-1.0, -3.0, 1.0, -1.0], c0=0.0,
        A=[[1.0, 2.0, 1.0, 1.0],
           [3.0, 1.0, 2.0, -1.0],
           [0.0, 1.0, 4.0, 0.0]],
        sense=["<=", "<=", ">="], rhs=[5.0, 4.0, 1.5],
        lb=[0.0] * 4, ub=[INF] * 4,
        optval=-4.681818181,
    ))

    # TAME: min (x1 − x2)²  s.t. x1 + x2 = 1, x ≥ 0.   f* = 0.
    out.append(_problem(
        "TAME",
        Q=[[2.0, -2.0], [-2.0, 2.0]], c=[0.0, 0.0], c0=0.0,
        A=[[1.0, 1.0]], sense=["="], rhs=[1.0],
        lb=[0.0, 0.0], ub=[INF, INF],
        optval=0.0,
    ))

    return out


def to_cone_form(p):
    """Lower (Q,c,A,sense,rhs,lb,ub) to  min ½xᵀPx + cᵀx  s.t.
    b − Āx ∈ {0}^n_eq × ℝ₊^n_ineq  (Kx empty; QP path).

    Row order: equalities first, then '<=' rows as-is, '>=' rows negated,
    then finite upper bounds (x_j ≤ u) and finite lower bounds (−x_j ≤ −l).
    Returns (P, c, A_bar, b_bar, n_eq).
    """
    n = p["c"].shape[0]
    rows, rhs = [], []
    n_eq = 0
    for a, s, r in zip(p["A"], p["sense"], p["rhs"]):
        if s == "=":
            rows.insert(n_eq, a)
            rhs.insert(n_eq, r)
            n_eq += 1
    for a, s, r in zip(p["A"], p["sense"], p["rhs"]):
        if s == "<=":
            rows.append(a)
            rhs.append(r)
        elif s == ">=":
            rows.append(-a)
            rhs.append(-r)
    for j in range(n):
        if np.isfinite(p["ub"][j]):
            e = np.zeros(n)
            e[j] = 1.0
            rows.append(e)
            rhs.append(p["ub"][j])
        if np.isfinite(p["lb"][j]):
            e = np.zeros(n)
            e[j] = -1.0
            rows.append(e)
            rhs.append(-p["lb"][j])
    A_bar = np.vstack(rows) if rows else np.zeros((0, n))
    return p["Q"], p["c"], A_bar, np.asarray(rhs, np.float64), n_eq


def solve_with_pogs_tpu(p, abs_tol=1e-6, rel_tol=1e-6, max_iter=40000,
                        dtype=np.float64):
    """Solve one vendored problem with the TPU QP path; returns the dict
    from solve_cone plus the objective including the constant term."""
    from pogs_tpu.api.cone import solve_cone
    from pogs_tpu.types import Cone, ConeConstraint

    P, c, A_bar, b_bar, n_eq = to_cone_form(p)
    m = A_bar.shape[0]
    Ky = []
    if n_eq:
        Ky.append(ConeConstraint(Cone.ZERO, range(n_eq)))
    if m > n_eq:
        Ky.append(ConeConstraint(Cone.NON_NEG, range(n_eq, m)))
    res = solve_cone(A_bar, b_bar, c, Kx=(), Ky=Ky, P=P, dtype=dtype,
                     abs_tol=abs_tol, rel_tol=rel_tol, max_iter=max_iter)
    res["objective"] = float(res["optval"]) + p["c0"]
    return res


def solve_with_slsqp(p):
    """Independent oracle: scipy SLSQP on the same data."""
    from scipy.optimize import minimize

    n = p["c"].shape[0]
    Q, c = p["Q"], p["c"]

    def fun(x):
        return 0.5 * x @ Q @ x + c @ x + p["c0"]

    def jac(x):
        return Q @ x + c

    cons = []
    for a, s, r in zip(p["A"], p["sense"], p["rhs"]):
        a = np.asarray(a, np.float64)
        if s == "=":
            cons.append({"type": "eq", "fun": (lambda x, a=a, r=r: a @ x - r),
                         "jac": (lambda x, a=a: a)})
        elif s == "<=":
            cons.append({"type": "ineq", "fun": (lambda x, a=a, r=r: r - a @ x),
                         "jac": (lambda x, a=a: -a)})
        else:
            cons.append({"type": "ineq", "fun": (lambda x, a=a, r=r: a @ x - r),
                         "jac": (lambda x, a=a: a)})
    bounds = [(None if not np.isfinite(lo) else lo,
               None if not np.isfinite(hi) else hi)
              for lo, hi in zip(p["lb"], p["ub"])]
    x0 = np.clip(np.zeros(n), p["lb"], p["ub"])
    r = minimize(fun, x0, jac=jac, constraints=cons, bounds=bounds,
                 method="SLSQP", options={"maxiter": 500, "ftol": 1e-12})
    return float(r.fun)
