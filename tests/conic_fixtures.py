"""CVXPY-free conic fixtures in SCS convention (VERDICT round-2 item 6).

cvxpy is not installable in this environment, so the ConicSolver-plugin
data path (reference python/pogs_cvxpy.py:230-311 / our
api/cvxpy_interface.py solve_via_data) has no end-to-end exercise through
cvxpy itself.  These fixtures stand in for cvxpy's conic reduction: each
returns exactly the `(c, A, b, dims)` blob the plugin would hand to
``solve_cone_problem``, in SCS row order (f zero rows, l nonneg rows,
q SOC blocks, s PSD blocks in svec √2-scaled convention, ep/ed exp
triples), together with a trusted optimal value:

- analytic closed forms where the geometry allows (SOCP, SDP, EXP),
- scipy oracles computed live (HiGHS for LP, SLSQP for QP) elsewhere —
  every value is independent of the solver under test.

The SDP fixture uses the cvxpy/SCS **svec** convention (off-diagonal
entries carry √2 so ⟨svec(X), svec(Y)⟩ = tr(XY)); tests pass
``assume_svec=True`` exactly as the plugin does
(api/cvxpy_interface.py:376), driving the svec row/column rescaling
end-to-end.
"""

from __future__ import annotations

import numpy as np


def svec(M: np.ndarray) -> np.ndarray:
    """Scaled vectorization of a symmetric matrix, SCS convention:
    column-major lower triangle with off-diagonals × √2, so that
    svec(X)·svec(Y) = tr(XY)."""
    d = M.shape[0]
    out = []
    for j in range(d):
        for i in range(j, d):
            out.append(M[i, j] * (1.0 if i == j else np.sqrt(2.0)))
    return np.asarray(out, np.float64)


def lp_fixture(seed: int = 7, m_eq: int = 5, m_ineq: int = 40, n: int = 25):
    """Random bounded-feasible LP.  Oracle: scipy.optimize.linprog (HiGHS),
    computed by the caller — deterministic data, no stored magic number."""
    rng = np.random.default_rng(seed)
    A_eq = rng.normal(size=(m_eq, n))
    x_feas = rng.uniform(0.5, 1.5, size=n)
    b_eq = A_eq @ x_feas
    G = rng.normal(size=(m_ineq, n))
    h = G @ x_feas + rng.uniform(0.1, 1.0, size=m_ineq)
    c = rng.normal(size=n)
    # Bound the feasible set: 0 ≤ x ≤ 10 as extra nonneg rows.
    G_full = np.vstack([G, np.eye(n), -np.eye(n)])
    h_full = np.concatenate([h, np.full(n, 10.0), np.zeros(n)])
    A = np.vstack([A_eq, G_full])
    b = np.concatenate([b_eq, h_full])
    dims = {"f": m_eq, "l": G_full.shape[0]}
    return {"name": "lp", "c": c, "A": A, "b": b, "dims": dims,
            "lp_data": (c, G_full, h_full, A_eq, b_eq)}


def qp_fixture(seed: int = 3, n: int = 20):
    """Box-constrained strictly convex QP.  Oracle: scipy SLSQP (caller).
    Returns P too — exercises the epigraph-SOC QP path of the plugin."""
    rng = np.random.default_rng(seed)
    B = rng.normal(size=(n, n))
    P = B @ B.T + 0.1 * np.eye(n)
    c = rng.normal(size=n)
    A_eq = np.ones((1, n))
    b_eq = np.array([1.0])
    A = np.vstack([A_eq, np.eye(n), -np.eye(n)])
    b = np.concatenate([b_eq, np.full(n, 1.0), np.full(n, 1.0)])  # |x|≤1
    dims = {"f": 1, "l": 2 * n}
    return {"name": "qp", "c": c, "A": A, "b": b, "dims": dims, "P": P}


def socp_fixture():
    """min cᵀx s.t. ‖x‖₂ ≤ 1  ⇒  optval = −‖c‖₂ at x = −c/‖c‖.

    SCS form: one SOC block y = (1, x) = b − Ax with b = (1,0,…,0),
    A = [0; −I]."""
    c = np.array([3.0, -4.0, 12.0])
    n = c.shape[0]
    A = np.vstack([np.zeros((1, n)), -np.eye(n)])
    b = np.concatenate([[1.0], np.zeros(n)])
    dims = {"q": [n + 1]}
    return {"name": "socp", "c": c, "A": A, "b": b, "dims": dims,
            "optval": -float(np.linalg.norm(c))}


def socp_ls_fixture(seed: int = 11, k: int = 6, p: int = 3):
    """Least-norm epigraph SOCP: min t s.t. ‖Fx − g‖ ≤ t.
    optval = ‖(I − F F⁺) g‖ (the least-squares residual) — analytic."""
    rng = np.random.default_rng(seed)
    F = rng.normal(size=(k, p))
    g = rng.normal(size=k)
    x_ls, *_ = np.linalg.lstsq(F, g, rcond=None)
    optval = float(np.linalg.norm(F @ x_ls - g))
    n = p + 1  # variables (x, t)
    A = np.zeros((1 + k, n))
    A[0, p] = -1.0           # y0 = t
    A[1:, :p] = F            # y1: = g − Fx
    b = np.concatenate([[0.0], g])
    c = np.zeros(n)
    c[p] = 1.0
    dims = {"q": [k + 1]}
    return {"name": "socp_ls", "c": c, "A": A, "b": b, "dims": dims,
            "optval": optval}


def sdp_fixture():
    """min tr(CX) s.t. tr(X) = 1, X ⪰ 0  ⇒  optval = λ_min(C).

    Variable x = svec(X) (d=3).  Rows: one equality (trace), then the PSD
    block y = x itself via A = −I, b = 0 — all in the √2 svec convention,
    so tests must pass assume_svec=True (the plugin's setting)."""
    d = 3
    rng = np.random.default_rng(5)
    Qr, _ = np.linalg.qr(rng.normal(size=(d, d)))
    C = Qr @ np.diag([0.5, 1.5, 3.0]) @ Qr.T
    C = (C + C.T) / 2
    nvec = d * (d + 1) // 2
    trace_row = svec(np.eye(d))  # diag entries 1, off-diag 0
    A = np.vstack([trace_row, -np.eye(nvec)])
    b = np.concatenate([[1.0], np.zeros(nvec)])
    c = svec(C)
    dims = {"f": 1, "s": [d]}
    return {"name": "sdp", "c": c, "A": A, "b": b, "dims": dims,
            "optval": 0.5, "C": C, "d": d}


def exp_primal_fixture():
    """min z s.t. (x,y,z) ∈ K_exp, x = 1, y = 1  ⇒  z* = 1·e^{1/1} = e."""
    A = np.vstack([
        [1.0, 0.0, 0.0],   # eq: x = 1
        [0.0, 1.0, 0.0],   # eq: y = 1
        -np.eye(3),        # exp rows: y_block = (x, y, z)
    ])
    b = np.concatenate([[1.0, 1.0], np.zeros(3)])
    c = np.array([0.0, 0.0, 1.0])
    dims = {"f": 2, "ep": 1}
    return {"name": "exp_primal", "c": c, "A": A, "b": b, "dims": dims,
            "optval": float(np.e)}


def exp_dual_fixture():
    """min w s.t. (u,v,w) ∈ K_exp*, u = −1, v = 1
    ⇒ −u·e^{v/u} ≤ e·w ⇒ w* = e^{1/u}/e · (−u) = e^{−1}/e = e^{−2}."""
    A = np.vstack([
        [1.0, 0.0, 0.0],   # eq: u = −1
        [0.0, 1.0, 0.0],   # eq: v = 1
        -np.eye(3),
    ])
    b = np.concatenate([[-1.0, 1.0], np.zeros(3)])
    c = np.array([0.0, 0.0, 1.0])
    dims = {"f": 2, "ed": 1}
    return {"name": "exp_dual", "c": c, "A": A, "b": b, "dims": dims,
            "optval": float(np.exp(-2.0))}


def mixed_fixture():
    """LP + SOC in one cone program:
        min cᵀx  s.t.  Σx = 1 (zero row), x ≥ 0 (nonneg rows),
                       ‖x − x₀‖ ≤ r (SOC block).
    Oracle: scipy SLSQP (caller) — the problem is convex with a smooth
    reformulation ‖x−x₀‖² ≤ r²."""
    n = 4
    x0 = np.array([0.4, 0.3, 0.2, 0.1])
    r = 0.25
    c = np.array([1.0, -2.0, 0.5, -1.0])
    # SOC block y = (r, x − x0): y0 = r − 0·x; y1: = b − (−I)x with b = −x0.
    A = np.vstack([
        np.ones((1, n)),                      # f: 1 − Σx = 0
        -np.eye(n),                           # l: 0 − (−I)x = x ≥ 0
        np.zeros((1, n)),                     # q head: r
        -np.eye(n),                           # q tail: x − x0
    ])
    b = np.concatenate([[1.0], np.zeros(n), [r], -x0])
    dims = {"f": 1, "l": n, "q": [n + 1]}
    return {"name": "mixed", "c": c, "A": A, "b": b, "dims": dims,
            "x0": x0, "r": r}
