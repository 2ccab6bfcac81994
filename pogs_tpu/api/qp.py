"""Packaged quadratic-program API (OSQP-style signature).

    solve_qp(P, q, G, h, A, b, lb, ub)   solves

        minimize    (1/2) x'Px + q'x
        subject to  G x <= h,   A x = b,   lb <= x <= ub

by lowering to the cone form ``b_bar - A_bar x in {0}^n_eq x R+^n_in``
and routing through :class:`~pogs_tpu.solver.cone.ConeSolver`'s QP path
(epigraph rotated-SOC HSDE + PDAS active-set polish — the pipeline the
Maros–Mészáros-class suite certifies, ``benchmarks/maros_meszaros.py``).

The reference exposes QPs only through its cone interface and its own
QP-via-HSDE path is broken by its own admission
(src/cpu/pogs.cpp:1510-1514); this entry point is the user-facing QP
surface it never had.  Duals are split back into the user's blocks with
the convention  Px + q + G'z + A'y + z_ub - z_lb = 0,  z, z_lb, z_ub >= 0.
"""

from __future__ import annotations

import numpy as np

from pogs_tpu.types import Cone, ConeConstraint
from pogs_tpu.api.cone import solve_cone

__all__ = ["solve_qp"]


def _is_sparse(M) -> bool:
    return M is not None and hasattr(M, "tocoo")


def _nrows(M) -> int:
    return 0 if M is None else int(M.shape[0])


def solve_qp(
    P,
    q,
    G=None,
    h=None,
    A=None,
    b=None,
    lb=None,
    ub=None,
    solver=None,
    warm_start: bool = False,
    **kw,
):
    """Solve a convex QP; returns the result-dict contract of
    :func:`~pogs_tpu.api.cone.solve_cone` with QP extras:

    - ``x`` — primal solution, ``optval`` — (1/2)x'Px + q'x
    - ``y_eq`` — equality multipliers (free sign), ``z_ineq`` — Gx<=h
      multipliers (>= 0), ``z_lb``/``z_ub`` — bound multipliers (>= 0)
    - everything else (status, iterations, residual diagnostics) as in
      ``solve_cone``.

    ``P`` must be symmetric PSD.  ``G``/``A`` may be dense or scipy
    sparse (sparse inputs keep the solver's auto-densify policy).
    Tolerances/limits pass through as keyword arguments
    (``abs_tol``/``rel_tol``/``max_iter``/``dtype``/``qp_via``/...).
    Pass ``solver=`` a previous call's ``result["solver"]`` together
    with ``warm_start=True`` for the re-solve pattern: ``q``, ``h``,
    ``b``, ``lb``, ``ub`` values may change between such calls (they are
    solve-time arguments), but ``P``, ``G``, ``A`` and the pattern of
    finite bounds must stay fixed (they are baked into the factorized
    operator).
    """
    q = np.asarray(q, np.float64).ravel()
    n = q.shape[0]
    if (G is None) != (h is None):
        raise ValueError("G and h must be given together")
    if (A is None) != (b is None):
        raise ValueError("A and b must be given together")

    n_eq = _nrows(A)
    n_in = _nrows(G)
    ub_idx = np.flatnonzero(np.isfinite(np.asarray(ub, np.float64))) \
        if ub is not None else np.empty(0, np.intp)
    lb_idx = np.flatnonzero(np.isfinite(np.asarray(lb, np.float64))) \
        if lb is not None else np.empty(0, np.intp)

    # Row order: equalities, G rows, finite upper bounds, finite lower
    # bounds (negated) — the same lowering the Maros suite certifies.
    sparse = _is_sparse(G) or _is_sparse(A)
    blocks, rhs = [], []
    if n_eq:
        blocks.append(A)
        rhs.append(np.asarray(b, np.float64).ravel())
    if n_in:
        blocks.append(G)
        rhs.append(np.asarray(h, np.float64).ravel())
    if ub_idx.size:
        E = _bound_rows(n, ub_idx, +1.0, sparse)
        blocks.append(E)
        rhs.append(np.asarray(ub, np.float64)[ub_idx])
    if lb_idx.size:
        E = _bound_rows(n, lb_idx, -1.0, sparse)
        blocks.append(E)
        rhs.append(-np.asarray(lb, np.float64)[lb_idx])

    if not blocks:
        return _solve_unconstrained(P, q)

    if sparse:
        import scipy.sparse as sp

        A_bar = sp.vstack([sp.csr_matrix(B) for B in blocks], format="csr")
    else:
        A_bar = np.vstack([np.asarray(B, np.float64) for B in blocks])
    b_bar = np.concatenate(rhs)
    m = A_bar.shape[0]

    Ky = []
    if n_eq:
        Ky.append(ConeConstraint(Cone.ZERO, range(n_eq)))
    if m > n_eq:
        Ky.append(ConeConstraint(Cone.NON_NEG, range(n_eq, m)))

    if solver is None:
        # Built here (not inside solve_cone) so the factorized solver can
        # be returned for the warm re-solve pattern.
        from pogs_tpu.types import SolverSettings
        from pogs_tpu.solver.cone import ConeSolver

        settings = SolverSettings(
            abs_tol=kw.get("abs_tol", 1e-4), rel_tol=kw.get("rel_tol", 1e-4),
            max_iter=kw.get("max_iter", 2500), verbose=kw.get("verbose", 0),
            polish=kw.get("polish", True),
        )
        solver = ConeSolver(A_bar, Ky=Ky, settings=settings,
                            strategy=kw.get("strategy"), dtype=kw.get("dtype"),
                            qp_via=kw.get("qp_via", "socp"))

    out = solve_cone(A_bar, b_bar, q, Kx=(), Ky=Ky, P=P,
                     solver=solver, warm_start=warm_start, **kw)
    out["solver"] = solver

    # Split duals back into the user's blocks (stationarity convention
    # Px + q + A_bar' lam = 0, lam >= 0 on the NonNeg rows).
    lam = np.asarray(out["l"], np.float64)
    off = n_eq
    out["y_eq"] = lam[:n_eq]
    out["z_ineq"] = lam[off:off + n_in]
    off += n_in
    z_ub = np.zeros(n)
    z_ub[ub_idx] = lam[off:off + ub_idx.size]
    off += ub_idx.size
    z_lb = np.zeros(n)
    z_lb[lb_idx] = lam[off:off + lb_idx.size]
    out["z_ub"], out["z_lb"] = z_ub, z_lb
    return out


def _bound_rows(n: int, idx, sign: float, sparse: bool):
    """±e_j rows selecting the finitely-bounded coordinates."""
    if sparse:
        import scipy.sparse as sp

        data = np.full(idx.size, sign)
        return sp.csr_matrix((data, (np.arange(idx.size), idx)),
                             shape=(idx.size, n))
    E = np.zeros((idx.size, n))
    E[np.arange(idx.size), idx] = sign
    return E


def _solve_unconstrained(P, q):
    """No constraints: Px = -q by Cholesky (PSD-singular → least norm)."""
    Pd = np.asarray(
        P.todense() if _is_sparse(P) else P, np.float64)
    Pd = (Pd + Pd.T) / 2
    try:
        L = np.linalg.cholesky(Pd)
        x = np.linalg.solve(L.T, np.linalg.solve(L, -q))
    except np.linalg.LinAlgError:
        x, *_ = np.linalg.lstsq(Pd, -q, rcond=None)
        if not np.allclose(Pd @ x, -q, atol=1e-8 * (1 + np.abs(q).max())):
            raise ValueError(
                "unconstrained QP is unbounded below (q has a component "
                "outside range(P))") from None
    optval = float(0.5 * x @ Pd @ x + q @ x)
    n = q.shape[0]
    return {
        "x": x, "y": np.zeros(0), "l": np.zeros(0), "z": np.zeros(0),
        "s": np.zeros(0), "optval": optval, "iterations": 0,
        "num_iters": 0, "status": 0, "status_name": "SUCCESS",
        "solve_time": 0.0, "abs_tol": 0.0, "rel_tol": 0.0,
        "y_eq": np.zeros(0), "z_ineq": np.zeros(0),
        "z_lb": np.zeros(n), "z_ub": np.zeros(n),
    }
