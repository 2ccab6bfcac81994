"""Homogeneous self-dual embedding (HSDE) cone solver.

TPU-native redesign of SolveHsdeCone (src/cpu/pogs.cpp:1413-1888).  Solves

    minimize    c'x (+ 1/2 x'Px)
    subject to  b − A x ∈ K_y,   x free

via Douglas–Rachford splitting on the homogeneous embedding
u = [x; y; τ] ∈ R^{n+m+1}:

    w   = (I + Q)^{-1} u              (Q the skew HSDE operator)
    z   = Π_{R^n × K_y* × R_+}(2w − u)
    u  += α (z − w)

with adaptive over-relaxation α ∈ [1.0, 1.7] (×1.02 growth on residual
decrease, pogs.cpp:1769-1774), SCS-style primal/dual/gap convergence tests
every 10 iterations, and infeasibility/unboundedness certificates from
τ→0, κ>0 (pogs.cpp:1782-1832).  The whole solve is ONE jitted
lax.while_loop — residual checks live behind a lax.cond so they cost
nothing on off iterations.

Linear-solver strategies for (I + Q) w = u (all factor ONCE — Q is fixed):
  * 'smw'     — Sherman–Morrison–Woodbury through the cached Gram inverse
                (I + P + AᵀA)^{-1}: 4 gemv per iteration (pogs.cpp:1106-1357;
                the reference restricts SMW to LP — with the Gram operator
                extended by P it covers the QP embedding too).
  * 'direct'  — normal-equations Cholesky of MᵀM + δI (M = I+Q) with
                static regularization and iterative refinement
                (pogs.cpp:1527-1614), for embeddings small enough to
                factor (reference kDirectLimit: dim ≤ 2000).  Cholesky-
                based because f64 LU/inv does not lower on TPU.
                ('inverse' is accepted as an alias.)
  * 'cg'      — Jacobi-preconditioned CG on the normal equations with
                residual-tied tolerance (pogs.cpp:1359-1410), for operators
                too big to factor.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from pogs_tpu.types import Status
from pogs_tpu.cones.sets import ConeSet
from pogs_tpu.solver.anderson import AndersonState, anderson_init, anderson_step

_PRECISION = lax.Precision.HIGHEST

K_ALPHA_MIN = 1.0
K_ALPHA_MAX = 1.7
K_ALPHA_GROW = 1.02
K_TAU_TOL = 1e-8
K_TAU_REL = 1e-6  # tau/||w|| below this marks a certificate ray
K_KAPPA_TOL = 1e-6
K_CHECK_EVERY = 10


def _mv(M, v):
    return jnp.matmul(M, v, precision=_PRECISION)


def _ops(A):
    """(matvec, rmatvec) for a dense array or a matrix operator."""
    if hasattr(A, "mv"):
        return A.mv, A.rmv
    return (lambda x: _mv(A, x)), (lambda y: _mv(A.T, y))


def make_q_matvec(A, b, c, P=None):
    """Q [x;y;τ] = [Px + Aᵀy + cτ; −Ax + bτ; −cᵀx − bᵀy] (pogs.cpp:1013-1040)."""
    m, n = A.shape
    amv, armv = _ops(A)

    def q_matvec(u):
        x, y, tau = u[:n], u[n:n + m], u[n + m]
        top = armv(y) + c * tau
        if P is not None:
            top = top + _mv(P, x)
        mid = -amv(x) + b * tau
        bot = -jnp.vdot(c, x) - jnp.vdot(b, y)
        return jnp.concatenate([top, mid, bot[None]])

    def qt_matvec(u):
        x, y, tau = u[:n], u[n:n + m], u[n + m]
        top = -armv(y) - c * tau
        if P is not None:
            top = top + _mv(P, x)
        mid = amv(x) - b * tau
        bot = jnp.vdot(c, x) + jnp.vdot(b, y)
        return jnp.concatenate([top, mid, bot[None]])

    return q_matvec, qt_matvec


# ---------------------------------------------------------------------------
# Linear solvers for (I + Q) w = u.
# ---------------------------------------------------------------------------

def smw_setup(A, b, c, P=None):
    """Factor M = [I+P, Aᵀ; −A, I] via elimination: K = I + P + AᵀA, and
    precompute t = M⁻¹h, s_den = 1 + hᵀt for the rank-1 τ coupling
    (pogs.cpp:1141-1215)."""
    Ad = A.dense() if hasattr(A, "dense") else A
    m, n = Ad.shape
    dt = Ad.dtype
    K = jnp.eye(n, dtype=dt) + jnp.matmul(Ad.T, Ad, precision=_PRECISION)
    if P is not None:
        K = K + P
    L = jnp.linalg.cholesky(K)
    eye = jnp.eye(n, dtype=dt)
    Linv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    Kinv = jnp.matmul(Linv.T, Linv, precision=_PRECISION)

    rhs = c - _mv(Ad.T, b)
    t_x = _mv(Kinv, rhs)
    t_y = b + _mv(Ad, t_x)
    s_den = 1.0 + jnp.vdot(c, t_x) + jnp.vdot(b, t_y)
    return {"Kinv": Kinv, "t_x": t_x, "t_y": t_y, "s_den": s_den}


def smw_solve(factor, A, b, c, u):
    """(I + Q)⁻¹ u via SMW back-substitution (pogs.cpp:1230-1284).

    ``factor`` may carry an ``apply`` callable for (I+P+AᵀA)⁻¹ (used when
    the cached projector factor is the m×m wide-case inverse and the n×n
    solve goes through Woodbury); otherwise ``Kinv`` is the explicit n×n
    inverse."""
    m, n = A.shape
    amv, armv = _ops(A)
    apply_kinv = factor.get("apply") or (lambda v: _mv(factor["Kinv"], v))
    w_x, w_y, w_tau = u[:n], u[n:n + m], u[n + m]
    p_x = apply_kinv(w_x - armv(w_y))
    p_y = w_y + amv(p_x)
    h_dot_p = jnp.vdot(c, p_x) + jnp.vdot(b, p_y)
    u_tau = (w_tau + h_dot_p) / factor["s_den"]
    out_x = p_x - factor["t_x"] * u_tau
    out_y = p_y - factor["t_y"] * u_tau
    return jnp.concatenate([out_x, out_y, u_tau[None]])


def dense_q(A, b, c, P=None):
    """Materialize I + Q (dim×dim)."""
    A = A.dense() if hasattr(A, "dense") else A
    m, n = A.shape
    dt = A.dtype
    dim = n + m + 1
    M = jnp.zeros((dim, dim), dt)
    M = M.at[jnp.arange(dim), jnp.arange(dim)].set(1.0)
    if P is not None:
        M = M.at[:n, :n].add(P)
    M = M.at[:n, n:n + m].set(A.T)
    M = M.at[n:n + m, :n].set(-A)
    M = M.at[:n, n + m].set(c)
    M = M.at[n:n + m, n + m].set(b)
    M = M.at[n + m, :n].set(-c)
    M = M.at[n + m, n:n + m].set(-b)
    return M


def jacobi_inv_diag(A, b, c, P=None):
    """Jacobi preconditioner diag((I+Q)ᵀ(I+Q))⁻¹ (pogs.cpp:1483-1503)."""
    m, n = A.shape
    dt = A.dtype
    if hasattr(A, "sq_rmv"):
        col_a = A.sq_rmv(jnp.ones(m, dt))  # column norms² of A (x block)
        row_a = A.sq_mv(jnp.ones(n, dt))   # row norms² (y block)
    else:
        col_a = jnp.sum(A * A, axis=0)
        row_a = jnp.sum(A * A, axis=1)
    if P is not None:
        diag_p = jnp.diagonal(P)
        col_p = jnp.sum(P * P, axis=0)
    else:
        diag_p = jnp.zeros(n, dt)
        col_p = jnp.zeros(n, dt)
    dx = 1.0 + 2.0 * diag_p + col_p + col_a + c * c
    dy = 1.0 + row_a + b * b
    dtau = 1.0 + jnp.vdot(c, c) + jnp.vdot(b, b)
    d = jnp.concatenate([dx, dy, dtau[None]])
    return 1.0 / jnp.maximum(d, 1e-8)


def cg_solve_normal(q_matvec, qt_matvec, inv_diag, u, x0, tol, max_iter):
    """PCG on (I+Q)ᵀ(I+Q) w = (I+Q)ᵀ u (pogs.cpp:1359-1410)."""
    def normal(v):
        t = v + q_matvec(v)
        return t + qt_matvec(t)

    rhs = u + qt_matvec(u)
    r = rhs - normal(x0)
    z = r * inv_diag
    p = z
    rz = jnp.vdot(r, z)
    rhs_norm = jnp.linalg.norm(rhs)

    def cond(carry):
        x, r, z, p, rz, k, done = carry
        return jnp.logical_and(k < max_iter, jnp.logical_not(done))

    def body(carry):
        x, r, z, p, rz, k, _ = carry
        Ap = normal(p)
        pAp = jnp.vdot(p, Ap)
        alpha = rz / jnp.where(jnp.abs(pAp) <= 1e-20, 1e-20, pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        done = jnp.linalg.norm(r) <= tol * rhs_norm
        z = r * inv_diag
        rz_new = jnp.vdot(r, z)
        p = z + (rz_new / rz) * p
        return (x, r, z, p, rz_new, k + 1, done)

    x, *_ = lax.while_loop(cond, body, (x0, r, z, p, rz, 0, rhs_norm == 0))
    return x


# ---------------------------------------------------------------------------
# The DR loop.
# ---------------------------------------------------------------------------

class HsdeState(NamedTuple):
    u: jax.Array
    w: jax.Array
    alpha: jax.Array
    fp_resid: jax.Array
    prev_resid: jax.Array
    k: jax.Array
    done: jax.Array
    status: jax.Array
    r_pri: jax.Array
    r_dua: jax.Array
    gap: jax.Array
    aa: AndersonState


def hsde_solve(
    A,
    b,
    c,
    Ky: ConeSet,
    P=None,
    strategy: str = "smw",
    abs_tol: float = 1e-4,
    rel_tol: float = 1e-3,
    max_iter: int = 2500,
    smw_factor=None,
    use_anderson: bool = False,
    anderson_mem: int = 5,
    anderson_start: int = 10,
    u0=None,
):
    """Run the HSDE DR iteration on the *scaled* problem. Pure/traceable.

    Returns dict with w (final linear-solve state), status, final_iter,
    and diagnostics. Unscaling happens in the caller.
    """
    m, n = A.shape
    dt = A.dtype
    dim = n + m + 1
    Ky_dual = Ky.dual()

    amv, armv = _ops(A)
    q_matvec, qt_matvec = make_q_matvec(A, b, c, P)

    if strategy == "smw":
        factor = smw_factor if smw_factor is not None else smw_setup(A, b, c, P)

        def lin_solve(u, fp_resid):
            return smw_solve(factor, A, b, c, u)
    elif strategy in ("direct", "inverse"):
        # Direct normal-equations solve for (I+Q)w = u: Cholesky of
        # G = MᵀM + δI with static regularization and two iterative-
        # refinement steps against the unregularized system
        # (pogs.cpp:1527-1614; Cholesky-based — f64 LU/inv does not lower
        # on TPU).
        M = dense_q(A, b, c, P)
        delta = jnp.asarray(
            (1e-6 if dt == jnp.float32 else 1e-12) * dim, dt
        )
        G = jnp.matmul(M.T, M, precision=_PRECISION)
        G = G + delta * jnp.eye(dim, dtype=dt)
        L = jnp.linalg.cholesky(G)

        def _solve_G(r):
            return jax.scipy.linalg.cho_solve((L, True), r)

        def lin_solve(u, fp_resid):
            rhs = _mv(M.T, u)
            w = _solve_G(rhs)
            for _ in range(2):  # refinement vs the unregularized MᵀM
                resid = rhs - _mv(M.T, _mv(M, w))
                w = w + _solve_G(resid)
            return w
    elif strategy == "cg":
        inv_diag = jacobi_inv_diag(A, b, c, P)
        cg_max = min(20000, 20 * dim)

        def lin_solve(u, fp_resid):
            # CG stops on ||r|| <= tol * ||rhs||, but the *solution* error is
            # ~cond(MᵀM) * tol — a proportional tolerance alone therefore has
            # a fixed point where the DR residual stalls at cond * tol (seen
            # on LPs: iterates at the optimum, convergence test never firing).
            # One iterative-refinement pass squares the effective accuracy
            # (err ~ cond * tol^2), which restores the contraction.
            u_norm = jnp.maximum(jnp.linalg.norm(u), 1.0)
            tol = jnp.clip(0.1 * fp_resid / u_norm, 1e-12, 1e-2)
            w = cg_solve_normal(q_matvec, qt_matvec, inv_diag, u, u, tol, cg_max)
            r = u - (w + q_matvec(w))
            dw = cg_solve_normal(q_matvec, qt_matvec, inv_diag, r,
                                 jnp.zeros_like(r), tol, cg_max)
            return w + dw
    else:
        raise ValueError(f"unknown HSDE strategy {strategy!r}")

    b_norm = jnp.linalg.norm(b)
    c_norm = jnp.linalg.norm(c)
    sqm = jnp.sqrt(jnp.asarray(m, dt))
    sqn = jnp.sqrt(jnp.asarray(n, dt))
    abs_tol = jnp.asarray(abs_tol, dt)
    rel_tol = jnp.asarray(rel_tol, dt)

    def convergence_check(st: HsdeState) -> HsdeState:
        """Every-10-iterations residual / certificate test (pogs.cpp:1713-1832)."""
        w = st.w
        tau = w[n + m]

        def tau_pos(_):
            x_s = w[:n] / tau
            y_s = w[n:n + m] / tau
            s_s = b - amv(x_s)
            r_pri = jnp.linalg.norm(s_s - Ky.project(s_s))
            s_norm = jnp.linalg.norm(s_s)
            r_dua_cone = jnp.linalg.norm(y_s - Ky_dual.project(y_s))
            aty = armv(y_s)
            quad = jnp.asarray(0.0, dt)
            if P is not None:
                px = _mv(P, x_s)
                quad = jnp.vdot(x_s, px)
                aty = aty + px
            at_norm = jnp.linalg.norm(aty)
            r_dua = jnp.linalg.norm(aty + c)
            eps_pri = sqm * abs_tol + rel_tol * jnp.maximum(b_norm, s_norm)
            eps_dua = sqn * abs_tol + rel_tol * jnp.maximum(at_norm, c_norm)
            y_norm = jnp.linalg.norm(y_s)
            eps_cone = sqm * abs_tol + rel_tol * jnp.maximum(1.0, y_norm)
            gap = jnp.abs(jnp.vdot(c, x_s) + jnp.vdot(b, y_s) + quad)
            eps_gap = abs_tol + rel_tol * jnp.maximum(1.0, gap)

            curr = r_pri + r_dua + r_dua_cone + gap
            alpha = jnp.where(
                curr <= st.prev_resid * 0.99,
                jnp.minimum(K_ALPHA_MAX, st.alpha * K_ALPHA_GROW),
                jnp.asarray(K_ALPHA_MIN, dt),
            )
            converged = (
                (r_pri <= eps_pri) & (r_dua <= eps_dua)
                & (r_dua_cone <= eps_cone) & (gap <= eps_gap)
            )
            status = jnp.where(converged, Status.SUCCESS.value, st.status)
            return alpha, curr, converged, status, r_pri, r_dua, gap

        def tau_zero(_):
            x_h = w[:n]
            y_h = w[n:n + m]
            kappa = -jnp.vdot(c, x_h) - jnp.vdot(b, y_h)
            fp_tol = abs_tol * jnp.sqrt(jnp.asarray(dim, dt)) + rel_tol
            check = (kappa > K_KAPPA_TOL) & (st.fp_resid <= fp_tol)

            # Unboundedness needs the ray to keep b − A(x+t·x̂) inside K_y,
            # i.e. −A x̂ in the recession cone of K_y — measured as the cone
            # distance.  (The reference tests ‖A x̂‖ = 0, pogs.cpp:1826,
            # which is only correct when every row is a Zero cone.)
            ax_dist = Ky.distance(-amv(x_h))
            aty_norm = jnp.linalg.norm(armv(y_h))
            y_cone = jnp.linalg.norm(y_h - Ky_dual.project(y_h))
            p_norm = jnp.asarray(0.0, dt)
            if P is not None:
                p_norm = jnp.linalg.norm(_mv(P, x_h))
            b_dot_y = jnp.vdot(b, y_h)
            c_dot_x = jnp.vdot(c, x_h)
            cert_tol = abs_tol + rel_tol

            b_neg = -b_dot_y
            infeas = check & (b_neg > cert_tol) & (jnp.abs(c_dot_x) <= cert_tol * b_neg) \
                & (aty_norm <= cert_tol * b_neg) & (y_cone <= cert_tol * b_neg)
            c_neg = -c_dot_x
            unbdd = check & (c_neg > cert_tol) & (jnp.abs(b_dot_y) <= cert_tol * c_neg) \
                & (ax_dist <= cert_tol * c_neg) & (p_norm <= cert_tol * c_neg)

            status = jnp.where(
                infeas, Status.INFEASIBLE.value,
                jnp.where(unbdd, Status.UNBOUNDED.value, st.status),
            )
            return (st.alpha, st.prev_resid, infeas | unbdd, status,
                    st.r_pri, st.r_dua, st.gap)

        # Branch on tau RELATIVE to the iterate: on the solution ray tau
        # converges to a positive value; on a certificate ray the iterate
        # normalizes with tau -> 0.  A pure absolute threshold misses
        # certificates whose tau hovers just above it (tau = 2e-8 with
        # kappa = 0.44 observed on an unbounded LP).
        w_norm = jnp.linalg.norm(w)
        alpha, prev_resid, done_new, status, r_pri, r_dua, gap = lax.cond(
            tau > jnp.maximum(K_TAU_TOL, K_TAU_REL * w_norm), tau_pos, tau_zero,
            None,
        )
        return st._replace(
            alpha=alpha, prev_resid=prev_resid,
            done=st.done | done_new, status=status.astype(jnp.int32),
            r_pri=r_pri, r_dua=r_dua, gap=gap,
        )

    def body(st: HsdeState) -> HsdeState:
        w = lin_solve(st.u, st.fp_resid)
        v = 2.0 * w - st.u
        # Project: x free, y onto K_y*, τ onto R_+ (pogs.cpp:1699-1704).
        z_y = Ky_dual.project(v[n:n + m])
        z = jnp.concatenate([v[:n], z_y, jnp.maximum(v[n + m], 0.0)[None]])
        u = st.u + st.alpha * (z - w)
        fp_resid = jnp.linalg.norm(z - w)
        if use_anderson:
            # Type-II AA on the DR fixed-point map u ↦ u⁺ (Anderson-
            # accelerated Douglas–Rachford, arXiv:1908.11482), safeguarded:
            # the history resets whenever the fixed-point residual grows,
            # which reverts the next step to plain DR.
            u_acc, aa_state = anderson_step(st.aa, st.u, u)
            grew = fp_resid > 1.0 * st.fp_resid
            aa_state = aa_state._replace(
                k=jnp.where(grew, 0, aa_state.k)
            )
            take = (st.k >= anderson_start) & jnp.logical_not(grew)
            u = jnp.where(take, u_acc, u)
            st = st._replace(aa=aa_state)
        st = st._replace(u=u, w=w, fp_resid=fp_resid)

        st = lax.cond(
            (st.k % K_CHECK_EVERY == 0) | (st.k >= max_iter - 1),
            convergence_check, lambda s: s, st,
        )
        done = st.done | (st.k >= max_iter - 1) | jnp.logical_not(jnp.isfinite(fp_resid))
        return st._replace(k=jnp.where(st.done, st.k, st.k + 1), done=done)

    if u0 is None:
        u0 = jnp.zeros(dim, dt).at[n + m].set(1.0)
    else:
        u0 = jnp.asarray(u0, dt)
    init = HsdeState(
        u=u0,
        w=jnp.zeros(dim, dt),
        alpha=jnp.asarray(K_ALPHA_MIN, dt),
        fp_resid=jnp.asarray(1.0, dt),
        prev_resid=jnp.asarray(jnp.finfo(dt).max, dt),
        k=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
        status=jnp.asarray(Status.MAX_ITER.value, jnp.int32),
        r_pri=jnp.asarray(0.0, dt),
        r_dua=jnp.asarray(0.0, dt),
        gap=jnp.asarray(0.0, dt),
        aa=anderson_init(dim if use_anderson else 0,
                         anderson_mem if use_anderson else 1, dt),
    )
    st = lax.while_loop(lambda s: jnp.logical_not(s.done), body, init)

    return {
        "w": st.w,
        "u": st.u,
        "status": st.status,
        "final_iter": st.k,
        "fp_resid": st.fp_resid,
        "r_pri": st.r_pri,
        "r_dua": st.r_dua,
        "gap": st.gap,
    }
