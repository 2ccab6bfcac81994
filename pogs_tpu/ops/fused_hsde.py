"""The HSDE cone solve as ONE VMEM-resident Pallas kernel.

Counterpart of :mod:`pogs_tpu.ops.fused_admm` for the cone path
(BASELINE north star: batched SOC/nonneg cone projections as Pallas
kernels): the whole Douglas–Rachford iteration on the homogeneous
self-dual embedding — the SMW linear solve, the dual-cone projection,
adaptive over-relaxation, residual/certificate checks — runs inside one
kernel with A, Aᵀ, the Gram inverse and all state pinned in VMEM.

Supported (falls back to the XLA loop otherwise — see
:func:`fused_hsde_eligible`):
  * dense A that fits VMEM, SMW linear solve (no quadratic P);
  * cones: Zero / NonNeg / NonPos masks + SOC and exponential (primal +
    dual) constraints over *contiguous* index ranges (the layout
    CVXPY/SCS-style data always has).  The exp projection is the same
    fixed-iteration two-branch bisection as the XLA path
    (cones/projections.py::project_exp_primal) — pure elementwise ops,
    Mosaic-compatible.  SDP uses the XLA loop (batched eigh).

Semantics match :func:`pogs_tpu.solver.hsde.hsde_solve` exactly; the
residual/certificate check runs behind an in-kernel ``lax.cond`` on the
same every-10-iterations cadence.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pogs_tpu.types import Cone, Status
from pogs_tpu.cones.sets import ConeSet
from pogs_tpu.solver.hsde import (
    K_ALPHA_MIN, K_ALPHA_MAX, K_ALPHA_GROW, K_TAU_TOL, K_TAU_REL,
    K_KAPPA_TOL, K_CHECK_EVERY, K_CERT_CROSS, K_CERT_CONFIRM,
)
from pogs_tpu.ops.fused_admm import pad_to

# HSDE kernel budget, boundary-probed on v5e: 768x384 (need 12.3 MB under
# the x4 model) compiles, 896x384 (13.7 MB) OOMs.
_VMEM_BUDGET = int(12.5 * 1024 * 1024)

_LANE = 128


def _segments(Kset: ConeSet):
    """(kind, start, length) for structured cones; None if non-contiguous."""
    segs = []
    for con in Kset.constraints:
        if con.cone in (Cone.ZERO, Cone.NON_NEG, Cone.NON_POS):
            continue
        idx = list(con.indices)
        if idx != list(range(idx[0], idx[0] + len(idx))):
            return None
        segs.append((con.cone, idx[0], len(idx)))
    return segs


def fused_hsde_eligible(m: int, n: int, dtype, Ky: ConeSet,
                        has_P: bool, use_anderson: bool) -> bool:
    if has_P or use_anderson:
        return False
    segs = _segments(Ky)
    if segs is None or len(segs) > 16:
        return False
    if any(kind == Cone.SDP for kind, _, _ in segs):
        return False
    mp, np_ = pad_to(m), pad_to(n)
    k = min(mp, np_)
    itemsize = jnp.dtype(dtype).itemsize
    need = 4 * (2 * mp * np_ + k * k + 30 * (mp + np_)) * itemsize
    return need <= _VMEM_BUDGET


def _mm(a, b):
    return lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST, preferred_element_type=a.dtype,
    )


def _nrm(v):
    return jnp.sqrt(jnp.sum(v * v))


def _soc_project(seg):
    """Closed-form SOC projection of a (1, L) row (head = first entry)."""
    p = seg[:, 0:1]
    tail = seg[:, 1:]
    nrm = _nrm(tail)
    tiny = jnp.asarray(jnp.finfo(seg.dtype).tiny, seg.dtype)
    scale = 0.5 * (1.0 + p / jnp.maximum(nrm, tiny))
    head = jnp.where(nrm <= -p, 0.0,
                     jnp.where(nrm >= jnp.abs(p), scale * nrm, p))
    tail_scale = jnp.where(nrm <= -p, 0.0,
                           jnp.where(nrm >= jnp.abs(p), scale, 1.0))
    return jnp.concatenate([head, tail * tail_scale], axis=1)


def _exp_primal_project(seg, bisect_iters: int = 50):
    """Mosaic-safe exp-cone projection of ONE (1, 3) segment.

    Same algorithm as cones/projections.py::project_exp_primal
    (per-branch multi-bracket bisection + valid-nearest candidate
    selection), but every intermediate stays rank-2 and the
    argmin/take_along_axis gather is replaced by sequential
    where-selection — Mosaic supports neither 1-D vectors nor >2-D
    gathers inside kernels."""
    dt = seg.dtype
    f32 = dt == jnp.float32
    tol = jnp.asarray(1e-6 if f32 else 1e-8, dt)
    U = 22.0 if f32 else 50.0
    r = seg[:, 0:1]
    sv = seg[:, 1:2]
    t = seg[:, 2:3]

    def safe_exp(x):
        return jnp.exp(jnp.clip(x, -3 * U, 3 * U))

    def sign_F(u):
        w = safe_exp(u)
        w2 = w * w
        G = w2 * (sv - r * (1.0 - u)) + u * (sv + t * w * (1.0 - u)) - t * w - r
        return jnp.sign(G) * jnp.sign(w2 + u)

    u_pole = -0.4263027510068963
    eps = 1e-6 if f32 else 1e-9

    def bisect(lo, hi):
        slo = sign_F(lo)
        for _ in range(bisect_iters):
            mid = 0.5 * (lo + hi)
            go_right = sign_F(mid) == slo
            lo = jnp.where(go_right, mid, lo)
            hi = jnp.where(go_right, hi, mid)
        return 0.5 * (lo + hi)

    # Multi-bracket scan per branch (same constants as projections.py —
    # trajectory parity): G can have several roots per branch and only
    # the KKT-valid one (λ ≥ 0) is the projection.  Sequential
    # where-selection bracket bookkeeping instead of cumsum/argmax —
    # Mosaic-safe rank-2 registers.
    N_GRID, N_KEEP = 65, 3

    def branch_roots(lo0, hi0):
        us = np.linspace(lo0, hi0, N_GRID)
        prev_u = jnp.full_like(r, us[0])
        prev_s = sign_F(prev_u)
        false2 = jnp.zeros_like(r) > jnp.ones_like(r)
        br = [(prev_u, prev_u, false2) for _ in range(N_KEEP)]
        count = jnp.zeros_like(r, jnp.int32)
        for ui in us[1:]:
            cur_u = jnp.full_like(r, ui)
            cur_s = sign_F(cur_u)
            flip = prev_s * cur_s <= 0
            br = [
                (jnp.where(flip & (count == j), prev_u, blo),
                 jnp.where(flip & (count == j), cur_u, bhi),
                 bhas | (flip & (count == j)))
                for j, (blo, bhi, bhas) in enumerate(br)
            ]
            count = count + flip.astype(jnp.int32)
            prev_u, prev_s = cur_u, cur_s
        return [(bisect(blo, bhi), bhas) for blo, bhi, bhas in br]

    def gen_candidate(u, bracketed):
        # Cancellation-free forms (projections.py::gen_candidate):
        #   z* = w (r + t w)/(w² + u),  y* = z*/w,  λ = z* − t
        w = safe_exp(u)
        denom = w * w + u
        denom = jnp.where(jnp.abs(denom) < 1e-30, jnp.asarray(1e-30, dt), denom)
        num = (r + t * w) / denom
        z_star = w * num
        feas = bracketed & (z_star > 0) \
            & (z_star - t >= -tol * (1.0 + jnp.abs(t)))
        return jnp.concatenate([u * num, num, z_star], axis=1), feas

    gens = [gen_candidate(u, has)
            for u, has in (branch_roots(-U, u_pole - eps)
                           + branch_roots(u_pole + eps, U))]
    ray = jnp.concatenate(
        [jnp.minimum(r, 0.0), jnp.zeros_like(sv), jnp.maximum(t, 0.0)], axis=1
    )
    zero = jnp.zeros_like(seg)
    spos = jnp.maximum(sv, jnp.asarray(jnp.finfo(dt).tiny, dt))
    in_cone = ((sv > tol) & (spos * safe_exp(r / spos) <= t + tol)) | (
        (jnp.abs(sv) <= tol) & (r <= tol) & (t >= -tol)
    )
    INF = jnp.asarray(jnp.finfo(dt).max, dt)

    def d2(cand):
        return jnp.sum((cand - seg) ** 2, axis=1, keepdims=True)

    # Same candidate ORDER as projections.py (v, ray, zero, gens...);
    # strict < keeps the first minimum exactly like argmin does.
    best = seg
    best_d = jnp.where(in_cone, d2(seg), INF)
    for cand, feas in [(ray, None), (zero, None)] + gens:
        dd = d2(cand)
        if feas is not None:
            dd = jnp.where(feas, dd, INF)
        take = dd < best_d
        best = jnp.where(take, cand, best)
        best_d = jnp.where(take, dd, best_d)
    return best


def _exp_dual_project(seg, bisect_iters: int = 80):
    """Moreau: Π_{K*}(v) = v + Π_K(−v) — same iteration budget as
    cones/projections.py::project_exp_dual."""
    return seg + _exp_primal_project(-seg, bisect_iters)


def _kernel_body(
    # static closure
    m, n, tall, segs, dual_segs, settings_tuple, dt, has_zero, has_nonneg,
    has_nonpos, dual_has_nonneg, dual_has_nonpos,
    # refs: matrices/factors
    A_ref, At_ref, Kinv_ref,
    # problem data
    b_ref, c_ref, tx_ref, ty_ref, scal_ref, u0x_ref, u0y_ref,
    # cone masks (primal + dual), padded (1, Mp) float32 0/1
    zm_ref, nnm_ref, npm_ref, dnnm_ref, dnpm_ref,
    # outputs
    wx_ref, wy_ref, ux_ref, uy_ref, stats_ref,
):
    abs_tol_f, rel_tol_f, max_iter = settings_tuple
    abs_tol = jnp.asarray(abs_tol_f, dt)
    rel_tol = jnp.asarray(rel_tol_f, dt)
    A = A_ref[:]
    At = At_ref[:]
    Kinv = Kinv_ref[:]
    b = b_ref[:]          # (1, Mp) scaled
    c = c_ref[:]          # (1, Np) scaled
    t_x = tx_ref[:]
    t_y = ty_ref[:]
    s_den = scal_ref[0, 0]
    b_norm = scal_ref[0, 1]
    c_norm = scal_ref[0, 2]

    zero_m = zm_ref[:] != 0
    nonneg_m = nnm_ref[:] != 0
    nonpos_m = npm_ref[:] != 0
    d_nonneg_m = dnnm_ref[:] != 0
    d_nonpos_m = dnpm_ref[:] != 0

    one = jnp.asarray(1.0, dt)
    sqm = jnp.sqrt(jnp.asarray(m, dt))
    sqn = jnp.sqrt(jnp.asarray(n, dt))
    dim = m + n + 1
    fp_tol = abs_tol * jnp.sqrt(jnp.asarray(dim, dt)) + rel_tol
    cert_tol = abs_tol + rel_tol

    def _apply_segs(out, seg_list):
        # Mosaic rejects zero-width slices — skip empty flanks.
        for kind, s, L in seg_list:
            chunk = out[:, s:s + L]
            if kind == Cone.SOC:
                proj = _soc_project(chunk)
            elif kind == Cone.EXP_PRIMAL:
                proj = _exp_primal_project(chunk)
            elif kind == Cone.EXP_DUAL:
                proj = _exp_dual_project(chunk)
            else:  # pragma: no cover - eligibility excludes SDP
                proj = chunk
            parts = []
            if s > 0:
                parts.append(out[:, :s])
            parts.append(proj)
            if s + L < out.shape[1]:
                parts.append(out[:, s + L:])
            out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
        return out

    def proj_primal(v):
        out = v
        if has_zero:
            out = jnp.where(zero_m, 0.0, out)
        if has_nonneg:
            out = jnp.where(nonneg_m, jnp.maximum(out, 0.0), out)
        if has_nonpos:
            out = jnp.where(nonpos_m, jnp.minimum(out, 0.0), out)
        return _apply_segs(out, segs)

    def proj_dual(v):
        # Dual cone: Zero -> free (identity), NonNeg/NonPos self-dual,
        # SOC self-dual (same segments).
        out = v
        if dual_has_nonneg:
            out = jnp.where(d_nonneg_m, jnp.maximum(out, 0.0), out)
        if dual_has_nonpos:
            out = jnp.where(d_nonpos_m, jnp.minimum(out, 0.0), out)
        return _apply_segs(out, dual_segs)

    if tall:
        def kinv_apply(v):  # (1, Np): Kinv = (I + AᵀA)⁻¹
            return _mm(v, Kinv)
    else:
        def kinv_apply(v):  # Woodbury through the m×m (I + AAᵀ)⁻¹
            w = _mm(_mm(v, At), Kinv)  # A v -> (1, Mp); then Kinv
            return v - _mm(w, A)       # v - Aᵀ w

    def lin_solve(ux, uy, ut):
        # SMW back-substitution (hsde.py smw_solve).
        p_x = kinv_apply(ux - _mm(uy, A))   # uy @ A = A^T uy
        p_y = uy + _mm(p_x, At)             # p_x @ At = A p_x
        h_dot_p = jnp.sum(c * p_x) + jnp.sum(b * p_y)
        u_tau = (ut + h_dot_p) / s_den
        return p_x - t_x * u_tau, p_y - t_y * u_tau, u_tau

    def body(st):
        (ux, uy, ut, wx, wy, wt, alpha, fp_resid, prev_resid, k, done,
         status, r_pri_o, r_dua_o, gap_o, cert_pending) = st
        wx, wy, wt = lin_solve(ux, uy, ut)
        vx = 2.0 * wx - ux
        vy = 2.0 * wy - uy
        vt = 2.0 * wt - ut
        zy = proj_dual(vy)
        zt = jnp.maximum(vt, 0.0)
        ux_n = ux + alpha * (vx - wx)       # x part: z = v (free)
        uy_n = uy + alpha * (zy - wy)
        ut_n = ut + alpha * (zt - wt)
        fp = jnp.sqrt(
            jnp.sum((vx - wx) ** 2) + jnp.sum((zy - wy) ** 2)
            + (zt - wt) ** 2
        )

        # ---- residual / certificate check (hsde.py:307-389), behind a
        # lax.cond so the 4 extra matvecs run only every 10th iteration ---
        slot = (k % K_CHECK_EVERY == 0) | (k >= max_iter - 1)

        def run_check(_):
            # Branch on tau relative to the iterate norm (see hsde.py).
            kappa_w = -jnp.sum(c * wx) - jnp.sum(b * wy)
            w_norm = jnp.sqrt(jnp.sum(wx * wx) + jnp.sum(wy * wy) + wt * wt)
            tau_ok = wt > jnp.maximum(jnp.asarray(K_TAU_TOL, dt),
                                      K_TAU_REL * w_norm)
            tau_safe = jnp.where(tau_ok, wt, one)
            x_s = wx / tau_safe
            y_s = wy / tau_safe
            ax = _mm(x_s, At)                   # A x_s
            s_s = b - ax
            r_pri = _nrm(s_s - proj_primal(s_s))
            r_dua_cone = _nrm(y_s - proj_dual(y_s))
            aty = _mm(y_s, A)
            r_dua = _nrm(aty + c)
            eps_pri = sqm * abs_tol + rel_tol * jnp.maximum(b_norm, _nrm(s_s))
            eps_dua = sqn * abs_tol + rel_tol * jnp.maximum(_nrm(aty), c_norm)
            eps_cone = sqm * abs_tol + rel_tol * jnp.maximum(one, _nrm(y_s))
            cx_s = jnp.sum(c * x_s)
            by_s = jnp.sum(b * y_s)
            gap = jnp.abs(cx_s + by_s)
            # Scale-invariant gap test — twin of hsde.py (see rationale
            # there): relative to max(1, |c'x|, |b'y|, gap), the standard
            # conic criterion, instead of the reference's absolute-for-
            # small-gap max(1, gap) form which is unattainable in f32 on
            # objectives of magnitude >> 1.
            eps_gap = abs_tol + rel_tol * jnp.maximum(
                jnp.maximum(one, gap),
                jnp.maximum(jnp.abs(cx_s), jnp.abs(by_s)))
            curr = r_pri + r_dua + r_dua_cone + gap
            alpha_pos = jnp.where(
                curr <= prev_resid * 0.99,
                jnp.minimum(jnp.asarray(K_ALPHA_MAX, dt),
                            alpha * K_ALPHA_GROW),
                jnp.asarray(K_ALPHA_MIN, dt),
            )
            converged = (
                (r_pri <= eps_pri) & (r_dua <= eps_dua)
                & (r_dua_cone <= eps_cone) & (gap <= eps_gap)
            )

            # tau ~ 0: infeasibility / unboundedness certificates.
            # Dominance + confirmation-burst classification — trajectory
            # twin of hsde.py tau_zero (see the rationale there).
            check = (kappa_w > K_KAPPA_TOL) & (fp <= fp_tol)
            ax_h = _mm(wx, At)
            ax_dist = _nrm(-ax_h - proj_primal(-ax_h))
            aty_h = _nrm(_mm(wy, A))
            y_cone_h = _nrm(wy - proj_dual(wy))
            b_dot_y = jnp.sum(b * wy)
            c_dot_x = jnp.sum(c * wx)
            b_neg = -b_dot_y
            c_neg = -c_dot_x
            infeas_sup = (check & (b_neg > cert_tol)
                          & (aty_h <= cert_tol * b_neg)
                          & (y_cone_h <= cert_tol * b_neg))
            unbdd_sup = (check & (c_neg > cert_tol)
                         & (ax_dist <= cert_tol * c_neg))
            eps_d = jnp.asarray(1e-12, dt)
            joint = jnp.sqrt(jnp.sum(wx * wx) + jnp.sum(wy * wy)) + eps_d
            beta = b_neg / (joint * jnp.maximum(b_norm, eps_d))
            gamma_s = c_neg / (joint * jnp.maximum(c_norm, eps_d))
            both = infeas_sup & unbdd_sup
            infeas = infeas_sup & ((gamma_s <= K_CERT_CROSS * beta)
                                   | (both & (beta >= gamma_s)))
            unbdd = unbdd_sup & jnp.logical_not(infeas) \
                & ((beta <= K_CERT_CROSS * gamma_s)
                   | (both & (gamma_s > beta)))

            fired = jnp.where(infeas, 1, jnp.where(unbdd, 2, 0)).astype(
                jnp.int32)
            confirm = (fired > 0) & (fired == cert_pending) \
                & (fp <= K_CERT_CONFIRM * fp_tol)
            done_tau0 = confirm
            status_tau0 = jnp.where(
                confirm & infeas, Status.INFEASIBLE.value,
                jnp.where(confirm & unbdd, Status.UNBOUNDED.value, status),
            ).astype(jnp.int32)

            alpha_new = jnp.where(tau_ok, alpha_pos, alpha)
            prev_new = jnp.where(tau_ok, curr, prev_resid)
            done_new = jnp.where(tau_ok, converged, done_tau0)
            status_new = jnp.where(
                tau_ok,
                jnp.where(converged, Status.SUCCESS.value,
                          status).astype(jnp.int32),
                status_tau0,
            )
            pending_new = jnp.where(tau_ok, 0, fired).astype(jnp.int32)
            return (alpha_new, prev_new, done_new, status_new,
                    jnp.where(tau_ok, r_pri, r_pri_o),
                    jnp.where(tau_ok, r_dua, r_dua_o),
                    jnp.where(tau_ok, gap, gap_o), pending_new)

        def skip_check(_):
            return (alpha, prev_resid, jnp.asarray(False), status,
                    r_pri_o, r_dua_o, gap_o, cert_pending)

        (alpha_u, prev_u, done_new, status_u, r_pri_u, r_dua_u,
         gap_u, pending_u) = lax.cond(slot, run_check, skip_check, None)

        done_checked = done | done_new
        done_out = done_checked | (k >= max_iter - 1) | ~jnp.isfinite(fp)
        return (
            ux_n, uy_n, ut_n, wx, wy, wt,
            alpha_u, fp, prev_u,
            jnp.where(done_checked, k, k + 1), done_out,
            status_u, r_pri_u, r_dua_u, gap_u, pending_u,
        )

    Np = c.shape[1]
    Mp = b.shape[1]
    ut0 = scal_ref[0, 3]
    init = (
        u0x_ref[:], u0y_ref[:], ut0,
        jnp.zeros((1, Np), dt), jnp.zeros((1, Mp), dt), jnp.asarray(1.0, dt),
        jnp.asarray(K_ALPHA_MIN, dt), jnp.asarray(1.0, dt),
        jnp.asarray(jnp.finfo(dt).max, dt),
        jnp.asarray(0, jnp.int32), jnp.asarray(False),
        jnp.asarray(Status.MAX_ITER.value, jnp.int32),
        jnp.asarray(0.0, dt), jnp.asarray(0.0, dt), jnp.asarray(0.0, dt),
        jnp.asarray(0, jnp.int32),
    )
    st = lax.while_loop(lambda s: jnp.logical_not(s[10]), body, init)
    (ux, uy, ut, wx, wy, wt, alpha, fp, prev, k, done, status,
     r_pri, r_dua, gap, _cert_pending) = st

    wx_ref[:] = wx
    wy_ref[:] = wy
    ux_ref[:] = ux
    uy_ref[:] = uy
    lane = lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)
    stats = jnp.zeros((1, _LANE), dt)
    for slot_i, val in enumerate(
        (wt, k.astype(dt), status.astype(dt), fp, r_pri, r_dua, gap, ut)
    ):
        stats = jnp.where(lane == slot_i, val, stats)
    stats_ref[:] = stats


def fused_hsde_solve(
    A,
    b,
    c,
    Ky: ConeSet,
    Kinv,
    t_x,
    t_y,
    s_den,
    abs_tol: float,
    rel_tol: float,
    max_iter: int,
    interpret: Optional[bool] = None,
    u0=None,
):
    """Drop-in fused counterpart of hsde_solve (SMW strategy).

    ``Kinv/t_x/t_y/s_den`` are the SMW factor pieces (from the cone init).
    Returns the same dict as ``hsde_solve``."""
    A = A.dense() if hasattr(A, "dense") else A
    m, n = A.shape
    dt = A.dtype
    mp, np_ = pad_to(m), pad_to(n)
    tall = m >= n

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    segs = _segments(Ky)
    dual = Ky.dual()
    dual_segs = _segments(dual)

    def mask_of(Kset, kind, size, pad):
        mask = np.zeros(pad, np.float32)
        for con in Kset.constraints:
            if con.cone == kind:
                mask[np.asarray(con.indices)] = 1.0
        return jnp.asarray(mask)[None, :]

    zm = mask_of(Ky, Cone.ZERO, m, mp)
    nnm = mask_of(Ky, Cone.NON_NEG, m, mp)
    npm = mask_of(Ky, Cone.NON_POS, m, mp)
    dnnm = mask_of(dual, Cone.NON_NEG, m, mp)
    dnpm = mask_of(dual, Cone.NON_POS, m, mp)
    has = lambda Kset, kind: any(c_.cone == kind for c_ in Kset.constraints)

    A_pad = jnp.zeros((mp, np_), dt).at[:m, :n].set(A)
    At_pad = A_pad.T
    kp = np_ if tall else mp
    k_real = Kinv.shape[0]
    Kinv_pad = jnp.eye(kp, dtype=dt).at[:k_real, :k_real].set(Kinv)

    b_pad = jnp.zeros((1, mp), dt).at[0, :m].set(jnp.asarray(b, dt))
    c_pad = jnp.zeros((1, np_), dt).at[0, :n].set(jnp.asarray(c, dt))
    tx_pad = jnp.zeros((1, np_), dt).at[0, :n].set(jnp.asarray(t_x, dt))
    ty_pad = jnp.zeros((1, mp), dt).at[0, :m].set(jnp.asarray(t_y, dt))
    scal = jnp.zeros((1, _LANE), dt)
    scal = scal.at[0, 0].set(jnp.asarray(s_den, dt))
    scal = scal.at[0, 1].set(jnp.linalg.norm(jnp.asarray(b, dt)))
    scal = scal.at[0, 2].set(jnp.linalg.norm(jnp.asarray(c, dt)))
    if u0 is None:
        u0x = jnp.zeros((1, np_), dt)
        u0y = jnp.zeros((1, mp), dt)
        scal = scal.at[0, 3].set(jnp.asarray(1.0, dt))
    else:
        u0 = jnp.asarray(u0, dt)
        u0x = jnp.zeros((1, np_), dt).at[0, :n].set(u0[:n])
        u0y = jnp.zeros((1, mp), dt).at[0, :m].set(u0[n:n + m])
        scal = scal.at[0, 3].set(u0[n + m])

    kern = functools.partial(
        _kernel_body, m, n, tall, tuple(segs), tuple(dual_segs),
        (float(abs_tol), float(rel_tol), max_iter), dt,
        has(Ky, Cone.ZERO), has(Ky, Cone.NON_NEG), has(Ky, Cone.NON_POS),
        has(dual, Cone.NON_NEG), has(dual, Cone.NON_POS),
    )
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((1, np_), dt),   # w_x
            jax.ShapeDtypeStruct((1, mp), dt),    # w_y
            jax.ShapeDtypeStruct((1, np_), dt),   # u_x
            jax.ShapeDtypeStruct((1, mp), dt),    # u_y
            jax.ShapeDtypeStruct((1, _LANE), dt),  # stats
        ],
        in_specs=[vm] * 15,
        out_specs=[vm] * 5,
        interpret=interpret,
    )(A_pad, At_pad, Kinv_pad, b_pad, c_pad, tx_pad, ty_pad, scal,
      u0x, u0y, zm, nnm, npm, dnnm, dnpm)
    wx, wy, ux, uy, stats = outs

    w = jnp.concatenate([wx[0, :n], wy[0, :m], stats[0, 0:1]])
    u_out = jnp.concatenate([ux[0, :n], uy[0, :m], stats[0, 7:8]])
    return {
        "w": w,
        "u": u_out,
        "status": stats[0, 2].astype(jnp.int32),
        "final_iter": stats[0, 1].astype(jnp.int32),
        "fp_resid": stats[0, 3],
        "r_pri": stats[0, 4],
        "r_dua": stats[0, 5],
        "gap": stats[0, 6],
    }
