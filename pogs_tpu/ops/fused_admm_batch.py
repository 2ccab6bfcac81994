"""Batched graph-form ADMM: K solves per VMEM-resident Pallas kernel.

The vmapped XLA loop (pogs_tpu/parallel/batch.py) is one device program,
but each of its ~25 fused ops per iteration carries scheduling overhead —
measured 68 µs/iteration for a K=128 λ-sweep whose HBM traffic costs ~2 µs.
This kernel runs a CHUNK of lanes entirely in VMEM: state is (K_c, ·)
matrices, the projection is one MXU matmul for the whole chunk, and the
while-loop exits when every lane in the chunk is done.  Chunks map to the
Pallas grid (sequential per core), so one ``pallas_call`` processes any
batch size with a fixed VMEM footprint.

Semantics track ``jax.vmap``(admm_loop) lane-for-lane:

  * the per-lane "near tolerance" exact-residual decision is a per-lane
    select of both branches — which is precisely what ``vmap`` lowers the
    XLA loop's ``lax.cond`` to, so trajectories agree lane-for-lane;
  * per-lane monotone done flags; the chunk loop runs to the last lane;
  * (x12, y12, optval) are all latched at each lane's firing iteration,
    so the reported iterate and objective are mutually consistent.  The
    vmapped loop instead reports the exit-time iterate, so already-done
    lanes can differ from it within convergence tolerance.

Scope (falls back to the vmapped XLA loop otherwise): dense A in VMEM,
per-lane g.c overrides (λ-sweeps — the dominant batch pattern), shared f,
f32/f64, no Anderson / exact-tol / verbose.
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

from pogs_tpu.types import SolverSettings, Status
from pogs_tpu.ops.fused_admm import (
    _LANE, _masked_apply, _mm, _pad_h, _pad_params, pad_to,
)
from pogs_tpu.prox.scalar import FUNC, PROX
from pogs_tpu.solver.admm import (
    K_DELTA_MIN, K_GAMMA, K_KAPPA, K_RHO_MAX, K_RHO_MAX_F32, K_RHO_MIN,
    K_RHO_MIN_F32, K_SPEC_CHANGE_MAX, K_SPEC_CHANGE_MIN, K_SPEC_FREQ,
    K_SPEC_IMB_THRESH, K_SPEC_MIN_DELTA, K_TAU,
)

# Same ×4 scoped-VMEM model as fused_admm.py, boundary-probed on v5e.
_VMEM_BUDGET = 14 * 1024 * 1024
_SUBLANE = 8  # chunk sizes pad to the f32 sublane width


def batched_chunk_for(m: int, n: int, dtype) -> int:
    """Largest per-kernel lane count that fits the VMEM budget (0 = none).

    Footprint: A + Aᵀ + Ginv + ~10 (K_c, m+n) state matrices in the carry
    + the (K_c,) per-lane scalars, times the measured ×4 Mosaic overhead."""
    mp, np_ = pad_to(m), pad_to(n)
    k = min(mp, np_)
    itemsize = jnp.dtype(dtype).itemsize
    fixed = 4 * (2 * mp * np_ + k * k + 12 * (mp + np_)) * itemsize
    per_lane = 4 * (10 * (mp + np_) + 4 * _LANE) * itemsize
    if fixed + per_lane * _SUBLANE > _VMEM_BUDGET:
        return 0
    kc = (_VMEM_BUDGET - fixed) // per_lane
    return int(min(64, (kc // _SUBLANE) * _SUBLANE))


def _nrm_l(v):
    """Per-lane 2-norm: (K, d) -> (K, 1)."""
    return jnp.sqrt(jnp.sum(v * v, axis=1, keepdims=True))


def _dot_l(u, v):
    return jnp.sum(u * v, axis=1, keepdims=True)


def _prox_l(params, types, h_arr, v, rho):
    """Per-lane prox: params/h (1, d) broadcast over v/rho (K, d)/(K, 1)."""
    a, b, c, d, e = params
    a_safe = jnp.where(a == 0, jnp.ones_like(a), a)
    vt = a_safe * (v * rho - d) / (e + rho) - b
    rt = (e + rho) / (c * a_safe * a_safe)
    out = (_masked_apply(PROX, types, h_arr, vt, rt) + b) / a_safe
    return jnp.where(a == 0, (v * rho - d) / (e + rho), out)


def _prox_lc(params, types, h_arr, c_lane, v, rho):
    """Like _prox_l but with a per-lane c (K, d) — the λ-sweep override."""
    a, b, _, d, e = params
    a_safe = jnp.where(a == 0, jnp.ones_like(a), a)
    vt = a_safe * (v * rho - d) / (e + rho) - b
    rt = (e + rho) / (c_lane * a_safe * a_safe)
    out = (_masked_apply(PROX, types, h_arr, vt, rt) + b) / a_safe
    return jnp.where(a == 0, (v * rho - d) / (e + rho), out)


def _feval_l(params, types, h_arr, x, c_lane=None):
    a, b, c, d, e = params
    if c_lane is not None:
        c = c_lane
    hval = _masked_apply(FUNC, types, h_arr, a * x - b)
    return jnp.sum(c * hval + d * x + 0.5 * e * x * x, axis=1, keepdims=True)


def _kernel_body(
    # static closure
    f_types, g_types, m: int, n: int, tall: bool,
    settings: SolverSettings, dt,
    # refs: shared matrices/params
    A_ref, At_ref, Ginv_ref,
    hf_ref, fa_ref, fb_ref, fc_ref, fd_ref, fe_ref,
    hg_ref, ga_ref, gb_ref, gd_ref, ge_ref,
    scal_ref,
    # per-chunk input: the λ-sweep override of g.c, (K_c, Np)
    gc_ref,
    # outputs (K_c, ·)
    x12_ref, y12_ref, stats_ref,
):
    A = A_ref[:]
    At = At_ref[:]
    Ginv = Ginv_ref[:]
    g_c = gc_ref[:]
    Kc = g_c.shape[0]
    Np = ga_ref.shape[1]
    Mp = fa_ref.shape[1]
    # Params and h masks arrive PRE-BROADCAST to (Kc, d) from the XLA side:
    # Mosaic cannot relayout (1, d) -> (Kc, d) sublane replication inside
    # the kernel ("Invalid relayout ... replicated in destination").
    h_f = hf_ref[:]
    h_g = hg_ref[:]
    f_params = (fa_ref[:], fb_ref[:], fc_ref[:], fd_ref[:], fe_ref[:])
    g_params = (ga_ref[:], gb_ref[:], g_c, gd_ref[:], ge_ref[:])

    rho0 = scal_ref[0, 0]
    norm_A = scal_ref[0, 1]

    one = jnp.asarray(1.0, dt)
    alpha = jnp.asarray(1.7, dt)
    abs_tol = jnp.asarray(settings.abs_tol, dt)
    rel_tol = jnp.asarray(settings.rel_tol, dt)
    sqrtn_atol = jnp.sqrt(jnp.asarray(n, dt)) * abs_tol
    sqrtm_atol = jnp.sqrt(jnp.asarray(m, dt)) * abs_tol
    sqrtmn_atol = jnp.sqrt(jnp.asarray(m + n, dt)) * abs_tol
    max_iter = settings.max_iter

    def project(x0, y0):
        if tall:
            rhs = x0 + _mm(y0, A)          # (K,Mp)@(Mp,Np) = Aᵀy0 per lane
            x = _mm(rhs, Ginv)
            y = _mm(x, At)
        else:
            rhs = _mm(x0, At) - y0
            w = _mm(rhs, Ginv)
            x = x0 - _mm(w, A)
            y = y0 + w
        return x, y

    def body(st):
        (zx, zy, ztx, zty, k, rho, delta, xi, kd, ku, prev_nrm_r,
         done, converged, nan_found, x12_o, y12_o, zpx, zpy, opt_o) = st
        zprev_x, zprev_y = zx, zy

        zin_x = zx - ztx
        zin_y = zy - zty
        x12 = _prox_lc(g_params, g_types, h_g, g_c, zin_x, rho)
        y12 = _prox_l(f_params, f_types, h_f, zin_y, rho)

        zmx = zin_x - x12
        zmy = zin_y - y12
        gap = jnp.abs(_dot_l(zmx, x12) + _dot_l(zmy, y12))
        nrm_zm = jnp.sqrt(jnp.sum(zmx * zmx, axis=1, keepdims=True)
                          + jnp.sum(zmy * zmy, axis=1, keepdims=True))
        nrm_z12 = jnp.sqrt(jnp.sum(x12 * x12, axis=1, keepdims=True)
                           + jnp.sum(y12 * y12, axis=1, keepdims=True))
        eps_gap = sqrtmn_atol + rel_tol * nrm_zm * nrm_z12
        eps_pri = sqrtm_atol + rel_tol * _nrm_l(y12)
        eps_dua = rho * (sqrtn_atol + rel_tol * _nrm_l(zmx))

        zor_x = ztx + alpha * x12 + (one - alpha) * zprev_x
        zor_y = zty + alpha * y12 + (one - alpha) * zprev_y
        zx_new, zy_new = project(zor_x, zor_y)

        nrm_s_a = rho * (norm_A * _nrm_l(zprev_y - zy_new)
                         + _nrm_l(zprev_x - zx_new))
        nrm_r_a = norm_A * _nrm_l(x12 - zx_new) + _nrm_l(y12 - zy_new)

        # Per-lane "near tolerance" decision: both branches + select —
        # exactly what vmap lowers the XLA loop's lax.cond to.
        near = (nrm_r_a < 10 * eps_pri) & (nrm_s_a < 10 * eps_dua)
        r_vec = _mm(x12, At) - y12
        s_in = y12 + zty - zprev_y
        s_vec = _mm(s_in, A) + (x12 + ztx - zprev_x)
        nrm_r = jnp.where(near, _nrm_l(r_vec), nrm_r_a)
        nrm_s = jnp.where(near, rho * _nrm_l(s_vec), nrm_s_a)

        # Per-lane flags are int32 0/1 masks: Mosaic cannot carry (K, 1)
        # i1 vectors through a while loop ("unsupported target bitwidth
        # for truncation").
        converged_b = near & (nrm_r < eps_pri) & (nrm_s < eps_dua)
        if settings.gap_stop:
            converged_b = converged_b & (gap < eps_gap)
        converged_now = converged_b.astype(jnp.int32)
        nan_now = jnp.logical_not(
            jnp.isfinite(nrm_r)
            & jnp.isfinite(jnp.sum(zx_new, axis=1, keepdims=True)
                           + jnp.sum(zy_new, axis=1, keepdims=True))
        ).astype(jnp.int32)
        done_now = done | converged_now | nan_now | (k >= max_iter - 1).astype(jnp.int32)

        ztx_new = ztx + alpha * x12 + (one - alpha) * zprev_x - zx_new
        zty_new = zty + alpha * y12 + (one - alpha) * zprev_y - zy_new

        rho_new, delta_new, xi_new, kd_new, ku_new = rho, delta, xi, kd, ku
        zt_scale = jnp.ones_like(rho)
        if settings.adaptive_rho:
            rho_min = K_RHO_MIN_F32 if dt == jnp.float32 else K_RHO_MIN
            rho_max = K_RHO_MAX_F32 if dt == jnp.float32 else K_RHO_MAX
            pri_n = nrm_r / eps_pri
            dua_n = nrm_s / eps_dua
            spec_slot = ((k > 0) & (k % K_SPEC_FREQ == 0)
                         & (eps_pri > 0) & (eps_dua > 0))
            safe_dua = jnp.where(dua_n == 0, jnp.ones_like(dua_n), dua_n)
            imb = pri_n / safe_dua
            spec_cond = ((pri_n > 0) & (dua_n > 0)
                         & ((imb > K_SPEC_IMB_THRESH)
                            | (imb < 1.0 / K_SPEC_IMB_THRESH)))
            rho_ratio = jnp.clip(jnp.sqrt(imb), K_SPEC_CHANGE_MIN,
                                 K_SPEC_CHANGE_MAX)
            rho_spec = jnp.clip(rho * rho_ratio, rho_min, rho_max)
            spec_apply = (
                spec_slot & spec_cond
                & (jnp.abs(rho_spec - rho) / rho > K_SPEC_MIN_DELTA)
            )

            kf = k.astype(dt)
            bal_slot = jnp.logical_not(spec_slot)
            s_small = nrm_s < xi * eps_dua
            r_small = nrm_r < xi * eps_pri
            bal_up = bal_slot & s_small & ~r_small & (K_TAU * kf > kd)
            bal_dn = bal_slot & ~s_small & r_small & (K_TAU * kf > ku) & ~bal_up
            bal_both = bal_slot & s_small & r_small & ~bal_up & ~bal_dn
            bal_else = bal_slot & ~bal_up & ~bal_dn & ~bal_both
            up_apply = bal_up & (rho < rho_max)
            dn_apply = bal_dn & (rho > rho_min)

            rho_new = jnp.where(
                spec_apply, rho_spec,
                jnp.where(up_apply, rho * delta,
                          jnp.where(dn_apply, rho / delta, rho)),
            )
            zt_scale = jnp.where(
                spec_apply, rho / rho_spec,
                jnp.where(up_apply, one / delta,
                          jnp.where(dn_apply, delta, jnp.ones_like(rho))),
            )
            delta_new = jnp.where(
                up_apply | dn_apply, K_GAMMA * delta,
                jnp.where(bal_else, jnp.asarray(K_DELTA_MIN, dt), delta),
            )
            xi_new = jnp.where(bal_both, xi * K_KAPPA, xi)
            ku_new = jnp.where(up_apply, kf, ku)
            kd_new = jnp.where(dn_apply, kf, kd)
        ztx_new = ztx_new * zt_scale
        zty_new = zty_new * zt_scale

        keep = done_now > 0

        def sel(new, old):
            return jnp.where(keep, old, new)

        optval = (_feval_l(f_params, f_types, h_f, y12)
                  + _feval_l(g_params, g_types, h_g, x12, c_lane=g_c))

        was_done = done > 0
        return (
            zx_new, zy_new, sel(ztx_new, ztx), sel(zty_new, zty),
            jnp.where(keep, k, k + 1),
            sel(rho_new, rho), sel(delta_new, delta), sel(xi_new, xi),
            sel(kd_new, kd), sel(ku_new, ku), sel(nrm_r, prev_nrm_r),
            done_now,
            jnp.where(was_done, converged, converged_now),
            jnp.where(was_done, nan_found, nan_now),
            # Latch the iterate AND the objective at the FIRING iteration
            # like converged/nan, so the reported (x12, y12, optval) come
            # from the same iteration for every lane (keep would report
            # the pre-stopping iterate's objective, and 0.0 for a lane
            # converging at k = 0).
            jnp.where(was_done, x12_o, x12), jnp.where(was_done, y12_o, y12),
            zprev_x, zprev_y,
            jnp.where(was_done, opt_o, optval),
        )

    zKx = jnp.zeros((Kc, Np), dt)
    zKy = jnp.zeros((Kc, Mp), dt)
    sc0 = jnp.zeros((Kc, 1), dt)
    init = (
        zKx, zKy, zKx, zKy,
        jnp.zeros((Kc, 1), jnp.int32), jnp.full((Kc, 1), rho0, dt),
        jnp.full((Kc, 1), K_DELTA_MIN, dt), jnp.full((Kc, 1), 1.0, dt),
        sc0, sc0, jnp.full((Kc, 1), jnp.finfo(dt).max, dt),
        jnp.zeros((Kc, 1), jnp.int32), jnp.zeros((Kc, 1), jnp.int32),
        jnp.zeros((Kc, 1), jnp.int32),
        zKx, zKy, zKx, zKy, sc0,
    )

    st = lax.while_loop(lambda s: jnp.min(s[11]) < 1, body, init)
    (zx, zy, ztx, zty, k, rho, _d, _xi, _kd, _ku, _p,
     _done, converged, nan_found, x12, y12, zpx, zpy, optval) = st

    x12_ref[:] = x12
    y12_ref[:] = y12
    status = jnp.where(
        converged > 0, float(Status.SUCCESS.value),
        jnp.where(nan_found > 0, float(Status.NAN_FOUND.value),
                  float(Status.MAX_ITER.value)),
    ).astype(dt)
    lane = lax.broadcasted_iota(jnp.int32, (Kc, _LANE), 1)
    stats = jnp.zeros((Kc, _LANE), dt)
    for slot, val in enumerate((optval, k.astype(dt), status, rho)):
        stats = jnp.where(lane == slot, val, stats)
    stats_ref[:] = stats


def fused_batched_lasso_sweep(
    A,
    Ginv,
    norm_A,
    h_f: np.ndarray,
    f_params,
    h_g: np.ndarray,
    g_params,
    c_batch,
    settings: SolverSettings,
    rho0,
    interpret: Optional[bool] = None,
    fb_batch=None,
):
    """Run a per-lane sweep through the chunked fused kernel: g.c varies
    per lane (λ-sweeps), and optionally f.b too (``fb_batch`` (K, m) —
    multi-right-hand-side regression; the kernel body is identical, the
    b parameter block just arrives chunked instead of shared).

    Inputs are the SCALED pieces from the solver init (same contract as
    fused_admm_loop).  Returns dict with x (K, n) [scaled x12], optval,
    iterations, status — the subset the batched front end consumes."""
    m, n = A.shape
    dt = A.dtype
    mp, np_ = pad_to(m), pad_to(n)
    tall = m >= n
    kp = np_ if tall else mp
    K = c_batch.shape[0]
    kc = batched_chunk_for(m, n, dt)
    if kc == 0:
        raise ValueError("problem too large for the fused batched kernel")
    Kp = ((K + kc - 1) // kc) * kc
    grid = Kp // kc

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    A_pad = jnp.zeros((mp, np_), dt).at[:m, :n].set(A)
    At_pad = A_pad.T
    k_real = Ginv.shape[0]
    Ginv_pad = jnp.eye(kp, dtype=dt).at[:k_real, :k_real].set(Ginv)

    hf_pad = _pad_h(np.asarray(h_f), mp)
    hg_pad = _pad_h(np.asarray(h_g), np_)
    f_types = tuple(int(t) for t in np.unique(hf_pad))
    g_types = tuple(int(t) for t in np.unique(hg_pad))
    # Pre-broadcast to the chunk height (see kernel comment).
    hf_in = jnp.broadcast_to(jnp.asarray(hf_pad)[None, :], (kc, mp))
    hg_in = jnp.broadcast_to(jnp.asarray(hg_pad)[None, :], (kc, np_))
    fa, fb, fc, fd, fe = (jnp.broadcast_to(p, (kc, mp))
                          for p in _pad_params(f_params, mp))
    ga, gb, _, gd, ge = (jnp.broadcast_to(p, (kc, np_))
                         for p in _pad_params(g_params, np_))

    c_batch = jnp.asarray(c_batch, dt)
    # Pad lanes by repeating the last row (inert extra work, outputs dropped)
    # and pad columns like the params (c = 1 on padded coords).
    cb = jnp.concatenate(
        [c_batch, jnp.broadcast_to(c_batch[-1:], (Kp - K, n))], axis=0
    )
    cb = jnp.concatenate([cb, jnp.ones((Kp, np_ - n), dt)], axis=1)
    fb_spec_chunked = fb_batch is not None
    if fb_spec_chunked:
        fbb = jnp.asarray(fb_batch, dt)
        fbb = jnp.concatenate(
            [fbb, jnp.broadcast_to(fbb[-1:], (Kp - K, m))], axis=0
        )
        fb = jnp.concatenate([fbb, jnp.zeros((Kp, mp - m), dt)], axis=1)

    scal = jnp.zeros((1, _LANE), dt)
    scal = scal.at[0, 0].set(jnp.asarray(rho0, dt))
    scal = scal.at[0, 1].set(jnp.asarray(norm_A, dt))

    kern = functools.partial(
        _kernel_body, f_types, g_types, m, n, tall, settings, dt
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    def shared(shape):
        # Same block for every grid step (index_map pins block 0).
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    chunk = lambda d: pl.BlockSpec((kc, d), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)

    fb_spec = chunk(mp) if fb_spec_chunked else shared((kc, mp))
    outs = pl.pallas_call(
        kern,
        grid=(grid,),
        out_shape=[
            jax.ShapeDtypeStruct((Kp, np_), dt),   # x12
            jax.ShapeDtypeStruct((Kp, mp), dt),    # y12
            jax.ShapeDtypeStruct((Kp, _LANE), dt),  # stats
        ],
        in_specs=(
            [shared((mp, np_)), shared((np_, mp)), shared((kp, kp))]
            + [shared((kc, mp)), shared((kc, mp)), fb_spec]
            + [shared((kc, mp))] * 3
            + [shared((kc, np_))] * 5
            + [shared((1, _LANE))]
            + [chunk(np_)]
        ),
        out_specs=[chunk(np_), chunk(mp), chunk(_LANE)],
        interpret=interpret,
    )(
        A_pad, At_pad, Ginv_pad,
        hf_in, fa, fb, fc, fd, fe, hg_in, ga, gb, gd, ge,
        scal, cb,
    )
    x12, y12, stats = outs
    return {
        "x12": x12[:K, :n],
        "y12": y12[:K, :m],
        "optval": stats[:K, 0],
        "final_iter": stats[:K, 1].astype(jnp.int32),
        "status": stats[:K, 2].astype(jnp.int32),
        "rho": stats[:K, 3],
    }
