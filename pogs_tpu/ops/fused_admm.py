"""The whole graph-form ADMM solve as ONE VMEM-resident Pallas kernel.

Motivation (TPU-first, not in the reference): for the dense problem sizes
POGS targets (its README benchmarks are 500x300, reference README.md:26-34),
the equilibrated matrix, its Gram inverse, and all solver state fit
comfortably in VMEM (~16 MB/core).  The XLA ``lax.while_loop`` path
(pogs_tpu/solver/admm.py) is already a single device program, but each of
the ~25 fused ops in its body carries scheduling overhead that dominates
at these sizes (~50 us/iteration for matvecs that cost ~2 us of HBM
traffic).  This kernel keeps EVERYTHING — A, A^T, the factor, the iterate,
the prox parameters — pinned in VMEM and runs the complete while-loop in
one ``pl.pallas_call``, so an 80-iteration solve is one kernel launch.

Algorithmic semantics match pogs_tpu/solver/admm.py exactly (same constants
from the reference, src/cpu/pogs.cpp:94-110), with two deviations that do
not change results:

  * exact residuals run behind an in-kernel ``lax.cond`` gated by the
    same "near tolerance" predicate as the XLA loop (identical decisions);
  * verbose tracing, Anderson acceleration, and exact-tol (cone) mode are
    not supported — the solver front end falls back to the XLA loop.

Padding: m and n are padded to multiples of 128 (lane width).  Padded
coordinates carry h = INDEQ0 objectives (prox pins them to 0) and zero
matrix rows/columns, which makes them exactly inert: they contribute 0 to
every matvec, norm, and objective value (see tests/test_fused.py).
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

from pogs_tpu.types import Function, SolverSettings, Status
from pogs_tpu.prox.scalar import PROX, FUNC
from pogs_tpu.solver.admm import (
    K_DELTA_MIN, K_GAMMA, K_TAU, K_KAPPA,
    K_RHO_MIN, K_RHO_MAX, K_RHO_MIN_F32, K_RHO_MAX_F32,
    K_SPEC_CHANGE_MAX, K_SPEC_CHANGE_MIN, K_SPEC_FREQ, K_SPEC_IMB_THRESH,
    K_SPEC_MIN_DELTA,
)

_LANE = 128
# VMEM budget for the fused path (bytes).  Calibrated against measured
# Mosaic scoped-VMEM compiles on v5e (16 MB/core): a raw-footprint model of
# 3.8 MB compiles, 4.3 MB OOMs, i.e. ~4.2x overhead (double buffering +
# while-carry copies) — need = 4*raw with a 15 MB budget tracks the real
# boundary with margin.
_VMEM_BUDGET = 15 * 1024 * 1024


def pad_to(k: int, mult: int = _LANE) -> int:
    return ((k + mult - 1) // mult) * mult


def fused_admm_eligible(m: int, n: int, dtype, settings: SolverSettings) -> bool:
    """True if the whole solve fits the single-kernel VMEM-resident path."""
    if settings.use_anderson or settings.use_exact_tol or settings.verbose > 1:
        return False
    mp, np_ = pad_to(m), pad_to(n)
    k = min(mp, np_)
    itemsize = jnp.dtype(dtype).itemsize
    # A + A^T + Ginv + ~24 state/param vectors; the x4 is the measured
    # Mosaic scoped-VMEM overhead (double buffering + while-carry copies),
    # boundary-probed on v5e: raw 3.8 MB compiles, 4.3 MB OOMs.
    need = 4 * (2 * mp * np_ + k * k + 24 * (mp + np_)) * itemsize
    return need <= _VMEM_BUDGET


def _masked_apply(table, types, h_arr, v, rho=None):
    """Dispatch specialized to the static *set* of present types; the mask
    itself comes from the h codes loaded as a kernel input (Pallas forbids
    captured array constants)."""
    out = None
    for t in types:
        fn = table[Function(int(t))]
        branch = fn(v, rho) if rho is not None else fn(v)
        if out is None and len(types) == 1:
            out = branch
            break
        mask = h_arr == jnp.asarray(int(t), h_arr.dtype)
        if out is None:
            out = jnp.where(mask, branch, jnp.zeros_like(branch))
        else:
            out = jnp.where(mask, branch, out)
    return out


def _prox(params, types, h_arr, v, rho):
    """prox with the generic (a,b,c,d,e) transform (prox_lib.h:206-230);
    a = 0 degrades to the pure quadratic/linear minimizer."""
    a, b, c, d, e = params
    a_safe = jnp.where(a == 0, jnp.ones_like(a), a)
    vt = a_safe * (v * rho - d) / (e + rho) - b
    rt = (e + rho) / (c * a_safe * a_safe)
    out = (_masked_apply(PROX, types, h_arr, vt, rt) + b) / a_safe
    return jnp.where(a == 0, (v * rho - d) / (e + rho), out)


def _feval(params, types, h_arr, x):
    a, b, c, d, e = params
    hval = _masked_apply(FUNC, types, h_arr, a * x - b)
    return jnp.sum(c * hval + d * x + 0.5 * e * x * x)


def _dotp(u, v):
    return jnp.sum(u * v)


def _nrm(v):
    return jnp.sqrt(jnp.sum(v * v))


def _mm(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=a.dtype,
    )


def _kernel_body(
    # static closure
    f_types, g_types, m: int, n: int, tall: bool,
    settings: SolverSettings, dt,
    # refs
    A_ref, At_ref, Ginv_ref,
    hf_ref, fa_ref, fb_ref, fc_ref, fd_ref, fe_ref,
    hg_ref, ga_ref, gb_ref, gc_ref, gd_ref, ge_ref,
    zx0_ref, zy0_ref, ztx0_ref, zty0_ref, scal_in_ref,
    x12_ref, y12_ref, mux_ref, nuy_ref, zx_ref, zy_ref, ztx_ref, zty_ref,
    stats_ref,
):
    A = A_ref[:]
    At = At_ref[:]
    Ginv = Ginv_ref[:]
    h_f = hf_ref[:]
    h_g = hg_ref[:]
    f_params = (fa_ref[:], fb_ref[:], fc_ref[:], fd_ref[:], fe_ref[:])
    g_params = (ga_ref[:], gb_ref[:], gc_ref[:], gd_ref[:], ge_ref[:])

    rho0 = scal_in_ref[0, 0]
    norm_A = scal_in_ref[0, 1]

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
            rhs = x0 + _mm(y0, A)          # (1,Mp)@(Mp,Np) = A^T y0
            x = _mm(rhs, Ginv)             # symmetric Ginv
            y = _mm(x, At)                 # (1,Np)@(Np,Mp) = A x
        else:
            rhs = _mm(x0, At) - y0         # A x0 - y0
            w = _mm(rhs, Ginv)
            x = x0 - _mm(w, A)             # x0 - A^T w
            y = y0 + w
        return x, y

    def body(st):
        (zx, zy, ztx, zty, k, rho, delta, xi, kd, ku, prev_nrm_r,
         done, converged, nan_found, x12, y12, zpx, zpy,
         nrm_r_o, nrm_s_o, gap_o, eps_pri_o, eps_dua_o) = st
        zprev_x, zprev_y = zx, zy

        zin_x = zx - ztx
        zin_y = zy - zty
        x12 = _prox(g_params, g_types, h_g, zin_x, rho)
        y12 = _prox(f_params, f_types, h_f, zin_y, rho)

        zmx = zin_x - x12
        zmy = zin_y - y12
        gap = jnp.abs(_dotp(zmx, x12) + _dotp(zmy, y12))
        nrm_zm = jnp.sqrt(jnp.sum(zmx * zmx) + jnp.sum(zmy * zmy))
        nrm_z12 = jnp.sqrt(jnp.sum(x12 * x12) + jnp.sum(y12 * y12))
        eps_gap = sqrtmn_atol + rel_tol * nrm_zm * nrm_z12
        eps_pri = sqrtm_atol + rel_tol * _nrm(y12)
        eps_dua = rho * (sqrtn_atol + rel_tol * _nrm(zmx))

        zor_x = ztx + alpha * x12 + (one - alpha) * zprev_x
        zor_y = zty + alpha * y12 + (one - alpha) * zprev_y
        zx_new, zy_new = project(zor_x, zor_y)

        # Approximate residuals (pogs.cpp:299-308).
        dzp_x = zprev_x - zx_new
        dzp_y = zprev_y - zy_new
        nrm_s_a = rho * (norm_A * _nrm(dzp_y) + _nrm(dzp_x))
        dz_x = x12 - zx_new
        dz_y = y12 - zy_new
        nrm_r_a = norm_A * _nrm(dz_x) + _nrm(dz_y)

        # Exact residuals only near tolerance (pogs.cpp:310-336) — behind
        # an in-kernel lax.cond so the 2 extra matvecs are skipped on the
        # (majority of) far-from-converged iterations.
        near = jnp.logical_and(nrm_r_a < 10 * eps_pri, nrm_s_a < 10 * eps_dua)

        def exact_branch(_):
            r_vec = _mm(x12, At) - y12
            s_in = y12 + zty - zprev_y
            s_vec = _mm(s_in, A) + (x12 + ztx - zprev_x)
            return _nrm(r_vec), rho * _nrm(s_vec)

        def approx_branch(_):
            return nrm_r_a, nrm_s_a

        nrm_r, nrm_s = lax.cond(near, exact_branch, approx_branch, None)

        converged_now = near & (nrm_r < eps_pri) & (nrm_s < eps_dua)
        if settings.gap_stop:
            converged_now = converged_now & (gap < eps_gap)
        nan_now = jnp.logical_not(
            jnp.isfinite(nrm_r)
            & jnp.isfinite(jnp.sum(zx_new) + jnp.sum(zy_new))
        )
        # Monotone (see solver/admm.py — matters under vmap/batching).
        done_now = done | converged_now | nan_now | (k >= max_iter - 1)

        ztx_new = ztx + alpha * x12 + (one - alpha) * zprev_x - zx_new
        zty_new = zty + alpha * y12 + (one - alpha) * zprev_y - zy_new

        rho_new, delta_new, xi_new, kd_new, ku_new = rho, delta, xi, kd, ku
        zt_scale = one
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
                          jnp.where(dn_apply, delta, one)),
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

        keep = done_now

        def sel(new, old):
            return jnp.where(keep, old, new)

        return (
            zx_new, zy_new, sel(ztx_new, ztx), sel(zty_new, zty),
            jnp.where(done_now, k, k + 1),
            sel(rho_new, rho), sel(delta_new, delta), sel(xi_new, xi),
            sel(kd_new, kd), sel(ku_new, ku), sel(nrm_r, prev_nrm_r),
            done_now,
            jnp.where(done, converged, converged_now),
            jnp.where(done, nan_found, nan_now),
            x12, y12, zprev_x, zprev_y,
            nrm_r, nrm_s, gap, eps_pri, eps_dua,
        )

    Np = zx0_ref.shape[1]
    Mp = zy0_ref.shape[1]
    zeros_x = jnp.zeros((1, Np), dt)
    zeros_y = jnp.zeros((1, Mp), dt)
    init = (
        zx0_ref[:], zy0_ref[:], ztx0_ref[:], zty0_ref[:],
        jnp.asarray(0, jnp.int32), rho0,
        jnp.asarray(K_DELTA_MIN, dt), jnp.asarray(1.0, dt),
        jnp.asarray(0.0, dt), jnp.asarray(0.0, dt),
        jnp.asarray(jnp.finfo(dt).max, dt),
        jnp.asarray(False), jnp.asarray(False), jnp.asarray(False),
        zeros_x, zeros_y, zeros_x, zeros_y,
        jnp.asarray(0.0, dt), jnp.asarray(0.0, dt), jnp.asarray(0.0, dt),
        jnp.asarray(0.0, dt), jnp.asarray(0.0, dt),
    )

    st = lax.while_loop(lambda s: jnp.logical_not(s[11]), body, init)
    (zx, zy, ztx, zty, k, rho, _delta, _xi, _kd, _ku, _prev,
     _done, converged, nan_found, x12, y12, zpx, zpy,
     nrm_r, nrm_s, gap, eps_pri, eps_dua) = st

    optval = (_feval(f_params, f_types, h_f, y12)
              + _feval(g_params, g_types, h_g, x12))

    x12_ref[:] = x12
    y12_ref[:] = y12
    mux_ref[:] = -rho * (ztx - zpx + x12)
    nuy_ref[:] = -rho * (zty - zpy + y12)
    # Warm-start state: the last *complete* iterate (pogs.cpp:573).
    zx_ref[:] = zpx
    zy_ref[:] = zpy
    ztx_ref[:] = ztx
    zty_ref[:] = zty

    status = jnp.where(
        converged, Status.SUCCESS.value,
        jnp.where(nan_found, Status.NAN_FOUND.value, Status.MAX_ITER.value),
    ).astype(dt)
    # Pack scalars into one lane-width row via select (no scatter in Mosaic).
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)
    stats = jnp.zeros((1, _LANE), dt)
    for slot, val in enumerate(
        (optval, k.astype(dt), status, rho, nrm_r, nrm_s, gap,
         eps_pri, eps_dua)
    ):
        stats = jnp.where(lane == slot, val, stats)
    stats_ref[:] = stats


def _pad_vec(v, kp, fill=0.0):
    v = jnp.asarray(v)
    return jnp.pad(v, (0, kp - v.shape[0]), constant_values=fill)[None, :]


def _pad_params(params, kp):
    a, b, c, d, e = params
    return (
        _pad_vec(a, kp, 1.0), _pad_vec(b, kp, 0.0), _pad_vec(c, kp, 1.0),
        _pad_vec(d, kp, 0.0), _pad_vec(e, kp, 0.0),
    )


def _pad_h(h: np.ndarray, kp: int) -> np.ndarray:
    return np.pad(h, (0, kp - h.shape[0]),
                  constant_values=int(Function.INDEQ0)).astype(np.int32)


def fused_admm_loop(
    A,
    Ginv,
    norm_A,
    h_f: np.ndarray,
    f_params,
    h_g: np.ndarray,
    g_params,
    settings: SolverSettings,
    z0,
    zt0,
    rho0,
    interpret: Optional[bool] = None,
):
    """Drop-in fused counterpart of :func:`pogs_tpu.solver.admm.admm_loop`.

    ``A`` is the equilibrated dense matrix; ``Ginv`` the SPD inverse of
    (Gram + I) from DirectProjector(method='inverse'); ``f_params`` /
    ``g_params`` the *scaled* objective parameter tuples.  Returns the same
    result dict as ``admm_loop`` (unpadded)."""
    m, n = A.shape
    dt = A.dtype
    mp, np_ = pad_to(m), pad_to(n)
    tall = m >= n
    kp = np_ if tall else mp

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    A_pad = jnp.zeros((mp, np_), dt).at[:m, :n].set(A)
    At_pad = A_pad.T
    k_real = Ginv.shape[0]
    # Pad the factor with the identity: the padded Gram block is 0, so
    # (Gram_pad + I)^{-1} is exactly I there — padded coords stay inert.
    Ginv_pad = jnp.eye(kp, dtype=dt).at[:k_real, :k_real].set(Ginv)

    hf_pad = _pad_h(np.asarray(h_f), mp)
    hg_pad = _pad_h(np.asarray(h_g), np_)
    f_types = tuple(int(t) for t in np.unique(hf_pad))
    g_types = tuple(int(t) for t in np.unique(hg_pad))
    hf_in = jnp.asarray(hf_pad)[None, :]
    hg_in = jnp.asarray(hg_pad)[None, :]
    f_pad = _pad_params(f_params, mp)
    g_pad = _pad_params(g_params, np_)

    z0 = jnp.asarray(z0, dt)
    zt0 = jnp.asarray(zt0, dt)
    zx0 = _pad_vec(z0[:n], np_)
    zy0 = _pad_vec(z0[n:], mp)
    ztx0 = _pad_vec(zt0[:n], np_)
    zty0 = _pad_vec(zt0[n:], mp)
    scal_in = jnp.zeros((1, _LANE), dt).at[0, 0].set(
        jnp.asarray(rho0, dt)).at[0, 1].set(jnp.asarray(norm_A, dt))

    kern = functools.partial(
        _kernel_body, f_types, g_types, m, n, tall, settings, dt
    )
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shapes = [
        jax.ShapeDtypeStruct((1, np_), dt),   # x12
        jax.ShapeDtypeStruct((1, mp), dt),    # y12
        jax.ShapeDtypeStruct((1, np_), dt),   # mu (scaled)
        jax.ShapeDtypeStruct((1, mp), dt),    # nu (scaled)
        jax.ShapeDtypeStruct((1, np_), dt),   # z_x
        jax.ShapeDtypeStruct((1, mp), dt),    # z_y
        jax.ShapeDtypeStruct((1, np_), dt),   # zt_x
        jax.ShapeDtypeStruct((1, mp), dt),    # zt_y
        jax.ShapeDtypeStruct((1, _LANE), dt),  # stats
    ]
    outs = pl.pallas_call(
        kern,
        out_shape=out_shapes,
        in_specs=[vm] * 20,
        out_specs=[vm] * len(out_shapes),
        interpret=interpret,
    )(
        A_pad, At_pad, Ginv_pad,
        hf_in, *f_pad, hg_in, *g_pad,
        zx0, zy0, ztx0, zty0, scal_in,
    )
    (x12, y12, mu_s, nu_s, zx, zy, ztx, zty, stats) = outs

    z = jnp.concatenate([zx[0, :n], zy[0, :m]])
    zt = jnp.concatenate([ztx[0, :n], zty[0, :m]])
    return {
        "x12": x12[0, :n],
        "y12": y12[0, :m],
        "mu_scaled": mu_s[0, :n],
        "nu_scaled": nu_s[0, :m],
        "optval": stats[0, 0],
        "final_iter": stats[0, 1].astype(jnp.int32),
        "status": stats[0, 2].astype(jnp.int32),
        "rho": stats[0, 3],
        "nrm_r": stats[0, 4],
        "nrm_s": stats[0, 5],
        "gap": stats[0, 6],
        "eps_pri": stats[0, 7],
        "eps_dua": stats[0, 8],
        "z": z,
        "zt": zt,
    }
