"""HBM-roofline benchmark for the per-iteration hot path.

BASELINE target: per-iteration matvec+prox cost >= 80% of the HBM roofline
on one chip.  Protocol: a large dense lasso (HBM-resident, fused path
ineligible) run for a FIXED iteration count at three multiples (K, 2K,
4K) so the per-iteration time is a least-squares slope — per-launch,
transfer, and init costs cancel, and the fit residual exposes a
non-linear (i.e. broken) measurement instead of silently publishing it.

Round-3 published 839 GB/s achieved on an 819 GB/s part — physically
impossible.  Post-mortem: the bytes model (2mn + n^2 + 14(m+n) per
iteration, re-derived below and still used) matches the compiled loop
body's streams; the inflation came from the MEASUREMENT — the tunneled
axon backend under-blocks ``block_until_ready``, so the 2-point slope
was computed on partially-dispatched timings.  Fixes here: (a) every
timed region ends with a full ``np.asarray`` fetch (hard sync; its
constant cost cancels in the slope), (b) a 3-point least-squares slope
with the fit R^2 published, (c) a hard refusal marker whenever
achieved > peak, and (d) ``--trace-dir`` captures a jax.profiler device
trace so the figure can be cross-checked against hardware counters.
XLA's ``cost_analysis()['bytes accessed']`` is also printed as a
diagnostic, but it counts a while_loop body ONCE regardless of trip
count (verified), so it cannot serve as the per-iteration model.

Sync discipline (tunneled axon): ``block_until_ready`` under-blocks —
every timed region ends with a full ``np.asarray`` fetch of the iterate,
whose cost is constant across K and therefore cancels in the slope.

Prints one JSON line.  Peak bandwidth per chip:
  TPU v5 lite (v5e): 819 GB/s;  v4: 1228 GB/s;  v5p: 2765 GB/s;
  v6e: 1640 GB/s (public figures).
"""

import argparse
import json
import time

import numpy as np

M, N = 10000, 5000
# --xl: the round-2 HBM-wall size.  40000x10000 f32 OOMed before the
# projector's row-blocked Gram (projector/direct.py:_gram) capped the
# HIGHEST-precision operand-splitting transient.
XL_M, XL_N = 40000, 10000
K_ITERS = 120
REPS = 5

PEAK_GBPS = {
    "TPU v5 lite": 819.0,
    "TPU v4": 1228.0,
    "TPU v5p": 2765.0,
    "TPU v6 lite": 1640.0,
    "TPU v6e": 1640.0,
}


def _settings(iters):
    from pogs_tpu.types import SolverSettings

    # Zero tolerances: the loop runs exactly ``iters`` iterations (the
    # exact-residual branch never fires), matching the bytes model.
    return SolverSettings(abs_tol=1e-30, rel_tol=1e-30, max_iter=iters,
                          use_fused=False)


def measure(solver, f, g, iters):
    st = _settings(iters)
    np.asarray(solver.solve(f, g, settings=st, _no_sync=True)["z"])  # compile+warm
    ts = []
    for rep in range(REPS):
        solver.reset_warm_start()
        t0 = time.perf_counter()
        out = solver.solve(f, g, settings=st, rho=1.0 + 1e-4 * (rep + 1),
                           _no_sync=True)
        np.asarray(out["z"])  # hard sync: block_until_ready under-blocks
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts[1:]))


def xla_bytes_accessed(solver, f, g, iters):
    """XLA cost-model bytes for the whole compiled solve (diagnostic
    only: XLA counts the while_loop body once regardless of trip count).
    None when the backend does not expose cost analysis."""
    from pogs_tpu.solver import graph as graph_mod

    st = _settings(iters)
    fn = graph_mod._get_solve_fn(
        (solver.m, solver.n), solver.dtype, f.h, g.h, st,
        solver.projector, solver.direct_method,
        has_warm=False, has_x0=False, has_nu0=False, fused=False,
    )
    try:
        lowered = fn.lower(solver._init_state, tuple(f.params),
                           tuple(g.params), 1.0, {})
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost["bytes accessed"])
    except Exception:
        return None


def main():
    import jax
    import jax.numpy as jnp

    from pogs_tpu import Function, FunctionVector, GraphFormSolver

    ap = argparse.ArgumentParser()
    ap.add_argument("--xl", action="store_true",
                    help=f"run the {XL_M}x{XL_N} HBM-wall configuration")
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--trace-dir", default=None,
                    help="capture a jax.profiler device trace of one timed "
                         "solve into this directory")
    args = ap.parse_args()
    m, n = (XL_M, XL_N) if args.xl else (M, N)
    k_iters = args.iters or (K_ITERS // 2 if args.xl else K_ITERS)

    rng = np.random.default_rng(11)
    A = rng.standard_normal((m, n)).astype(np.float32)
    b = rng.standard_normal(m).astype(np.float32)
    lam = 0.1 * float(np.max(np.abs(A.T @ b)))
    f = FunctionVector(Function.SQUARE, m, b=b, dtype=jnp.float32)
    g = FunctionVector(Function.ABS, n, c=lam, dtype=jnp.float32)

    solver = GraphFormSolver(A, dtype=jnp.float32)
    solver.init()

    # Three-point least-squares slope: t(K) for K in {k, 2k, 4k}.
    ks = np.array([k_iters, 2 * k_iters, 4 * k_iters])
    ts = np.array([measure(solver, f, g, int(k)) for k in ks])
    slope, intercept = np.polyfit(ks, ts, 1)
    per_iter_s = max(float(slope), 1e-9)
    fit = np.polyval([slope, intercept], ks)
    r2 = 1.0 - float(((ts - fit) ** 2).sum() / max(((ts - ts.mean()) ** 2).sum(), 1e-30))

    if args.trace_dir:
        import jax.profiler as profiler

        with profiler.trace(args.trace_dir):
            st = _settings(int(ks[0]))
            solver.reset_warm_start()
            np.asarray(solver.solve(f, g, settings=st, _no_sync=True)["z"])

    # Bytes/iteration: the direct-inverse tall path streams A twice
    # (A'y0 for the projection rhs, A x for y), the n x n Gram inverse
    # once, and ~14 vector-length passes (prox, over-relax, dual update,
    # residual norms).  Exact-residual iterations would add 2 more m*n
    # streams but never fire at zero tolerance.
    itemsize = 4
    bytes_per_iter = (2 * m * n + n * n + 14 * (m + n)) * itemsize
    xla_total = xla_bytes_accessed(solver, f, g, int(ks[0]))
    achieved_gbps = bytes_per_iter / per_iter_s / 1e9

    kind = jax.devices()[0].device_kind
    peak = PEAK_GBPS.get(kind)
    out = {
        "metric": f"roofline_lasso_{m}x{n}",
        "us_per_iter": round(per_iter_s * 1e6, 1),
        "bytes_per_iter_mb": round(bytes_per_iter / 1e6, 1),
        "bytes_source": "analytic_model",
        "xla_whole_solve_mb": (round(xla_total / 1e6, 1)
                               if xla_total is not None else None),
        "slope_fit_r2": round(r2, 5),
        "achieved_gbps": round(achieved_gbps, 1),
        "device_kind": kind,
        "backend": jax.devices()[0].platform,
    }
    if peak:
        out["peak_gbps"] = peak
        out["fraction_of_roofline"] = round(achieved_gbps / peak, 3)
        out["target"] = 0.8
        if achieved_gbps > peak:
            out["warning"] = ("achieved > peak: measurement or cost model "
                              "invalid; do not publish this row")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
