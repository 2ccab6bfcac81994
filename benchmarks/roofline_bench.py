"""HBM-roofline benchmark for the per-iteration hot path.

BASELINE target: per-iteration matvec+prox cost >= 80% of the HBM roofline
on one chip.  Protocol: a large dense lasso (HBM-resident, fused path
ineligible) run for a FIXED iteration count at three multiples (K, 2K,
4K) so the per-iteration time is a least-squares slope — per-launch,
transfer, and init costs cancel, and the fit residual exposes a
non-linear (i.e. broken) measurement instead of silently publishing it.

Round-3 published 839 GB/s achieved on an 819 GB/s part — physically
impossible.  Round-4 post-mortem, two compounding defects: (1) the
MEASUREMENT — the tunneled axon backend under-blocks
``block_until_ready``, so the 2-point slope timed partially-dispatched
work; (2) the BYTES MODEL — 2mn + n^2 + 14(m+n) charges the Gram
inverse to HBM every iteration, but at n=5000 the 95 MiB inverse is
VMEM-resident (evidence chain in the comment at the model below).
Fixes here: (a) every timed region ends with a full ``np.asarray``
fetch (hard sync; its constant cost cancels in the slope), (b) a
3-point least-squares slope with the fit R^2 published, (c) the model
charges min(m,n)^2 only when it cannot fit in the 128 MiB VMEM,
(d) a calibrated gemv streaming ceiling measured on the same device and
published next to the paper peak, (e) a hard refusal marker whenever
achieved exceeds either bound, and (f) ``--trace-dir`` captures a
jax.profiler device trace for counter-level cross-checks.
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
import os
import sys
import time

import numpy as np

# `python benchmarks/roofline_bench.py` puts benchmarks/ (not the repo
# root) on sys.path; make pogs_tpu importable either way.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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

# Per-core VMEM (bytes) for the Gram-inverse residency decision.  v2/v3
# carry 16 MiB; v4 onward 128 MiB.  Unknown kinds (cpu/gpu backends) get
# None → conservative op_resident=False (charge the inverse to HBM).
VMEM_BYTES = {
    "TPU v2": 16 * 2**20,
    "TPU v3": 16 * 2**20,
    "TPU v4": 128 * 2**20,
    "TPU v5 lite": 128 * 2**20,
    "TPU v5p": 128 * 2**20,
    "TPU v6 lite": 128 * 2**20,
    "TPU v6e": 128 * 2**20,
}


def _settings(iters):
    from pogs_tpu.types import SolverSettings

    # Zero tolerances: the loop runs exactly ``iters`` iterations (the
    # exact-residual branch never fires), matching the bytes model.
    return SolverSettings(abs_tol=1e-30, rel_tol=1e-30, max_iter=iters,
                          use_fused=False)


def measure_gemv_ceiling(A_np, m, n, reps=4):
    """Measured streaming ceiling: least-squares slope of K isolated
    y = A @ x gemvs (fori_loop, HIGHEST precision), streaming A (m*n*4
    bytes) once per iteration.  Constant dispatch/transfer cost cancels
    in the slope."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    A = jnp.asarray(A_np)
    x = jnp.ones((n,), A.dtype)

    def loop(K):
        @jax.jit
        def fn(A, x):
            def body(i, xv):
                y = jnp.matmul(A, xv, precision=lax.Precision.HIGHEST)
                return xv * (1.0 + 1e-9 * y[0])
            return lax.fori_loop(0, K, body, x)
        return fn

    ks = np.array([25, 50, 100])
    ts = []
    for K in ks:
        fn = loop(int(K))
        np.asarray(fn(A, x))  # compile+warm
        best = min(_timed(lambda: np.asarray(fn(A, x))) for _ in range(reps))
        ts.append(best)
    ts = np.array(ts)
    slope, intercept = np.polyfit(ks, ts, 1)
    fit = np.polyval([slope, intercept], ks)
    r2 = 1.0 - float(((ts - fit) ** 2).sum()
                     / max(((ts - ts.mean()) ** 2).sum(), 1e-30))
    if slope <= 0:
        # A negative/zero slope means the measurement is noise-dominated:
        # no ceiling can be quoted (clamping would yield an astronomical
        # bound that silently defeats the refusal check downstream).
        return None, r2
    return float(m * n * A.dtype.itemsize / slope / 1e9), r2


def _timed(thunk):
    t0 = time.perf_counter()
    thunk()
    return time.perf_counter() - t0


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
    # (A'y0 for the projection rhs, A x for y) and ~14 vector-length
    # passes (prox, over-relax, dual update, residual norms).  The
    # min(m,n)^2 Gram inverse is counted per-iteration ONLY when it
    # cannot live in VMEM (v5e: 128 MiB): measured round-4 evidence for
    # residency at n=5000 (op = 95 MiB) — (a) the full solver iteration
    # (595-627 us) is FASTER than the sum of its three matvecs timed in
    # isolation at HBM streaming speed (702 us), (b) charging the op to
    # HBM implies 799-842 GB/s, above this device's own measured gemv
    # streaming ceiling (~710-730 GB/s, calibrated below) — impossible —
    # while op-resident implies 639 GB/s (=90% of the ceiling), and
    # (c) at n=6000 (op = 137 MiB > VMEM) the iteration jumps to 850 us,
    # exactly the all-streamed model at the measured ceiling (736 GB/s).
    # Exact-residual iterations would add 2 more m*n streams but never
    # fire at zero tolerance.
    itemsize = 4
    k_dim = min(m, n)
    kind = jax.devices()[0].device_kind
    peak = PEAK_GBPS.get(kind)
    vmem_bytes = VMEM_BYTES.get(kind)
    op_bytes = k_dim * k_dim * itemsize
    # Unknown device kind (cpu/gpu backends): conservative — charge the
    # Gram inverse to HBM every iteration (op_resident=False).
    op_resident = (vmem_bytes is not None
                   and op_bytes + 16 * 2**20 <= vmem_bytes)
    bytes_per_iter = (2 * m * n + (0 if op_resident else k_dim * k_dim)
                      + 14 * (m + n)) * itemsize
    xla_total = xla_bytes_accessed(solver, f, g, int(ks[0]))
    achieved_gbps = bytes_per_iter / per_iter_s / 1e9

    # Calibrated streaming ceiling: slope of K isolated y = A @ x gemvs
    # (streams A once per iteration).  This is what the DEVICE actually
    # sustains for this access pattern — the honest upper bound for any
    # gemv-bound loop, typically below the paper HBM peak.
    gemv_ceiling_gbps, ceiling_r2 = measure_gemv_ceiling(A, m, n)

    out = {
        "metric": f"roofline_lasso_{m}x{n}",
        "us_per_iter": round(per_iter_s * 1e6, 1),
        "bytes_per_iter_mb": round(bytes_per_iter / 1e6, 1),
        "bytes_source": "analytic_model",
        "gram_inverse": ("vmem_resident" if op_resident else "hbm_streamed"),
        "xla_whole_solve_mb": (round(xla_total / 1e6, 1)
                               if xla_total is not None else None),
        "slope_fit_r2": round(r2, 5),
        "achieved_gbps": round(achieved_gbps, 1),
        "measured_gemv_ceiling_gbps": (round(gemv_ceiling_gbps, 1)
                                       if gemv_ceiling_gbps else None),
        "gemv_ceiling_fit_r2": round(ceiling_r2, 5),
        "device_kind": kind,
        "backend": jax.devices()[0].platform,
    }
    # Refusal checks apply on EVERY backend (ADVICE r4: previously nested
    # under `if peak:` so unknown device kinds could never refuse).
    if gemv_ceiling_gbps is None or ceiling_r2 < 0.95:
        out["warning"] = ("gemv ceiling slope non-positive or fit poor "
                          f"(r2={ceiling_r2:.3f}): ceiling measurement "
                          "invalid; do not publish this row")
    else:
        out["fraction_of_measured_ceiling"] = round(
            achieved_gbps / gemv_ceiling_gbps, 3)
        if achieved_gbps > 1.05 * gemv_ceiling_gbps:
            out["warning"] = ("achieved > measured ceiling: measurement or "
                              "cost model invalid; do not publish this row")
    if peak:
        out["peak_gbps"] = peak
        out["fraction_of_roofline"] = round(achieved_gbps / peak, 3)
        out["target"] = 0.8
        if achieved_gbps > peak:
            out["warning"] = ("achieved > paper peak: measurement or cost "
                              "model invalid; do not publish this row")
    print(json.dumps(out))
    # Publish only clean TPU rows: the results.json roofline table is keyed
    # by metric name alone, so a cpu/gpu run must never overwrite the TPU
    # rows (ADVICE r4 medium).
    if "warning" not in out and out["backend"] == "tpu" and peak:
        _merge_results(out)


def _merge_results(row):
    """Upsert this row (keyed by metric) into results.json:roofline so the
    published table is artifact-backed; refused rows are never stored."""
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results.json")
    data = {}
    if os.path.exists(path):
        with open(path) as fh:
            data = json.load(fh)
    rows = {r["metric"]: r for r in data.get("roofline", [])}
    rows[row["metric"]] = row
    data["roofline"] = list(rows.values())
    with open(path, "w") as fh:
        json.dump(data, fh, indent=2)


if __name__ == "__main__":
    main()
