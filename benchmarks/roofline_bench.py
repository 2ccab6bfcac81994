"""HBM-roofline benchmark for the per-iteration hot path.

BASELINE target: per-iteration matvec+prox cost >= 80% of the HBM roofline
on one chip.  Protocol: a large dense lasso (HBM-resident, fused path
ineligible) run for a FIXED iteration count twice (K and 2K) so the
per-iteration time is the slope — per-launch and init costs cancel.  The
bytes-per-iteration model counts the dominant HBM streams of one ADMM
iteration with the direct (inverse) projector, tall case:

    A^T y0      : m*n      (project rhs)
    Ginv @ rhs  : n*n      (the SPD-inverse matmul)
    A @ x       : m*n      (y = Ax)
    vectors     : ~14*(m+n) (prox, over-relax, dual update, residual norms)

Exact-residual iterations add 2 more m*n streams but only fire near
convergence; with tolerance 0 they never trigger, matching this model.

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


def measure(solver, f, g, iters):
    import numpy as np

    from pogs_tpu.types import SolverSettings

    st = SolverSettings(abs_tol=1e-30, rel_tol=1e-30, max_iter=iters,
                        use_fused=False)
    solver.solve(f, g, settings=st)  # compile
    ts = []
    for rep in range(REPS):
        solver.reset_warm_start()
        t0 = time.perf_counter()
        solver.solve(f, g, settings=st, rho=1.0 + 1e-4 * (rep + 1))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts[1:]))


def main():
    import jax
    import jax.numpy as jnp

    from pogs_tpu import Function, FunctionVector, GraphFormSolver

    ap = argparse.ArgumentParser()
    ap.add_argument("--xl", action="store_true",
                    help=f"run the {XL_M}x{XL_N} HBM-wall configuration")
    ap.add_argument("--iters", type=int, default=None)
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
    t1 = measure(solver, f, g, k_iters)
    t2 = measure(solver, f, g, 2 * k_iters)
    per_iter_s = max(t2 - t1, 1e-9) / k_iters

    itemsize = 4
    bytes_per_iter = (2 * m * n + n * n + 14 * (m + n)) * itemsize
    achieved_gbps = bytes_per_iter / per_iter_s / 1e9

    kind = jax.devices()[0].device_kind
    peak = PEAK_GBPS.get(kind)
    out = {
        "metric": f"roofline_lasso_{m}x{n}",
        "us_per_iter": round(per_iter_s * 1e6, 1),
        "model_bytes_per_iter_mb": round(bytes_per_iter / 1e6, 1),
        "achieved_gbps": round(achieved_gbps, 1),
        "device_kind": kind,
        "backend": jax.devices()[0].platform,
    }
    if peak:
        out["peak_gbps"] = peak
        out["fraction_of_roofline"] = round(achieved_gbps / peak, 3)
        out["target"] = 0.8
    print(json.dumps(out))


if __name__ == "__main__":
    main()
