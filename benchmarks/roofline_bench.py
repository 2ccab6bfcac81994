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

import json
import time

import numpy as np

M, N = 10000, 5000
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

    rng = np.random.default_rng(11)
    A = rng.standard_normal((M, N)).astype(np.float32)
    b = rng.standard_normal(M).astype(np.float32)
    lam = 0.1 * float(np.max(np.abs(A.T @ b)))
    f = FunctionVector(Function.SQUARE, M, b=b, dtype=jnp.float32)
    g = FunctionVector(Function.ABS, N, c=lam, dtype=jnp.float32)

    solver = GraphFormSolver(A, dtype=jnp.float32)
    t1 = measure(solver, f, g, K_ITERS)
    t2 = measure(solver, f, g, 2 * K_ITERS)
    per_iter_s = max(t2 - t1, 1e-9) / K_ITERS

    itemsize = 4
    bytes_per_iter = (2 * M * N + N * N + 14 * (M + N)) * itemsize
    achieved_gbps = bytes_per_iter / per_iter_s / 1e9

    kind = jax.devices()[0].device_kind
    peak = PEAK_GBPS.get(kind)
    out = {
        "metric": "roofline_lasso_10000x5000",
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
