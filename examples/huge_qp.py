"""Large-scale separable QP: diagonal Hessians never form an (n, n) object.

Two regimes:

1. Bounds-only (a 200,000-variable box-constrained separable QP): the
   presolve answers with the exact per-coordinate closed form — no
   iteration at all.
2. Diagonal P + general sparse coupling rows at n = 20,000: the staged
   epigraph-SOC solve runs 500-iteration segments and the PDAS polish
   (bound-row elimination + a k_gen x k_gen Schur complement) certifies
   the optimum at the first boundary, at ~1e-16 KKT residuals.

The reference cannot express either: its QP path is dense-only and its
own HSDE/QP pairing is documented broken (src/cpu/pogs.cpp:1935-1944).

Run:  python examples/huge_qp.py [--cpu]
"""

import os
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv[1:]:
    import jax

    jax.config.update("jax_platforms", "cpu")

from pogs_tpu import Status, solve_qp  # noqa: E402


def main():
    rng = np.random.default_rng(0)

    # -- regime 1: closed form ------------------------------------------
    n = 200_000
    p = rng.uniform(0.5, 2.0, n)
    q = rng.standard_normal(n)
    lb, ub = np.full(n, -0.5), np.full(n, 0.5)
    t0 = time.perf_counter()
    out = solve_qp(p, q, lb=lb, ub=ub)
    dt = time.perf_counter() - t0
    err = np.abs(out["x"] - np.clip(-q / p, lb, ub)).max()
    print(f"bounds-only n={n:,}: {dt * 1e3:.1f} ms, "
          f"max err vs closed form {err:.2e} ({out['presolve']})")

    # -- regime 2: coupled rows through the staged solver ----------------
    n = 20_000
    p = rng.uniform(0.5, 2.0, n)
    q = rng.standard_normal(n)
    lb, ub = np.full(n, -0.5), np.full(n, 0.5)
    G = sp.random(50, n, density=0.001, random_state=7, format="csr")
    h = np.full(50, -0.05)
    t0 = time.perf_counter()
    out = solve_qp(p, q, G, h, lb=lb, ub=ub, abs_tol=1e-6, rel_tol=1e-6,
                   max_iter=4000, dtype=np.float64)
    dt = time.perf_counter() - t0
    assert Status(out["status"]) == Status.SUCCESS
    r = (p * out["x"] + q + G.T @ out["z_ineq"]
         + out["z_ub"] - out["z_lb"])
    print(f"coupled n={n:,} (50 sparse rows): {dt:.1f} s, "
          f"{out['num_iters']} iterations, "
          f"stationarity {np.abs(r).max():.2e}")


if __name__ == "__main__":
    main()
