"""Packaged QP API: portfolio box-QP + MPC-style warm re-solve.

`solve_qp(P, q, G, h, A, b, lb, ub)` is the OSQP-style entry the
reference never had (its cone interface is the only QP route).  The
warm re-solve reuses the factorized solver returned by the first call —
the receding-horizon pattern.
"""
import numpy as np

from pogs_tpu import Status, solve_qp

from common import banner


def main(n=30, seed=0):
    banner(f"Long-only minimum-variance portfolio, n={n} assets")
    rng = np.random.default_rng(seed)
    F = rng.standard_normal((n, 5))
    Sigma = F @ F.T + 0.1 * np.eye(n)           # factor covariance
    mu = 0.02 * rng.standard_normal(n) + 0.05   # expected returns
    gamma = 2.0

    # maximize mu'w - gamma/2 w'Sigma w  s.t.  1'w = 1, 0 <= w <= 0.2
    out = solve_qp(
        gamma * Sigma, -mu,
        A=np.ones((1, n)), b=np.ones(1),
        lb=np.zeros(n), ub=np.full(n, 0.2),
        abs_tol=1e-7, rel_tol=1e-7, dtype=np.float64,
    )
    w = out["x"]
    assert Status(out["status"]) == Status.SUCCESS
    print(f"  status={out['status_name']}  iterations={out['iterations']}")
    print(f"  expected return {mu @ w:.4f}  risk {np.sqrt(w @ Sigma @ w):.4f}"
          f"  max weight {w.max():.3f}  sum {w.sum():.6f}")

    banner("Warm re-solve after a return-estimate update (MPC pattern)")
    mu2 = mu + 0.002 * rng.standard_normal(n)
    warm = solve_qp(
        gamma * Sigma, -mu2,
        A=np.ones((1, n)), b=np.ones(1),
        lb=np.zeros(n), ub=np.full(n, 0.2),
        solver=out["solver"], warm_start=True,
        abs_tol=1e-7, rel_tol=1e-7, dtype=np.float64,
    )
    print(f"  cold iterations={out['iterations']}  "
          f"warm iterations={warm['iterations']}  "
          f"turnover {np.abs(warm['x'] - w).sum():.4f}")


if __name__ == "__main__":
    import jax

    jax.config.update("jax_enable_x64", True)
    main()
