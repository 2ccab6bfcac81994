"""Huber (robust) regression with outliers."""
import numpy as np
from pogs_tpu import solve_huber
from common import banner, report


def main(m=400, n=100, seed=0):
    banner(f"Huber regression {m}x{n} with 5% outliers")
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((m, n))
    x_true = rng.standard_normal(n)
    b = A @ x_true + 0.1 * rng.standard_normal(m)
    mask = rng.random(m) < 0.05
    b[mask] += 20 * rng.standard_normal(mask.sum())
    res = solve_huber(A, b, delta=1.0)
    report(res)
    print(f"  ||x - x_true|| = {np.linalg.norm(res['x'] - x_true):.4f}")


if __name__ == "__main__":
    main()
