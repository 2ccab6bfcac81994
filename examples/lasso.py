"""Lasso example (examples/cpp/lasso.cpp): min 0.5||Ax-b||^2 + lam ||x||_1."""
import numpy as np
from pogs_tpu import solve_lasso
from common import banner, report


def main(m=500, n=300, seed=0):
    banner(f"Lasso {m}x{n}")
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((m, n))
    x_true = rng.standard_normal(n) * (rng.random(n) < 0.1)
    b = A @ x_true + 0.1 * rng.standard_normal(m)
    lam = 0.1 * np.max(np.abs(A.T @ b))
    res = solve_lasso(A, b, lam)
    report(res)
    print(f"  nnz(x) = {int(np.sum(np.abs(res['x']) > 1e-5))} / {n}")


if __name__ == "__main__":
    main()
