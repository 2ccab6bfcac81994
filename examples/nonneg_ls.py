"""Non-negative least squares (examples/cpp/nonneg_l2.cpp)."""
import numpy as np
from pogs_tpu import solve_nonneg_ls
from common import banner, report


def main(m=300, n=150, seed=0):
    banner(f"Non-negative least squares {m}x{n}")
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((m, n))
    b = A @ np.abs(rng.standard_normal(n)) + 0.1 * rng.standard_normal(m)
    res = solve_nonneg_ls(A, b)
    report(res)
    print(f"  min(x) = {res['x'].min():.2e}")


if __name__ == "__main__":
    main()
