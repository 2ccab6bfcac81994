"""L1-regularized logistic regression (examples/cpp/logistic.cpp)."""
import numpy as np
from pogs_tpu import solve_logistic
from common import banner, report


def main(m=500, n=200, seed=0):
    banner(f"Logistic regression {m}x{n}")
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((m, n))
    w = rng.standard_normal(n)
    y = np.sign(A @ w + 0.5 * rng.standard_normal(m))
    res = solve_logistic(A, y, lambd=0.05 * np.max(np.abs(A.T @ y)))
    report(res)
    acc = np.mean(np.sign(A @ res["x"]) == y)
    print(f"  training accuracy: {acc:.3f}")


if __name__ == "__main__":
    main()
