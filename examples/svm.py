"""Linear SVM via hinge loss (examples/cpp/svm.cpp)."""
import numpy as np
from pogs_tpu import solve_svm
from common import banner, report


def main(m=500, n=100, seed=0):
    banner(f"SVM {m}x{n}")
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((m, n))
    w = rng.standard_normal(n)
    y = np.sign(A @ w + 0.1 * rng.standard_normal(m))
    res = solve_svm(A, y, lambd=1.0)
    report(res)
    acc = np.mean(np.sign(A @ res["x"]) == y)
    print(f"  training accuracy: {acc:.3f}")


if __name__ == "__main__":
    main()
