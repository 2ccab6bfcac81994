"""Quantile regression (examples/cpp/quantile_regression.cpp):
  minimize sum_i pinball_tau(a_i'x - b_i)
        == (1/2)||Ax - b||_1 + (tau - 1/2) sum_i (a_i'x - b_i)
encoded as f_i = 0.5|y - b_i| + (tau - 0.5) y  (kAbs with c=0.5, d=tau-0.5).
"""
import numpy as np
from pogs_tpu import solve_graph_form, FunctionVector, Function
from common import banner, report


def main(m=400, n=100, tau=0.2, seed=0):
    banner(f"Quantile regression {m}x{n}, tau={tau}")
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((m, n))
    b = A @ rng.standard_normal(n) + rng.standard_normal(m)
    f = FunctionVector(Function.ABS, m, b=b, c=0.5, d=tau - 0.5)
    g = FunctionVector(Function.ZERO, n)
    res = solve_graph_form(A, f, g, max_iter=20000)
    report(res)
    r = A @ res["x"] - b
    pinball = float(np.sum(np.where(r > 0, tau * r, -(1 - tau) * r)))
    print(f"  pinball objective: {pinball:.4f} "
          f"(fraction of residuals below 0: {np.mean(r < 0):.3f})")


if __name__ == "__main__":
    main()
