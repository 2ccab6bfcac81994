"""Equality and inequality LPs (examples/cpp/lp_eq.cpp, lp_ineq.cpp).

lp_eq uses the graph-form encoding of the reference example:
  f_i = I(y_i = b_i)  (kIndEq0 with offset), g_j = I(x_j >= 0) + c_j x_j.
lp_ineq goes through the cone API.
"""
import numpy as np
from pogs_tpu import (solve_graph_form, solve_cone_problem,
                      FunctionVector, Function)
from common import banner, report


def lp_eq(m=50, n=100, seed=0):
    banner(f"LP (equality, graph form) {m}x{n}")
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((m, n))
    x0 = rng.random(n)
    b = A @ x0
    c = rng.random(n)
    f = FunctionVector(Function.INDEQ0, m, b=b)
    g = FunctionVector(Function.INDGE0, n, d=c)
    res = solve_graph_form(A, f, g, max_iter=20000)
    report(res)


def lp_ineq(m=100, n=50, seed=0):
    banner(f"LP (inequality, cone form) {m}x{n}")
    rng = np.random.default_rng(seed)
    A = np.vstack([rng.standard_normal((m, n)), -np.eye(n)])
    b = np.concatenate([A[:m] @ rng.random(n) + rng.random(m), np.zeros(n)])
    c = rng.random(n)
    out = solve_cone_problem(c, A, b, {"l": m + n})
    report(out)


if __name__ == "__main__":
    lp_eq()
    lp_ineq()
