"""Markowitz portfolio optimization (python/benchmarks portfolio suite):
  min gamma x'Sigma x - mu'x  s.t.  sum(x) = 1, x >= 0."""
import sys, os
import numpy as np
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmarks"))
from problems import portfolio
from pogs_tpu import solve_cone_problem
from common import banner, report


def main(n_assets=100, seed=0):
    banner(f"Portfolio optimization, {n_assets} assets")
    p = portfolio(n_assets=n_assets, seed=seed)
    out = solve_cone_problem(p["c"], p["A"], p["b"], p["dims"], P=p["P"],
                             max_iter=20000)
    report(out)
    x = out["x"]
    print(f"  sum(x)={x.sum():.4f}, min(x)={x.min():.2e}, "
          f"top-5 weights={np.sort(x)[-5:].round(3)}")


if __name__ == "__main__":
    main()
