"""SDP example (examples/cpp_cone/test_sdp.cpp): smallest eigenvalue via
  min tr(CX) s.t. tr(X) = 1, X PSD."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmarks"))
from problems import sdp_min_eig
from pogs_tpu import solve_cone_problem
from common import banner, report


def main(nmat=10, seed=0):
    banner(f"SDP: smallest eigenvalue, {nmat}x{nmat} matrix")
    p = sdp_min_eig(nmat=nmat, seed=seed)
    out = solve_cone_problem(p["c"], p["A"], p["b"], p["dims"], max_iter=20000)
    report(out)
    print(f"  true lambda_min = {p['lam_min']:.6f}")


if __name__ == "__main__":
    main()
