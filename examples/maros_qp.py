"""Ill-conditioned QP with active-set polish (Maros–Mészáros CVXQP1).

The CVXQP generator recipe reproduces the published collection problem
(cond(Q) ≈ 7e18 at n=100 — see benchmarks/maros_meszaros.py).  ADMM
alone stalls near 1e-2 relative accuracy on this conditioning; the
PDAS active-set polish (pogs_tpu/solver/qp_polish.py, on by default)
finishes the solve to ~1e-10 from a few-hundred-iteration seed.
Published optimum: 1.1590718e4.
"""
import numpy as np

from pogs_tpu import solve_cone
from pogs_tpu.types import Cone, ConeConstraint

from common import banner


def main(n=100, seed=None):
    banner(f"CVXQP1_S (Maros–Mészáros recipe) n={n}")
    m = n // 2
    # CUTE recipe: Q = sum_i i*v_i v_i^T, v_i = e_i + e_{(2i-1)%n} + e_{(3i-1)%n};
    # constraints x_i + 2x_{(4i-1)%n} + 3x_{(5i-1)%n} = 6; bounds 0.1..10.
    V = np.zeros((n, n))
    for i in range(1, n + 1):
        for j in (i - 1, (2 * i - 1) % n, (3 * i - 1) % n):
            V[i - 1, j] += 1.0
    Q = V.T @ (np.arange(1, n + 1)[:, None] * V)
    A = np.zeros((m, n))
    for i in range(1, m + 1):
        A[i - 1, i - 1] += 1.0
        A[i - 1, (4 * i - 1) % n] += 2.0
        A[i - 1, (5 * i - 1) % n] += 3.0
    A_bar = np.vstack([A, np.eye(n), -np.eye(n)])
    b_bar = np.concatenate([np.full(m, 6.0), np.full(n, 10.0),
                            np.full(n, -0.1)])
    Ky = [ConeConstraint(Cone.ZERO, range(m)),
          ConeConstraint(Cone.NON_NEG, range(m, m + 2 * n))]
    res = solve_cone(A_bar, b_bar, np.zeros(n), Kx=(), Ky=Ky, P=Q,
                     dtype=np.float64, abs_tol=1e-6, rel_tol=1e-6,
                     max_iter=1500)
    print(f"  status={res['status']}  optval={res['optval']:.6f}  "
          f"(published 11590.718)  iterations={res['iterations']}")
    print(f"  rel. err vs published: "
          f"{abs(res['optval'] - 1.1590718e4) / 1.1590718e4:.2e}")


if __name__ == "__main__":
    import jax

    jax.config.update("jax_enable_x64", True)
    main()
