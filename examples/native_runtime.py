"""The native host runtime: C ABI solves from Python via ctypes.

Builds libpogs_tpu_native in-tree if needed (requires cmake + C++20),
then solves a lasso and an LP through the C ABI and cross-checks the
lasso against the JAX solver.
"""

import numpy as np

def make_lasso_problem(m, n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((m, n))
    x_true = rng.standard_normal(n) * (rng.random(n) < 0.1)
    b = A @ x_true + 0.1 * rng.standard_normal(m)
    lam_max = float(np.max(np.abs(A.T @ b)))
    return A, b, lam_max


def main():
    from pogs_tpu import native
    from pogs_tpu.types import (
        Cone, ConeConstraint, Function, FunctionVector, Status,
    )

    if not native.is_available():
        try:
            native.build()
        except Exception as exc:
            print(f"native runtime unavailable ({exc}); skipping example")
            return

    print(f"native runtime version {native.version()}")

    # Graph form: lasso through the C ABI.
    A, b, lam_max = make_lasso_problem(120, 60, seed=1)
    m, n = A.shape
    f = FunctionVector(Function.SQUARE, m, b=b)
    g = FunctionVector(Function.ABS, n, c=0.5 * lam_max)
    out = native.solve_graph_native(A, f, g, abs_tol=1e-6, rel_tol=1e-6)
    print(f"native lasso : status={out['status'].name} "
          f"optval={out['optval']:.5f} iters={out['iterations']}")
    assert out["status"] == Status.SUCCESS

    from pogs_tpu import solve_lasso
    ref = solve_lasso(A, b, 0.5 * lam_max, abs_tol=1e-6, rel_tol=1e-6)
    print(f"jax    lasso : optval={ref['optval']:.5f} "
          f"(agreement {abs(ref['optval'] - out['optval']):.2e})")

    # Cone form: LP with known solution (min x1 + 2 x2, x1+x2=1, x>=0).
    A_lp = np.array([[1.0, 1.0], [-1.0, 0.0], [0.0, -1.0]])
    b_lp = np.array([1.0, 0.0, 0.0])
    c_lp = np.array([1.0, 2.0])
    Ky = [ConeConstraint(Cone.ZERO, [0]), ConeConstraint(Cone.NON_NEG, [1, 2])]
    lp = native.solve_cone_native(A_lp, b_lp, c_lp, Ky=Ky,
                                  abs_tol=1e-6, rel_tol=1e-6)
    print(f"native LP    : status={lp['status'].name} "
          f"optval={lp['optval']:.5f} x={np.round(lp['x'], 4)}")
    assert lp["status"] == Status.SUCCESS
    assert abs(lp["optval"] - 1.0) < 1e-2

    # QP through the C ABI (counterpart of the reference's PogsConeQD,
    # pogs_c.h:178-243): min ½x'Px + c'x s.t. b - Ax >= 0, with a
    # KKT-constructed known optimum.
    rng = np.random.default_rng(7)
    mq, nq = 30, 12
    Aq = rng.standard_normal((mq, nq))
    Mq = rng.standard_normal((nq, nq))
    P = Mq @ Mq.T / nq + 0.5 * np.eye(nq)
    xstar = rng.standard_normal(nq)
    mask = np.zeros(mq, dtype=bool)
    mask[rng.permutation(mq)[: nq // 2]] = True
    ystar = np.where(mask, np.abs(rng.standard_normal(mq)) + 0.5, 0.0)
    sstar = np.where(mask, 0.0, np.abs(rng.standard_normal(mq)) + 0.5)
    bq = Aq @ xstar + sstar
    cq = -(P @ xstar) - Aq.T @ ystar
    opt = float(0.5 * xstar @ P @ xstar + cq @ xstar)
    Kyq = [ConeConstraint(Cone.NON_NEG, range(mq))]
    qp = native.solve_cone_native(Aq, bq, cq, Ky=Kyq, P=P,
                                  abs_tol=1e-6, rel_tol=1e-6, max_iter=20000)
    print(f"native QP    : status={qp['status'].name} "
          f"optval={qp['optval']:.5f} (expect {opt:.5f})")
    assert qp["status"] == Status.SUCCESS
    assert abs(qp["optval"] - opt) < 1e-2

    # SDP through the C ABI: min <C,X> s.t. tr X = 1, X PSD — optimum is
    # the smallest eigenvalue of C.  SDP blocks are svec-packed
    # (column-major lower triangle, sqrt(2)-scaled off-diagonals).
    d = 4
    L = d * (d + 1) // 2
    Cmat = rng.standard_normal((d, d))
    Cmat = (Cmat + Cmat.T) / 2

    def svec(S):
        out = []
        for col in range(d):
            for row in range(col, d):
                out.append(S[row, col] * (1.0 if row == col else np.sqrt(2.0)))
        return np.asarray(out)

    A_sdp = svec(np.eye(d))[None, :]
    sdp = native.solve_cone_native(
        A_sdp, np.array([1.0]), svec(Cmat),
        Kx=[ConeConstraint(Cone.SDP, range(L))],
        Ky=[ConeConstraint(Cone.ZERO, [0])],
        abs_tol=1e-6, rel_tol=1e-6, max_iter=20000,
    )
    lam_min = float(np.linalg.eigvalsh(Cmat).min())
    print(f"native SDP   : status={sdp['status'].name} "
          f"optval={sdp['optval']:.5f} (lambda_min {lam_min:.5f})")
    assert sdp["status"] == Status.SUCCESS
    assert abs(sdp["optval"] - lam_min) < 1e-2


if __name__ == "__main__":
    main()
