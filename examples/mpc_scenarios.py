"""Scenario-batched cone solves: one matrix, many right-hand sides.

The production pattern batched_cone_solve targets: solve the same
constrained problem for a batch of scenarios (here: minimum-cost points
inside a trust region around K different operating points) in ONE device
program — equilibrate + factor once, vmapped HSDE, one batched matmul per
iteration.
"""

import numpy as np

from common import banner


def main(n=12, K=16):
    from pogs_tpu.parallel.batch import batched_cone_solve
    from pogs_tpu.types import Cone, ConeConstraint, SolverSettings

    banner(f"Scenario-batched SOCP: {K} scenarios, n={n}")
    rng = np.random.default_rng(7)
    c = rng.standard_normal(n).astype(np.float32)
    r = 1.0
    # b - Ax = (r, x - x0_k) in SOC: min c'x s.t. ||x - x0_k|| <= r.
    A = np.vstack([np.zeros((1, n)), -np.eye(n)]).astype(np.float32)
    Ky = [ConeConstraint(Cone.SOC, range(n + 1))]
    x0s = rng.standard_normal((K, n)).astype(np.float32)
    b_batch = np.concatenate([np.full((K, 1), r, np.float32), -x0s], axis=1)

    st = SolverSettings(abs_tol=1e-6, rel_tol=1e-6)
    out = batched_cone_solve(A, b_batch, c, Ky, settings=st)
    ok = np.asarray(out["status"]) == 0
    print(f"  all {K} scenarios converged: {bool(ok.all())}")
    for k in range(0, K, max(1, K // 4)):
        expect = float(c @ x0s[k] - r * np.linalg.norm(c))
        got = float(out["optval"][k])
        print(f"  scenario {k:2d}: optval={got:9.4f}  closed-form={expect:9.4f}"
              f"  iters={int(out['iterations'][k])}")
        assert abs(got - expect) < 1e-3 * (1 + abs(expect))
    assert bool(ok.all())

    # Receding-horizon variant: a SEQUENCE of drifting operating points,
    # solved as one lax.scan with the HSDE embedding carried between
    # steps (warm_path_cone_solve) — the MPC re-solve pattern.
    banner("Receding-horizon warm path: drifting operating point")
    from pogs_tpu.parallel.batch import warm_path_cone_solve

    steps = 16
    drift = np.cumsum(0.05 * rng.standard_normal((steps, n)), axis=0)
    x0_seq = (x0s[0][None, :] + drift).astype(np.float32)
    b_seq = np.concatenate([np.full((steps, 1), r, np.float32), -x0_seq],
                           axis=1)
    warm = warm_path_cone_solve(A, b_seq, c, Ky, settings=st)
    cold = batched_cone_solve(A, b_seq, c, Ky, settings=st)
    wi = int(np.sum(np.asarray(warm["iterations"])))
    ci = int(np.sum(np.asarray(cold["iterations"])))
    print(f"  warm path: {wi} total iterations vs {ci} independent "
          f"({ci / max(wi, 1):.1f}x fewer)")
    for k in range(0, steps, steps // 4):
        expect = float(c @ x0_seq[k] - r * np.linalg.norm(c))
        got = float(warm["optval"][k])
        assert abs(got - expect) < 5e-3 * (1 + abs(expect)), (k, got, expect)
    assert bool((np.asarray(warm["status"]) == 0).all())


def quadratic_costs(n=10, K=8):
    """Scenario QPs with quadratic stage costs (round-3 batched_qp_solve):
    K tracking problems min ½(x−t_k)ᵀQ(x−t_k) over a box, one shared
    (A, Q).  The epigraph-SOC extension is built once; the sweep is one
    vmapped HSDE solve; each lane finishes with the host-f64 PDAS polish."""
    from pogs_tpu.parallel import batched_qp_solve
    from pogs_tpu.types import Cone, ConeConstraint, SolverSettings

    banner(f"Scenario-batched QP (quadratic tracking): {K} scenarios, n={n}")
    rng = np.random.default_rng(7)
    B = rng.standard_normal((n, n))
    Q = B @ B.T + 0.5 * np.eye(n)
    targets = rng.uniform(-2.0, 2.0, size=(K, n))
    c_batch = -(targets @ Q)          # min ½xᵀQx − tᵀQx  (+ const)
    A = np.vstack([np.eye(n), -np.eye(n)])
    b_batch = np.broadcast_to(np.ones(2 * n), (K, 2 * n)).copy()  # |x| ≤ 1
    Ky = [ConeConstraint(Cone.NON_NEG, range(2 * n))]
    st = SolverSettings(abs_tol=1e-6, rel_tol=1e-6, max_iter=20000)
    out = batched_qp_solve(A, Q, b_batch, c_batch, Ky, settings=st)
    ok = int((out["status"] == 0).sum())
    print(f"  {ok}/{K} scenarios SUCCESS; "
          f"{int(out['polished'].sum())} polished; "
          f"optval range [{out['optval'].min():.3f}, {out['optval'].max():.3f}]")
    # Unconstrained solution clipped to the box is optimal only when the
    # box is inactive; check the in-box scenarios analytically.
    for k in range(K):
        x_free = targets[k]
        if np.all(np.abs(x_free) <= 1.0):
            expect = c_batch[k] @ x_free + 0.5 * x_free @ Q @ x_free
            assert abs(out["optval"][k] - expect) < 1e-6 * (1 + abs(expect))


if __name__ == "__main__":
    main()
    quadratic_costs()
