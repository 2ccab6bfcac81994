"""Fused HSDE Pallas kernel vs the XLA DR loop — trajectory parity.

Same algorithm, same constants: identical final iterates (w), statuses,
and certificates.  Interpreter mode on the CPU backend.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from pogs_tpu.types import Cone, ConeConstraint, SolverSettings, Status
from pogs_tpu.cones.sets import ConeSet
from pogs_tpu.solver.hsde import hsde_solve, smw_setup
from pogs_tpu.ops.fused_hsde import (
    fused_hsde_solve, fused_hsde_eligible, _segments,
)


def _both(A, b, c, Ky, tol=1e-6, max_iter=2000):
    A = jnp.asarray(A, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    c = jnp.asarray(c, jnp.float32)
    ref = hsde_solve(A, b, c, Ky, strategy="smw", abs_tol=tol, rel_tol=tol,
                     max_iter=max_iter)
    fac = smw_setup(A, b, c)
    m, n = A.shape
    if m >= n:
        Kinv = fac["Kinv"]  # (I + AᵀA)⁻¹, n×n
    else:
        # The kernel's wide path expects the m×m (I + AAᵀ)⁻¹ (the factor
        # the projector caches) and applies Woodbury internally.
        Kinv = jnp.linalg.inv(jnp.eye(m, dtype=A.dtype) + A @ A.T)
    fus = fused_hsde_solve(A, b, c, Ky, Kinv, fac["t_x"], fac["t_y"],
                           fac["s_den"], tol, tol, max_iter, interpret=True)
    return ref, fus


def _assert_match(ref, fus):
    assert int(ref["status"]) == int(fus["status"])
    assert int(ref["final_iter"]) == int(fus["final_iter"])
    np.testing.assert_allclose(np.asarray(ref["w"]), np.asarray(fus["w"]),
                               atol=1e-6)


def test_fused_hsde_lp():
    A = np.array([[1.0, 1.0], [-1.0, 0.0], [0.0, -1.0]])
    b = np.array([1.0, 0.0, 0.0])
    c = np.array([1.0, 2.0])
    Ky = ConeSet([ConeConstraint(Cone.ZERO, [0]),
                  ConeConstraint(Cone.NON_NEG, [1, 2])], 3)
    ref, fus = _both(A, b, c, Ky)
    _assert_match(ref, fus)
    assert int(fus["status"]) == int(Status.SUCCESS)


def test_fused_hsde_socp_wide():
    rng = np.random.default_rng(5)
    n = 9
    x0 = rng.standard_normal(n)
    c = rng.standard_normal(n)
    A = np.vstack([np.zeros((1, n)), -np.eye(n)])  # wide? m = n+1 > n: tall
    b = np.concatenate([[1.5], -x0])
    Ky = ConeSet([ConeConstraint(Cone.SOC, range(n + 1))], n + 1)
    ref, fus = _both(A, b, c, Ky, max_iter=5000)
    _assert_match(ref, fus)
    assert int(fus["status"]) == int(Status.SUCCESS)
    # wide case (m < n): equality rows with c in the row space of A, so
    # the objective is constant on the feasible set — bounded and solvable.
    A2 = rng.standard_normal((3, 8)).astype(np.float64)
    xf = rng.standard_normal(8)
    b2 = A2 @ xf
    c2 = A2.T @ rng.standard_normal(3)
    Ky2 = ConeSet([ConeConstraint(Cone.ZERO, range(3))], 3)
    ref2, fus2 = _both(A2, b2, c2, Ky2, max_iter=5000)
    # Wide path applies the Woodbury identity instead of the explicit n×n
    # inverse — mathematically identical, different f32 roundoff, so assert
    # solution-level (not trajectory-level) agreement.
    assert int(ref2["status"]) == int(Status.SUCCESS)
    assert int(fus2["status"]) == int(Status.SUCCESS)
    wr, wf = np.asarray(ref2["w"]), np.asarray(fus2["w"])
    x_r = wr[:8] / wr[-1]
    x_f = wf[:8] / wf[-1]
    np.testing.assert_allclose(A2 @ x_f, b2, atol=1e-3)
    assert float(c2 @ x_f) == pytest.approx(float(c2 @ x_r), rel=1e-3,
                                            abs=1e-3)


def test_fused_hsde_infeasible_certificate():
    # x >= 1 and x <= 0: infeasible.
    A = np.array([[-1.0], [1.0]])
    b = np.array([-1.0, 0.0])
    c = np.array([1.0])
    Ky = ConeSet([ConeConstraint(Cone.NON_NEG, [0, 1])], 2)
    ref, fus = _both(A, b, c, Ky, max_iter=5000)
    assert int(ref["status"]) == int(Status.INFEASIBLE)
    assert int(fus["status"]) == int(Status.INFEASIBLE)


def test_fused_hsde_unbounded_certificate():
    # min -x s.t. x >= 0: unbounded below.
    A = np.array([[-1.0]])
    b = np.array([0.0])
    c = np.array([-1.0])
    Ky = ConeSet([ConeConstraint(Cone.NON_NEG, [0])], 1)
    ref, fus = _both(A, b, c, Ky, max_iter=5000)
    assert int(ref["status"]) == int(Status.UNBOUNDED)
    assert int(fus["status"]) == int(Status.UNBOUNDED)


def test_fused_hsde_eligibility():
    Ky = ConeSet([ConeConstraint(Cone.SOC, range(8))], 8)
    assert fused_hsde_eligible(8, 4, jnp.float32, Ky, False, False)
    assert not fused_hsde_eligible(8, 4, jnp.float32, Ky, True, False)  # P
    assert not fused_hsde_eligible(8, 4, jnp.float32, Ky, False, True)  # AA
    # non-contiguous SOC -> ineligible
    Ky_nc = ConeSet([ConeConstraint(Cone.SOC, [0, 2, 4])], 5)
    assert _segments(Ky_nc) is None
    assert not fused_hsde_eligible(5, 3, jnp.float32, Ky_nc, False, False)
    # exp cones are fused since round 2 (see test_fused_hsde_exp_now_eligible)


def test_fused_hsde_through_cone_solver():
    """use_fused=True forces the fused HSDE through ConeSolver."""
    from pogs_tpu.solver.cone import ConeSolver

    A = np.array([[1.0, 1.0], [-1.0, 0.0], [0.0, -1.0]])
    b = np.array([1.0, 0.0, 0.0])
    c = np.array([1.0, 2.0])
    Ky = [ConeConstraint(Cone.ZERO, [0]), ConeConstraint(Cone.NON_NEG, [1, 2])]
    st = SolverSettings(abs_tol=1e-6, rel_tol=1e-6, use_fused=True)
    res = ConeSolver(A, Ky=Ky, settings=st, dtype=jnp.float32).solve(b, c)
    ref = ConeSolver(A, Ky=Ky, settings=st.replace(use_fused=False),
                     dtype=jnp.float32).solve(b, c)
    assert res.status == Status.SUCCESS
    assert float(res.optval) == pytest.approx(float(ref.optval), rel=1e-4,
                                              abs=1e-5)
    assert int(res.final_iter) == int(ref.final_iter)


def test_fused_hsde_many_soc_segments():
    """8 SOC segments: the in-kernel segment chain matches the XLA loop
    (both on a feasible and an infeasible instance)."""
    from pogs_tpu.solver.cone import ConeSolver

    rng = np.random.default_rng(1)
    nseg, L, n = 8, 8, 30
    m = nseg * L
    F = (rng.standard_normal((m, n)) * 0.3).astype(np.float32)
    c = rng.standard_normal(n).astype(np.float32)
    Ky = [ConeConstraint(Cone.SOC, range(k * L, (k + 1) * L))
          for k in range(nseg)]
    st = SolverSettings(abs_tol=1e-5, rel_tol=1e-5, max_iter=20000)

    # Infeasible-ish random instance: both paths must agree on the verdict.
    b_bad = (np.abs(rng.standard_normal(m)) + 0.5).astype(np.float32)
    res = {}
    for uf in (True, False):
        res[uf] = ConeSolver(F, Ky=Ky,
                             settings=st.replace(use_fused=uf)).solve(b_bad, c)
    assert res[True].status == res[False].status

    # Feasible instance: heads large enough that x=0 is strictly feasible.
    b_ok = b_bad.copy()
    for k in range(nseg):
        seg = slice(k * L, (k + 1) * L)
        b_ok[k * L] = float(np.linalg.norm(b_bad[seg][1:]) + 2.0)
    for uf in (True, False):
        res[uf] = ConeSolver(F, Ky=Ky,
                             settings=st.replace(use_fused=uf)).solve(b_ok, c)
    assert res[True].status == Status.SUCCESS
    assert res[False].status == Status.SUCCESS
    assert float(res[True].optval) == pytest.approx(float(res[False].optval),
                                                    rel=1e-3, abs=1e-4)


def test_fused_hsde_exp_cone():
    """Exp-cone LP in the fused kernel (VERDICT round-1 item 9): maximize
    r s.t. (r, 1, e) ∈ K_exp ⇒ r* = 1 (since 1·e^{r} ≤ e ⇔ r ≤ 1).
    Trajectory parity with the XLA loop: the kernel's exp projection is
    the same fixed-iteration two-branch bisection."""
    e_const = float(np.e)
    A = np.array([[-1.0], [0.0], [0.0]])
    b = np.array([0.0, 1.0, e_const])
    c = np.array([-1.0])
    Ky = ConeSet([ConeConstraint(Cone.EXP_PRIMAL, [0, 1, 2])], 3)
    ref, fus = _both(A, b, c, Ky, max_iter=5000)
    _assert_match(ref, fus)
    assert int(fus["status"]) == int(Status.SUCCESS)
    w = np.asarray(fus["w"])
    x = w[0] / w[-1]
    assert x == pytest.approx(1.0, abs=5e-3)


def test_fused_hsde_mixed_exp_soc_segments():
    """Mixed Zero + NonNeg + SOC + EXP_PRIMAL segments in one problem:
    min c'x over the intersection; fused == XLA trajectory."""
    rng = np.random.default_rng(17)
    n = 4
    # x bounded by: Ax <= b (nonneg rows), an SOC ball around x0, and an
    # exp-cone row tying x[0] into (x0_head, 1, e).
    x0 = rng.standard_normal(n)
    c = rng.standard_normal(n)
    soc = np.vstack([np.zeros((1, n)), -np.eye(n)])
    b_soc = np.concatenate([[2.0], -x0])
    A_exp = np.zeros((3, n))
    A_exp[0, 0] = -1.0
    b_exp = np.array([0.0, 1.0, float(np.e)])
    A_nn = rng.standard_normal((2, n))
    b_nn = A_nn @ x0 + 2.0
    A = np.vstack([soc, A_exp, A_nn])
    b = np.concatenate([b_soc, b_exp, b_nn])
    m = A.shape[0]
    Ky = ConeSet([
        ConeConstraint(Cone.SOC, range(n + 1)),
        ConeConstraint(Cone.EXP_PRIMAL, [n + 1, n + 2, n + 3]),
        ConeConstraint(Cone.NON_NEG, [n + 4, n + 5]),
    ], m)
    ref, fus = _both(A, b, c, Ky, max_iter=8000)
    _assert_match(ref, fus)
    assert int(fus["status"]) == int(Status.SUCCESS)


def test_fused_hsde_exp_now_eligible():
    """Eligibility: exp cones no longer force the XLA fallback."""
    Ky = ConeSet([ConeConstraint(Cone.EXP_PRIMAL, [0, 1, 2])], 3)
    assert fused_hsde_eligible(3, 2, jnp.float32, Ky, has_P=False,
                               use_anderson=False)
    # SDP still routes to the XLA loop (batched eigh).
    Ky_sdp = ConeSet([ConeConstraint(Cone.SDP, [0, 1, 2])], 3)
    assert not fused_hsde_eligible(3, 2, jnp.float32, Ky_sdp, has_P=False,
                                   use_anderson=False)
