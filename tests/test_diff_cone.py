"""Differentiable cone solves (api/diff_cone.py): implicit gradients for
LP/SOCP/SDP vs finite-difference and structural oracles.

Like api/diff.py, gradient accuracy is bounded by solve accuracy —
solves run tight (1e-9/1e-10) in f64 (conftest enables x64).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pogs_tpu.api.diff_cone import diff_cone_solve, make_diff_cone_solver
from pogs_tpu.types import Cone, ConeConstraint, SolverSettings

TIGHT = SolverSettings(abs_tol=1e-10, rel_tol=1e-10, max_iter=40000)


def _lp(rng, m=18, n=8):
    """Bounded-feasible random inequality LP: min c'x s.t. Ax <= b."""
    A = rng.standard_normal((m, n))
    x0 = rng.standard_normal(n)
    b = A @ x0 + rng.random(m) + 0.1     # x0 strictly feasible
    c = rng.standard_normal(n)
    # bound the feasible set: append box rows so the LP has a vertex optimum
    A = np.vstack([A, np.eye(n), -np.eye(n)])
    b = np.concatenate([b, np.full(n, 5.0), np.full(n, 5.0)])
    return jnp.asarray(A), jnp.asarray(b), jnp.asarray(c)


def test_lp_solution_matches_linprog(rng):
    from scipy.optimize import linprog

    A, b, c = _lp(rng)
    Ky = [ConeConstraint(Cone.NON_NEG, range(A.shape[0]))]
    x, aux = diff_cone_solve(A, b, c, Ky, settings=TIGHT)
    assert int(aux["status"]) == 0
    ref = linprog(np.asarray(c), A_ub=np.asarray(A), b_ub=np.asarray(b),
                  bounds=(None, None), method="highs")
    assert ref.status == 0
    assert float(aux["optval"]) == pytest.approx(ref.fun, rel=1e-7, abs=1e-8)
    np.testing.assert_allclose(np.asarray(x), ref.x, atol=1e-6)


def test_lp_grad_b_vs_finite_diff(rng):
    A, b, c = _lp(rng)
    Ky = [ConeConstraint(Cone.NON_NEG, range(A.shape[0]))]
    w = jnp.asarray(rng.standard_normal(A.shape[1]))

    def loss(b_):
        x, _ = diff_cone_solve(A, b_, c, Ky, settings=TIGHT)
        return jnp.dot(w, x)

    g = jax.grad(loss)(b)
    V = jnp.asarray(rng.standard_normal(b.shape))
    eps = 1e-6
    fd = (float(loss(b + eps * V)) - float(loss(b - eps * V))) / (2 * eps)
    assert float(jnp.vdot(g, V)) == pytest.approx(fd, rel=5e-4, abs=1e-9)


def test_lp_grad_c_is_zero_at_nondegenerate_vertex(rng):
    """x*(c) is locally constant at a nondegenerate vertex, so dx/dc = 0 —
    the generalized Jacobian must produce exact zeros, not noise."""
    A, b, c = _lp(rng)
    Ky = [ConeConstraint(Cone.NON_NEG, range(A.shape[0]))]
    w = jnp.asarray(rng.standard_normal(A.shape[1]))

    def loss(c_):
        x, _ = diff_cone_solve(A, b, c_, Ky, settings=TIGHT)
        return jnp.dot(w, x)

    g = jax.grad(loss)(c)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)


def test_lp_grad_A_vs_finite_diff(rng):
    A, b, c = _lp(rng, m=12, n=5)
    Ky = [ConeConstraint(Cone.NON_NEG, range(A.shape[0]))]

    def loss(A_):
        x, _ = diff_cone_solve(A_, b, c, Ky, settings=TIGHT)
        return jnp.sum(x ** 2)

    g = jax.grad(loss)(A)
    V = jnp.asarray(rng.standard_normal(A.shape))
    eps = 1e-6
    fd = (float(loss(A + eps * V)) - float(loss(A - eps * V))) / (2 * eps)
    assert float(jnp.vdot(g, V)) == pytest.approx(fd, rel=1e-3, abs=1e-8)


# ---------------------------------------------------------------------------
# SOCP
# ---------------------------------------------------------------------------

def _socp(rng, n=6):
    """min c'x  s.t.  ||F x - g|| <= d'x - e  as one SOC row block:
    b - A x in SOC(m+1) with A = [-d'; F], b = [-e; g]."""
    F = rng.standard_normal((n + 2, n))
    g = rng.standard_normal(n + 2)
    d = rng.standard_normal(n)
    # ensure strict feasibility at x0
    x0 = rng.standard_normal(n)
    e = float(d @ x0 - np.linalg.norm(F @ x0 - g) - 1.0)
    c = rng.standard_normal(n)
    A = np.vstack([-d[None, :], F])
    b = np.concatenate([[-e], g])
    # keep the problem bounded: box rows
    A_full = np.vstack([np.eye(n), -np.eye(n), A])
    b_full = np.concatenate([np.full(n, 4.0), np.full(n, 4.0), b])
    Ky = [ConeConstraint(Cone.NON_NEG, range(2 * n)),
          ConeConstraint(Cone.SOC, range(2 * n, 2 * n + n + 3))]
    return (jnp.asarray(A_full), jnp.asarray(b_full), jnp.asarray(c), Ky)


def test_socp_grads_vs_finite_diff(rng):
    A, b, c, Ky = _socp(rng)
    x, aux = diff_cone_solve(A, b, c, Ky, settings=TIGHT)
    assert int(aux["status"]) == 0

    def loss(b_, c_):
        x_, _ = diff_cone_solve(A, b_, c_, Ky, settings=TIGHT)
        return jnp.sum(x_ ** 2)

    gb, gc = jax.grad(loss, argnums=(0, 1))(b, c)
    Vb = jnp.asarray(rng.standard_normal(b.shape))
    Vc = jnp.asarray(rng.standard_normal(c.shape))
    eps = 1e-6
    fd_b = (float(loss(b + eps * Vb, c)) - float(loss(b - eps * Vb, c))) / (2 * eps)
    fd_c = (float(loss(b, c + eps * Vc)) - float(loss(b, c - eps * Vc))) / (2 * eps)
    assert float(jnp.vdot(gb, Vb)) == pytest.approx(fd_b, rel=2e-3, abs=1e-8)
    assert float(jnp.vdot(gc, Vc)) == pytest.approx(fd_c, rel=2e-3, abs=1e-8)


# ---------------------------------------------------------------------------
# SDP
# ---------------------------------------------------------------------------

def _svec(M):
    """Upper-triangle svec with sqrt(2) off-diagonals (ConeSolver basis)."""
    k = M.shape[0]
    out = []
    for i in range(k):
        for j in range(i, k):
            out.append(M[i, j] * (1.0 if i == j else np.sqrt(2.0)))
    return np.asarray(out)


def test_sdp_grad_b_vs_finite_diff(rng):
    """min <C,X> over a line segment of PSD matrices:
    x in R^2, X(x) = B0 + x0 B1 + x1 B2 must be PSD, plus box rows on x.

    Cone form: b - A x in SDP with svec rows; b = svec(B0),
    A columns = -svec(Bi)."""
    k = 3
    def rnd_sym():
        M = rng.standard_normal((k, k))
        return (M + M.T) / 2

    B0 = np.eye(k) * 2.0
    B1, B2 = rnd_sym(), rnd_sym()
    C = rnd_sym()
    c = np.array([np.trace(C @ B1), np.trace(C @ B2)])
    nsvec = k * (k + 1) // 2
    A_sdp = np.column_stack([-_svec(B1), -_svec(B2)])
    b_sdp = _svec(B0)
    A = np.vstack([np.eye(2), -np.eye(2), A_sdp])
    b = np.concatenate([np.full(2, 3.0), np.full(2, 3.0), b_sdp])
    Ky = [ConeConstraint(Cone.NON_NEG, range(4)),
          ConeConstraint(Cone.SDP, range(4, 4 + nsvec))]

    A, b, c = jnp.asarray(A), jnp.asarray(b), jnp.asarray(c)
    x, aux = diff_cone_solve(A, b, c, Ky, settings=TIGHT)
    assert int(aux["status"]) == 0
    # the PSD constraint must be active at the optimum for the gradient
    # test to exercise the SDP projection Jacobian
    X = np.asarray(B0 + x[0] * B1 + x[1] * B2, np.float64)
    assert np.linalg.eigvalsh(X).min() < 1e-6

    def loss(b_):
        x_, _ = diff_cone_solve(A, b_, c, Ky, settings=TIGHT)
        return jnp.sum(x_ ** 2)

    g = jax.grad(loss)(b)
    V = jnp.asarray(rng.standard_normal(b.shape))
    eps = 1e-6
    fd = (float(loss(b + eps * V)) - float(loss(b - eps * V))) / (2 * eps)
    assert float(jnp.vdot(g, V)) == pytest.approx(fd, rel=2e-3, abs=1e-8)


# ---------------------------------------------------------------------------
# composition + gating
# ---------------------------------------------------------------------------

def test_jit_vmap_over_b_batch(rng):
    A, b, c = _lp(rng, m=10, n=4)
    Ky = [ConeConstraint(Cone.NON_NEG, range(A.shape[0]))]
    fn = make_diff_cone_solver(Ky, A.shape[0], A.shape[1], settings=TIGHT)
    bs = jnp.stack([b, b + 0.05, b + 0.1])

    @jax.jit
    @jax.vmap
    def solve_b(b_):
        return fn(A, b_, c)[0]

    xs = solve_b(bs)
    for i in range(3):
        x_i, _ = diff_cone_solve(A, bs[i], c, Ky, settings=TIGHT)
        np.testing.assert_allclose(np.asarray(xs[i]), np.asarray(x_i),
                                   atol=1e-7)


# ---------------------------------------------------------------------------
# Exponential cone: implicit-JVP projection rule
# ---------------------------------------------------------------------------

def _exp_proj_points():
    """One representative v per Jacobian case of the exp projection."""
    return {
        "interior": jnp.asarray([0.1, 1.0, 4.0]),          # s e^{r/s} < t
        "polar": jnp.asarray([0.5, -2.0, -1.0]),           # proj = 0
        "ray": jnp.asarray([-2.0, -0.5, 1.5]),             # face (r<0, t>0)
        "generic": jnp.asarray([1.0, 1.0, 1.0]),           # smooth boundary
    }


@pytest.mark.parametrize("case", ["interior", "polar", "ray", "generic"])
def test_exp_projection_jacfwd_vs_finite_diff(rng, case):
    from pogs_tpu.cones.projections import project_exp_primal

    v = _exp_proj_points()[case][None, :]  # (1, 3) batch
    J = jax.jacfwd(lambda v_: project_exp_primal(v_))(v)[0, :, 0, :]
    eps = 1e-6
    for k in range(3):
        dv = np.zeros(3)
        dv[k] = eps
        fd = (project_exp_primal(v + dv[None]) -
              project_exp_primal(v - dv[None]))[0] / (2 * eps)
        np.testing.assert_allclose(np.asarray(J[:, k]), np.asarray(fd),
                                   atol=5e-5, err_msg=f"{case} col {k}")


def test_exp_projection_jacrev_matches_jacfwd():
    """The custom JVP must transpose (reverse mode is what diff_cone's
    gmres path uses)."""
    from pogs_tpu.cones.projections import project_exp_primal

    v = jnp.stack(list(_exp_proj_points().values()))
    Jf = jax.jacfwd(lambda v_: project_exp_primal(v_))(v)
    Jr = jax.jacrev(lambda v_: project_exp_primal(v_))(v)
    np.testing.assert_allclose(np.asarray(Jf), np.asarray(Jr), atol=1e-12)


def test_exp_dual_projection_grad_consistent():
    from pogs_tpu.cones.projections import project_exp_dual

    v = jnp.asarray([[0.3, -0.8, 1.7]])
    J = jax.jacfwd(lambda v_: project_exp_dual(v_))(v)[0, :, 0, :]
    eps = 1e-6
    for k in range(3):
        dv = np.zeros(3)
        dv[k] = eps
        fd = (project_exp_dual(v + dv[None]) -
              project_exp_dual(v - dv[None]))[0] / (2 * eps)
        np.testing.assert_allclose(np.asarray(J[:, k]), np.asarray(fd),
                                   atol=5e-5)


def test_exp_cone_solve_grad_vs_finite_diff(rng):
    """Entropy-style problem: min c'x s.t. exp-cone rows + box, grad in b.

    Constraint (u, 1, w) in K_exp with u = x0, w = x1 encoded as
    b - Ax rows: rows (0: -x0 + b0 ... ) — build A, b so that
    b - Ax = (x0, 1, x1) requires b = (0, 1, 0), A rows = (-e0; 0; -e1).
    Then x1 >= e^{x0} must hold; minimize x1 - x0 => active boundary."""
    n = 2
    A_exp = np.array([[-1.0, 0.0], [0.0, 0.0], [0.0, -1.0]])
    b_exp = np.array([0.0, 1.0, 0.0])
    A = np.vstack([np.eye(n), -np.eye(n), A_exp])
    b = np.concatenate([np.full(n, 3.0), np.full(n, 3.0), b_exp])
    c = np.array([-1.0, 1.0])  # min x1 - x0 -> pushes onto x1 = e^{x0}
    Ky = [ConeConstraint(Cone.NON_NEG, range(2 * n)),
          ConeConstraint(Cone.EXP_PRIMAL, range(2 * n, 2 * n + 3))]
    A, b, c = jnp.asarray(A), jnp.asarray(b), jnp.asarray(c)
    st = SolverSettings(abs_tol=1e-9, rel_tol=1e-9, max_iter=40000)
    x, aux = diff_cone_solve(A, b, c, Ky, settings=st)
    assert int(aux["status"]) == 0
    # optimum of x1 - x0 on x1 = e^{x0} is at x0 = 0, x1 = 1
    np.testing.assert_allclose(np.asarray(x), [0.0, 1.0], atol=1e-5)

    def loss(b_):
        x_, _ = diff_cone_solve(A, b_, c, Ky, settings=st)
        return jnp.sum(x_ ** 2)

    g = jax.grad(loss)(b)
    V = jnp.asarray(rng.standard_normal(b.shape))
    eps = 1e-6
    fd = (float(loss(b + eps * V)) - float(loss(b - eps * V))) / (2 * eps)
    assert float(jnp.vdot(g, V)) == pytest.approx(fd, rel=5e-3, abs=1e-7)


def test_gmres_matches_dense(rng):
    A, b, c = _lp(rng, m=10, n=4)
    Ky = [ConeConstraint(Cone.NON_NEG, range(A.shape[0]))]
    w = jnp.asarray(rng.standard_normal(A.shape[1]))

    def g(kind):
        def loss(b_):
            x, _ = diff_cone_solve(A, b_, c, Ky, settings=TIGHT,
                                   linear_solver=kind)
            return jnp.dot(w, x)
        return jax.grad(loss)(b)

    np.testing.assert_allclose(np.asarray(g("gmres")), np.asarray(g("dense")),
                               atol=1e-7)
