"""Differentiable solves (api/diff.py): implicit gradients vs analytic /
finite-difference oracles.

The reference has no autodiff capability; these tests pin a pogs_tpu-only
surface.  Gradient accuracy is bounded by solve accuracy, so solves here
run at tight tolerances in f64 (conftest enables x64) and finite-difference
checks use central differences with matched step sizes.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pogs_tpu.api.diff import (
    diff_elastic_net,
    diff_lasso,
    diff_logistic,
    diff_nonneg_ls,
    diff_qp,
    diff_ridge,
    make_diff_solver,
)
from pogs_tpu.types import Function, SolverSettings

TIGHT = SolverSettings(abs_tol=1e-9, rel_tol=1e-9, max_iter=40000)


def _problem(rng, m=24, n=12):
    A = jnp.asarray(rng.standard_normal((m, n)))
    x_true = rng.standard_normal(n)
    x_true[rng.random(n) < 0.5] = 0.0
    b = jnp.asarray(A @ x_true + 0.05 * rng.standard_normal(m))
    return A, b


def _ridge_closed_form(A, b, lam):
    n = A.shape[1]
    return jnp.linalg.solve(A.T @ A + lam * jnp.eye(n, dtype=A.dtype), A.T @ b)


# ---------------------------------------------------------------------------
# Ridge: analytic gradient oracle (closed form is itself autodiffable)
# ---------------------------------------------------------------------------

def test_ridge_solution_matches_closed_form(rng):
    A, b = _problem(rng)
    lam = 0.7
    x, aux = diff_ridge(A, b, lam, settings=TIGHT)
    x_cf = _ridge_closed_form(A, b, lam)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_cf), atol=1e-6)
    assert int(aux["status"]) == 0


def test_ridge_grad_lambda_vs_analytic(rng):
    A, b = _problem(rng)
    w = jnp.asarray(rng.standard_normal(A.shape[1]))

    def loss_implicit(lam):
        x, _ = diff_ridge(A, b, lam, settings=TIGHT)
        return jnp.dot(w, x)

    def loss_analytic(lam):
        return jnp.dot(w, _ridge_closed_form(A, b, lam))

    lam0 = 0.5
    g_imp = jax.grad(loss_implicit)(jnp.asarray(lam0, jnp.float64))
    g_ana = jax.grad(loss_analytic)(jnp.asarray(lam0, jnp.float64))
    np.testing.assert_allclose(float(g_imp), float(g_ana), rtol=1e-4)


def test_ridge_grad_b_and_A_vs_analytic(rng):
    A, b = _problem(rng, m=16, n=8)
    w = jnp.asarray(rng.standard_normal(A.shape[1]))
    lam = jnp.asarray(0.9, jnp.float64)

    def li(A_, b_):
        x, _ = diff_ridge(A_, b_, lam, settings=TIGHT)
        return jnp.dot(w, x)

    def la(A_, b_):
        return jnp.dot(w, _ridge_closed_form(A_, b_, lam))

    gA_i, gb_i = jax.grad(li, argnums=(0, 1))(A, b)
    gA_a, gb_a = jax.grad(la, argnums=(0, 1))(A, b)
    np.testing.assert_allclose(np.asarray(gb_i), np.asarray(gb_a), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gA_i), np.asarray(gA_a), atol=1e-4)


# ---------------------------------------------------------------------------
# Lasso: nonsmooth g — generalized-Jacobian implicit gradients vs FD
# ---------------------------------------------------------------------------

def test_lasso_grad_lambda_vs_finite_diff(rng):
    A, b = _problem(rng)
    lam0 = 0.4 * float(jnp.max(jnp.abs(A.T @ b)))
    x_ref = jnp.asarray(rng.standard_normal(A.shape[1]))

    def loss(lam):
        x, _ = diff_lasso(A, b, lam, settings=TIGHT)
        return 0.5 * jnp.sum((x - x_ref) ** 2)

    g = float(jax.grad(loss)(jnp.asarray(lam0, jnp.float64)))
    eps = 1e-5 * lam0
    fd = (float(loss(lam0 + eps)) - float(loss(lam0 - eps))) / (2 * eps)
    assert g == pytest.approx(fd, rel=2e-3, abs=1e-8)


def test_lasso_inactive_set_gets_zero_gradient(rng):
    """Soft-threshold dead zone: coordinates off the support must not move
    with b perturbations along themselves — dx_j/dlam uses the generalized
    Jacobian, so inactive coordinates have exactly-zero rows."""
    A, b = _problem(rng)
    lam = 0.8 * float(jnp.max(jnp.abs(A.T @ b)))  # heavy shrinkage
    x, _ = diff_lasso(A, b, lam, settings=TIGHT)
    inactive = np.abs(np.asarray(x)) < 1e-10
    assert inactive.any()  # the test needs a nontrivial dead zone

    J = jax.jacrev(
        lambda lam_: diff_lasso(A, b, lam_, settings=TIGHT)[0]
    )(jnp.asarray(lam, jnp.float64))
    np.testing.assert_allclose(np.asarray(J)[inactive], 0.0, atol=1e-12)


# ---------------------------------------------------------------------------
# Other families
# ---------------------------------------------------------------------------

def test_elastic_net_grads_vs_finite_diff(rng):
    A, b = _problem(rng)
    lam1 = 0.3 * float(jnp.max(jnp.abs(A.T @ b)))
    lam2 = 0.5

    def loss(l1, l2):
        x, _ = diff_elastic_net(A, b, l1, l2, settings=TIGHT)
        return jnp.sum(x ** 2)

    g1, g2 = jax.grad(loss, argnums=(0, 1))(
        jnp.asarray(lam1, jnp.float64), jnp.asarray(lam2, jnp.float64)
    )
    eps = 1e-5
    fd1 = (float(loss(lam1 + eps, lam2)) - float(loss(lam1 - eps, lam2))) / (2 * eps)
    fd2 = (float(loss(lam1, lam2 + eps)) - float(loss(lam1, lam2 - eps))) / (2 * eps)
    assert float(g1) == pytest.approx(fd1, rel=2e-3, abs=1e-8)
    assert float(g2) == pytest.approx(fd2, rel=2e-3, abs=1e-8)


def test_logistic_grad_b_effect_vs_finite_diff(rng):
    m, n = 20, 6
    A = jnp.asarray(rng.standard_normal((m, n)))
    labels = np.sign(rng.standard_normal(m))
    labels[labels == 0] = 1.0
    lam = 0.05

    def loss(A_):
        x, _ = diff_logistic(A_, labels, lam, settings=TIGHT)
        return jnp.sum(x ** 2)

    g = jax.grad(loss)(A)
    # FD along one random direction
    V = jnp.asarray(rng.standard_normal(A.shape))
    eps = 1e-6
    fd = (float(loss(A + eps * V)) - float(loss(A - eps * V))) / (2 * eps)
    assert float(jnp.vdot(g, V)) == pytest.approx(fd, rel=5e-3, abs=1e-8)


def test_nonneg_ls_active_constraints_grad(rng):
    """Indicator g (projection prox): gradients exist a.e. and clamped
    coordinates have zero sensitivity."""
    A, b = _problem(rng)

    def loss(b_):
        x, _ = diff_nonneg_ls(A, b_, settings=TIGHT)
        return jnp.sum(x)

    g = jax.grad(loss)(b)
    V = jnp.asarray(rng.standard_normal(b.shape))
    eps = 1e-6
    fd = (float(loss(b + eps * V)) - float(loss(b - eps * V))) / (2 * eps)
    assert float(jnp.vdot(g, V)) == pytest.approx(fd, rel=5e-3, abs=1e-8)


# ---------------------------------------------------------------------------
# diff_qp: OptNet-style QP layer
# ---------------------------------------------------------------------------

def _rand_spd(rng, n, cond=10.0):
    Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    lams = np.geomspace(1.0, cond, n)
    return jnp.asarray(Q @ np.diag(lams) @ Q.T)


def _eq_qp_closed_form(P, q, A, b):
    """KKT solve for min 1/2 x'Px + q'x  s.t. Ax = b (autodiffable oracle)."""
    n, p = P.shape[0], A.shape[0]
    K = jnp.block([[P, A.T], [A, jnp.zeros((p, p), P.dtype)]])
    rhs = jnp.concatenate([-q, b])
    return jnp.linalg.solve(K, rhs)[:n]


def test_diff_qp_equality_matches_kkt(rng):
    n, p = 8, 3
    P = _rand_spd(rng, n)
    q = jnp.asarray(rng.standard_normal(n))
    A = jnp.asarray(rng.standard_normal((p, n)))
    b = jnp.asarray(rng.standard_normal(p))
    x, aux = diff_qp(P, q, A=A, b=b, settings=TIGHT)
    x_cf = _eq_qp_closed_form(P, q, A, b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_cf), atol=1e-6)
    assert int(aux["status"]) == 0


def test_diff_qp_grads_vs_analytic_equality(rng):
    n, p = 6, 2
    P = _rand_spd(rng, n)
    A = jnp.asarray(rng.standard_normal((p, n)))
    b = jnp.asarray(rng.standard_normal(p))
    w = jnp.asarray(rng.standard_normal(n))

    def li(q_, b_):
        x, _ = diff_qp(P, q_, A=A, b=b_, settings=TIGHT)
        return jnp.dot(w, x)

    def la(q_, b_):
        return jnp.dot(w, _eq_qp_closed_form(P, q_, A, b_))

    q0 = jnp.asarray(rng.standard_normal(n))
    gq_i, gb_i = jax.grad(li, argnums=(0, 1))(q0, b)
    gq_a, gb_a = jax.grad(la, argnums=(0, 1))(q0, b)
    np.testing.assert_allclose(np.asarray(gq_i), np.asarray(gq_a), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb_i), np.asarray(gb_a), atol=1e-5)


def test_diff_qp_inequality_solution_and_grad(rng):
    """Box-active QP: active rows behave as equalities locally, inactive
    rows have zero sensitivity; check both via finite differences on h."""
    n, mi = 7, 10
    P = _rand_spd(rng, n)
    q = jnp.asarray(rng.standard_normal(n))
    G = jnp.asarray(rng.standard_normal((mi, n)))
    x_uncon = jnp.linalg.solve(P, -q)
    # Make about half the constraints active at the unconstrained optimum.
    slack = np.where(rng.random(mi) < 0.5, -0.1, 0.5)
    h = G @ x_uncon + jnp.asarray(slack)

    # Oracle via scipy SLSQP at tight tolerance.
    from scipy.optimize import minimize
    Pn, qn, Gn, hn = map(np.asarray, (P, q, G, h))
    res = minimize(
        lambda x: 0.5 * x @ Pn @ x + qn @ x,
        np.zeros(n),
        jac=lambda x: Pn @ x + qn,
        constraints=[{"type": "ineq", "fun": lambda x: hn - Gn @ x,
                      "jac": lambda x: -Gn}],
        method="SLSQP", options={"maxiter": 400, "ftol": 1e-14},
    )
    x, aux = diff_qp(P, q, G=G, h=h, settings=TIGHT)
    np.testing.assert_allclose(np.asarray(x), res.x, atol=2e-5)

    def loss(h_):
        x_, _ = diff_qp(P, q, G=G, h=h_, settings=TIGHT)
        return jnp.sum(x_ ** 2)

    g = jax.grad(loss)(h)
    V = jnp.asarray(rng.standard_normal(mi))
    eps = 1e-6
    fd = (float(loss(h + eps * V)) - float(loss(h - eps * V))) / (2 * eps)
    assert float(jnp.vdot(g, V)) == pytest.approx(fd, rel=5e-3, abs=1e-7)


def test_diff_qp_grad_P_vs_finite_diff(rng):
    """Gradient through the quadratic term itself (flows through the
    Cholesky factor of P into the stacked operator rows)."""
    n = 5
    P0 = _rand_spd(rng, n)
    q = jnp.asarray(rng.standard_normal(n))
    A = jnp.asarray(rng.standard_normal((2, n)))
    b = jnp.asarray(rng.standard_normal(2))
    V = rng.standard_normal((n, n))
    V = jnp.asarray((V + V.T) / 2)  # keep P symmetric along the FD path

    def loss(P_):
        x, _ = diff_qp(P_, q, A=A, b=b, settings=TIGHT)
        return jnp.sum(x ** 2)

    def loss_a(P_):
        return jnp.sum(_eq_qp_closed_form(P_, q, A, b) ** 2)

    g = jax.grad(loss)(P0)
    g_a = jax.grad(loss_a)(P0)
    # Directional agreement with the analytic KKT oracle.
    assert float(jnp.vdot(g, V)) == pytest.approx(
        float(jnp.vdot(g_a, V)), rel=1e-3, abs=1e-8
    )


def test_diff_qp_vmap_batch(rng):
    """A batch of QPs differing in q is one vmap — the convex-layer use."""
    n, p, B = 6, 2, 4
    P = _rand_spd(rng, n)
    A = jnp.asarray(rng.standard_normal((p, n)))
    b = jnp.asarray(rng.standard_normal(p))
    qs = jnp.asarray(rng.standard_normal((B, n)))

    xs = jax.vmap(lambda q_: diff_qp(P, q_, A=A, b=b, settings=TIGHT)[0])(qs)
    for i in range(B):
        np.testing.assert_allclose(
            np.asarray(xs[i]),
            np.asarray(_eq_qp_closed_form(P, qs[i], A, b)),
            atol=1e-6,
        )


# ---------------------------------------------------------------------------
# Composition: jit, vmap, gmres path
# ---------------------------------------------------------------------------

def test_jit_vmap_grad_over_lambda_batch(rng):
    A, b = _problem(rng, m=16, n=8)
    lams = jnp.asarray([0.1, 0.5, 1.0, 2.0], jnp.float64)

    @jax.jit
    @jax.vmap
    def batch_grad(lam):
        def loss(l):
            x, _ = diff_ridge(A, b, l, settings=TIGHT)
            return jnp.sum(x ** 2)
        return jax.grad(loss)(lam)

    g_batch = batch_grad(lams)

    def loss_a(l):
        return jnp.sum(_ridge_closed_form(A, b, l) ** 2)

    g_ana = jnp.stack([jax.grad(loss_a)(l) for l in lams])
    np.testing.assert_allclose(np.asarray(g_batch), np.asarray(g_ana), rtol=1e-4)


def test_gmres_linear_solver_matches_dense(rng):
    A, b = _problem(rng, m=14, n=7)
    lam = 0.6

    def loss(kind):
        def f(l):
            x, _ = diff_ridge(A, b, l, settings=TIGHT, linear_solver=kind)
            return jnp.sum(x ** 2)
        return jax.grad(f)(jnp.asarray(lam, jnp.float64))

    np.testing.assert_allclose(
        float(loss("gmres")), float(loss("dense")), rtol=1e-6
    )


def test_make_diff_solver_custom_objective(rng):
    """Direct factory use with huber f (smooth, non-quadratic)."""
    m, n = 18, 9
    A = jnp.asarray(rng.standard_normal((m, n)))
    b = jnp.asarray(rng.standard_normal(m))
    fn = make_diff_solver(
        np.full(m, Function.HUBER, np.int32),
        np.full(n, Function.SQUARE, np.int32),
        settings=TIGHT,
    )
    dt = A.dtype
    ones_m = jnp.ones(m, dt)
    zer_m = jnp.zeros(m, dt)
    ones_n = jnp.ones(n, dt)
    zer_n = jnp.zeros(n, dt)

    def loss(lam):
        fp = (ones_m, b, ones_m, zer_m, zer_m)
        gp = (ones_n, zer_n, lam * ones_n, zer_n, zer_n)
        x, _ = fn(A, fp, gp)
        return jnp.sum(x ** 2)

    lam0 = 0.5
    g = float(jax.grad(loss)(jnp.asarray(lam0, jnp.float64)))
    eps = 1e-5
    fd = (float(loss(jnp.asarray(lam0 + eps))) - float(loss(jnp.asarray(lam0 - eps)))) / (2 * eps)
    assert g == pytest.approx(fd, rel=2e-3, abs=1e-8)
