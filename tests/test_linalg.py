"""Equilibration, norm estimation, CGLS, and projector unit tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from pogs_tpu.linalg.equil import equilibrate
from pogs_tpu.linalg.norm import norm2_est
from pogs_tpu.linalg.cgls import cgls_solve
from pogs_tpu.projector.direct import DirectProjector
from pogs_tpu.projector.indirect import CglsProjector


def _random_matrix(rng, m, n, scale_rows=True):
    A = rng.normal(size=(m, n))
    if scale_rows:
        # Badly scaled rows/cols to give equilibration something to do.
        A *= np.exp(rng.uniform(-3, 3, size=(m, 1)))
        A *= np.exp(rng.uniform(-3, 3, size=(1, n)))
    return A


def test_equilibrate_consistency(rng):
    A = jnp.asarray(_random_matrix(rng, 40, 25), jnp.float64)
    eq = equilibrate(A)
    # A_eq must equal d * A * e exactly (the scalings fold in normalization).
    np.testing.assert_allclose(
        np.asarray(eq.A),
        np.asarray(A) * np.asarray(eq.d)[:, None] * np.asarray(eq.e)[None, :],
        rtol=1e-10,
    )
    # Frobenius normalization: ||A_eq||_F = sqrt(min(m, n)).
    np.testing.assert_allclose(float(jnp.linalg.norm(eq.A)), np.sqrt(25), rtol=1e-10)


def test_equilibrate_balances_norms(rng):
    A = jnp.asarray(_random_matrix(rng, 60, 40), jnp.float64)
    eq = equilibrate(A)
    rn = np.linalg.norm(np.asarray(eq.A), axis=1)
    cn = np.linalg.norm(np.asarray(eq.A), axis=0)
    # Row and column norms should be much more uniform than the input's.
    assert rn.max() / rn.min() < 4.0
    assert cn.max() / cn.min() < 4.0


def test_norm2_est(rng):
    A = jnp.asarray(rng.normal(size=(50, 30)), jnp.float64)
    est = float(norm2_est(A))
    true = np.linalg.norm(np.asarray(A), 2)
    assert abs(est - true) / true < 1e-3


def test_cgls_matches_direct(rng):
    m, n = 40, 25
    A = jnp.asarray(rng.normal(size=(m, n)), jnp.float64)
    b = jnp.asarray(rng.normal(size=m), jnp.float64)
    shift = 0.7
    x, k = cgls_solve(
        lambda v: A @ v, lambda v: A.T @ v, b, jnp.zeros(n, jnp.float64),
        shift, 1e-12, 200,
    )
    ref = np.linalg.solve(np.asarray(A.T @ A) + shift * np.eye(n), np.asarray(A.T @ b))
    np.testing.assert_allclose(np.asarray(x), ref, rtol=1e-8)
    assert int(k) < 200


def _check_projection(A, x, y, x0, y0, s=1.0, tol=1e-8):
    A, x, y, x0, y0 = map(np.asarray, (A, x, y, x0, y0))
    # Feasibility y = Ax and stationarity A'(Ax - y0) + s (x - x0) = 0.
    np.testing.assert_allclose(y, A @ x, atol=tol)
    kkt = A.T @ (A @ x - y0) + s * (x - x0)
    np.testing.assert_allclose(kkt, 0.0, atol=tol)


def test_direct_projector_tall(rng):
    m, n = 40, 25
    A = jnp.asarray(rng.normal(size=(m, n)) / np.sqrt(m), jnp.float64)
    for method in ("inverse", "cholesky"):
        proj = DirectProjector(method=method)
        factor = proj.init(A, s=1.0)
        x0 = jnp.asarray(rng.normal(size=n), jnp.float64)
        y0 = jnp.asarray(rng.normal(size=m), jnp.float64)
        x, y = proj.project(A, factor, x0, y0)
        _check_projection(A, x, y, x0, y0)


def test_direct_projector_wide(rng):
    m, n = 25, 40
    A = jnp.asarray(rng.normal(size=(m, n)) / np.sqrt(n), jnp.float64)
    for method in ("inverse", "cholesky"):
        proj = DirectProjector(method=method)
        factor = proj.init(A, s=1.0)
        x0 = jnp.asarray(rng.normal(size=n), jnp.float64)
        y0 = jnp.asarray(rng.normal(size=m), jnp.float64)
        x, y = proj.project(A, factor, x0, y0)
        _check_projection(A, x, y, x0, y0)


def test_cgls_projector(rng):
    m, n = 40, 25
    A = jnp.asarray(rng.normal(size=(m, n)) / np.sqrt(m), jnp.float64)
    proj = CglsProjector()
    factor = proj.init(A, s=1.0)
    x0 = jnp.asarray(rng.normal(size=n), jnp.float64)
    y0 = jnp.asarray(rng.normal(size=m), jnp.float64)
    x, y = proj.project(A, factor, x0, y0, tol=1e-12, x_warm=x0)
    _check_projection(A, x, y, x0, y0, tol=1e-6)


def test_blocked_gram_matches_dense(monkeypatch, rng):
    """The XL row-blocked Gram accumulation (OOM fix for 40000x10000)
    must agree with the one-shot matmul, tall and wide."""
    from pogs_tpu.projector import direct as dmod

    monkeypatch.setattr(dmod, "_GRAM_BLOCK_ELEMS", 64)
    monkeypatch.setattr(dmod, "_GRAM_BLOCK_ROWS", 7)  # non-divisible tail
    A_tall = jnp.asarray(rng.normal(size=(37, 5)))
    A_wide = jnp.asarray(rng.normal(size=(5, 37)))
    np.testing.assert_allclose(
        np.asarray(dmod._gram(A_tall, trans=True)),
        np.asarray(A_tall.T @ A_tall), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(dmod._gram(A_wide, trans=False)),
        np.asarray(A_wide @ A_wide.T), rtol=1e-10)


def test_blocked_gram_end_to_end_solve(monkeypatch, rng):
    """A solve that routes init through the blocked Gram stays correct."""
    from pogs_tpu.projector import direct as dmod

    monkeypatch.setattr(dmod, "_GRAM_BLOCK_ELEMS", 64)
    from pogs_tpu.api.graph import solve_lasso

    A = rng.normal(size=(40, 12))
    b = rng.normal(size=40)
    lam = 0.3 * np.max(np.abs(A.T @ b))
    r = solve_lasso(A, b, lam, dtype=np.float64, gap_stop=False,
                    abs_tol=1e-6, rel_tol=1e-6)
    assert r["status"] == 0
    x = np.asarray(r["x"])
    g = A.T @ (A @ x - b)
    on = x != 0
    assert np.all(np.abs(g[~on]) <= lam * (1 + 1e-3))
    np.testing.assert_allclose(g[on], -lam * np.sign(x[on]), atol=1e-4 * lam)


def test_equilibration_zero_rows_do_not_distort_scaling():
    """Round-4 regression: zero rows (mesh padding, presolve-emptied
    constraints) used to shift every column scaling by m/(m_eff) and the
    Sinkhorn regularizers with it, collapsing the HSDE DR rate ~36x on a
    10%-padded LP.  Effective-count Sinkhorn must (a) give zero rows
    scale ~1 and (b) leave the REAL rows' scalings (nearly) identical to
    the unpadded equilibration."""
    import numpy as np
    import jax.numpy as jnp
    from pogs_tpu.linalg.equil import equilibrate

    rng = np.random.default_rng(4)
    A = rng.standard_normal((20, 8))
    A_pad = np.vstack([A, np.zeros((4, 8))])
    eq = equilibrate(jnp.asarray(A))
    eq_pad = equilibrate(jnp.asarray(A_pad))
    d_pad = np.asarray(eq_pad.d)
    # The final Frobenius normalization folds a UNIFORM factor into d and
    # e; what must match is the relative structure.  Zero rows sit at the
    # neutral scale (the bare fold factor), and the real rows'/cols'
    # scalings agree with the unpadded equilibration up to that uniform
    # factor.
    assert d_pad[20:] == pytest.approx(np.full(4, d_pad[20]), rel=1e-9)
    ratio_d = d_pad[:20] / np.asarray(eq.d)
    assert ratio_d == pytest.approx(np.full(20, ratio_d[0]), rel=1e-5)
    ratio_e = np.asarray(eq_pad.e) / np.asarray(eq.e)
    assert ratio_e == pytest.approx(np.full(8, ratio_e[0]), rel=1e-5)


def test_sinkhorn_unchanged_without_zero_rows():
    """The effective-count rewrite must be a no-op on full-rank data:
    row/col products of the equilibrated B stay near-uniform."""
    import numpy as np
    import jax.numpy as jnp
    from pogs_tpu.linalg.equil import sinkhorn_knopp

    rng = np.random.default_rng(11)
    A = rng.standard_normal((30, 12))
    B = jnp.asarray(A * A)
    d, e = sinkhorn_knopp(B)
    scaled = np.asarray(d)[:, None] * np.asarray(A * A) * np.asarray(e)
    rows = scaled.sum(axis=1)
    assert rows.max() / rows.min() < 1.3
