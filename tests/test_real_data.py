"""Real-data & regression tiers (fast subset of
benchmarks/real_data_benchmark.py; VERDICT round-1 item 5).

- every vendored Maros–Mészáros QP against its PUBLISHED optimum AND an
  independent scipy-SLSQP solve of the same data (so a transcription
  error in the vendored data cannot hide);
- one real-dataset problem (diabetes lasso) scored against sklearn's
  coordinate-descent solver by canonical objective;
- the structured-regression expected-optima file stays consistent.
"""

import json
import os

import numpy as np
import pytest

from benchmarks import maros_meszaros as mm

pytest.importorskip("scipy.optimize")


@pytest.mark.parametrize("prob", mm.problems(), ids=lambda p: p["name"])
def test_maros_meszaros_published_optimum(prob):
    slsqp = mm.solve_with_slsqp(prob)
    # Vendored data sanity: independent solver reproduces the published value.
    assert slsqp == pytest.approx(prob["optval"], rel=1e-6, abs=1e-6)
    r = mm.solve_with_pogs_tpu(prob)
    assert r["status"] == 0
    assert r["objective"] == pytest.approx(prob["optval"], rel=1e-4, abs=1e-4)


def test_diabetes_lasso_vs_sklearn():
    sklearn_ds = pytest.importorskip("sklearn.datasets")
    import sklearn.linear_model as lm

    from pogs_tpu.api.graph import solve_lasso

    db = sklearn_ds.load_diabetes()
    X = ((db.data - db.data.mean(0)) / db.data.std(0)).astype(np.float64)
    y = ((db.target - db.target.mean()) / db.target.std()).astype(np.float64)
    m = X.shape[0]
    lam = 0.1 * np.max(np.abs(X.T @ y))
    r = solve_lasso(X, y, lam, abs_tol=1e-6, rel_tol=1e-6, dtype=np.float64,
                    gap_stop=False)
    assert r["status"] == 0
    mdl = lm.Lasso(alpha=lam / m, fit_intercept=False, tol=1e-8).fit(X, y)

    def obj(x):
        res = X @ x - y
        return 0.5 * res @ res + lam * np.abs(x).sum()

    gap = obj(np.asarray(r["x"])) - obj(np.ravel(mdl.coef_))
    assert abs(gap) <= 1e-3 * max(abs(obj(np.ravel(mdl.coef_))), 1.0)


def test_regression_expected_file_in_sync():
    """The stored expected-optima file must exist and cover the suite."""
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks", "regression_expected.json")
    assert os.path.exists(path), "run real_data_benchmark.py --record"
    with open(path) as fh:
        expected = json.load(fh)
    assert set(expected) == {"tv_denoising", "mpc_qp", "portfolio"}
    assert all(np.isfinite(v) for v in expected.values())


# ---------------------------------------------------------------------------
# Mid-size Maros–Mészáros-class suite (VERDICT round-2 item 5): CVXQP
# recipe problems (cond(Q) ~ 7e18), a degenerate duplicated-row variant,
# an AUG2D-style grid QP with rank-deficient equality constraints and an
# exact closed-form oracle, and a DUAL-style dense simplex QP (cond 1e6).
# Every solve is certified by mm.kkt_certificate — a dual estimate built
# from x alone, so optimality is proven independent of the solver.
# ---------------------------------------------------------------------------

_MIDSIZE = mm.midsize_problems(include_m_size=False)


@pytest.mark.parametrize("prob", _MIDSIZE, ids=lambda p: p["name"])
def test_midsize_qp_certified(prob):
    r = mm.solve_with_pogs_tpu(prob, max_iter=1500)
    assert r["status"] == 0, r["status"]
    cert = mm.kkt_certificate(prob, r["x"])
    assert max(cert.values()) <= 1e-6, cert
    optval = prob["optval"]
    if not np.isfinite(optval):
        optval = mm.solve_with_slsqp(prob)
    assert r["objective"] == pytest.approx(optval, rel=1e-6, abs=1e-6)


def test_cvxqp_recipe_matches_published_via_slsqp():
    """The generated CVXQP1_S data reproduces the collection's published
    optimum through an independent SLSQP solve — proving the vendored
    generator IS the Maros–Mészáros problem, not merely 'inspired by'."""
    prob = mm.cvxqp_problem(1, 100, 1.1590718e4)
    slsqp = mm.solve_with_slsqp(prob)
    assert slsqp == pytest.approx(1.1590718e4, rel=1e-7)


def test_aug2d_constraints_are_rank_deficient():
    """The degeneracy stressor must actually be degenerate."""
    prob = mm.aug2d_style(8, 8)
    rank = np.linalg.matrix_rank(prob["A"])
    assert rank == prob["A"].shape[0] - 1


def test_cvxqp_f32_seed_polished_to_f64_accuracy():
    """A float32 device solve seeds the host-side f64 PDAS polish well
    enough to certify the QP optimum — f64 accuracy at f32 device speed
    (the polish runs in float64 regardless of the solve dtype)."""
    prob = mm.cvxqp_problem(1, 100, 1.1590718e4)
    r = mm.solve_with_pogs_tpu(prob, max_iter=1500, abs_tol=1e-5,
                               rel_tol=1e-5, dtype=np.float32)
    assert r["status"] == 0
    assert abs(r["objective"] - 1.1590718e4) / 1.1590718e4 <= 1e-5
    cert = mm.kkt_certificate(prob, r["x"])
    assert max(cert.values()) <= 1e-5, cert


def test_maros_full_suite_construction():
    """maros_full (VERDICT r4 item 5): >= 50 distinct instances across the
    reproducible recipe families, each carrying well-formed problem data."""
    probs = mm.full_problems()
    assert len(probs) >= 50
    names = [p["name"] for p in probs]
    assert len(set(names)) == len(names)
    for p in probs:
        n = p["c"].shape[0]
        assert p["Q"].shape == (n, n)
        # Q must be symmetric PSD-ish (allow tiny asymmetry from recipes).
        assert np.allclose(p["Q"], p["Q"].T, atol=1e-12)
    # The published-optimum anchors are present.
    assert any(np.isfinite(p["optval"]) and p["name"] == "CVXQP1_n100"
               for p in probs)


def test_kkt_certificate_handles_duplicated_active_rows():
    """Degenerate duplicated-row instances: the dual least-squares stalls
    on exactly repeated active rows unless duplicates are merged (they
    share dual mass).  The certificate must certify the SAME x that the
    non-degenerate twin certifies."""
    pd_ = mm.cvxqp_problem(3, 100, np.nan, name="d", duplicate_rows=10)
    pn_ = mm.cvxqp_problem(3, 100, np.nan, name="n")
    r = mm.solve_with_pogs_tpu(pn_, abs_tol=1e-6, rel_tol=1e-6,
                               max_iter=2000)
    cert_n = mm.kkt_certificate(pn_, r["x"])
    cert_d = mm.kkt_certificate(pd_, r["x"])
    assert max(cert_n.values()) <= 1e-6, cert_n
    assert max(cert_d.values()) <= 1e-6, cert_d
