"""Tests for the native host runtime (C ABI + ctypes bindings).

Builds the library in-tree if needed (skipped when no toolchain), then
cross-checks the native solver against the TPU/JAX solver — the two
implementations of the same algorithm act as numerics oracles for each
other.  Mirrors the reference's C-interface tests
(reference: tests/test_c_interface.cpp:16-117, enum stability :149-162).
"""

import numpy as np
import pytest

from pogs_tpu.types import Function, FunctionVector, SolverSettings, Status


@pytest.fixture(scope="session")
def native():
    from pogs_tpu import native as nat

    if not nat.is_available():
        try:
            nat.build()
        except Exception as exc:  # no toolchain: skip, don't fail
            pytest.skip(f"native library unavailable and build failed: {exc}")
    return nat


def _lasso_problem(m, n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((m, n))
    x_true = rng.standard_normal(n)
    x_true[rng.random(n) < 0.8] = 0.0
    b = A @ x_true + 0.1 * rng.standard_normal(m)
    lam = 0.2 * np.max(np.abs(A.T @ b))
    return A, b, lam


def test_version(native):
    assert native.version() >= 10000


def test_identity_lasso_soft_threshold(native):
    # A = I: x* = soft_threshold(b, lam) (tests/test_solver.cpp:43-114).
    n = 10
    b = np.array([3.0, -2.0, 0.5, -0.25, 1.5, 0.0, -4.0, 2.0, 0.9, -1.1])
    lam = 1.0
    f = FunctionVector(Function.SQUARE, n, b=b)
    g = FunctionVector(Function.ABS, n, c=lam)
    out = native.solve_graph_native(
        np.eye(n), f, g, abs_tol=1e-6, rel_tol=1e-6
    )
    assert out["status"] == Status.SUCCESS
    expect = np.sign(b) * np.maximum(np.abs(b) - lam, 0.0)
    np.testing.assert_allclose(out["x"], expect, atol=5e-4)


def test_native_matches_jax_lasso(native):
    from pogs_tpu.api.graph import solve_lasso

    A, b, lam = _lasso_problem(80, 40, seed=3)
    f = FunctionVector(Function.SQUARE, 80, b=b)
    g = FunctionVector(Function.ABS, 40, c=lam)
    out_native = native.solve_graph_native(A, f, g, abs_tol=1e-6, rel_tol=1e-6)
    out_jax = solve_lasso(A, b, lam, abs_tol=1e-5, rel_tol=1e-5,
                          dtype="float64", gap_stop=False)
    assert out_native["status"] == Status.SUCCESS
    assert out_jax["status"] == int(Status.SUCCESS)
    assert out_native["optval"] == pytest.approx(out_jax["optval"], rel=1e-3)
    np.testing.assert_allclose(out_native["x"], out_jax["x"], atol=2e-3)


def test_warm_start_lambda_path(native):
    A, b, lam_max = _lasso_problem(60, 30, seed=5)
    solver = native.NativeDenseSolver(A)
    st = SolverSettings(abs_tol=1e-5, rel_tol=1e-5)
    f = FunctionVector(Function.SQUARE, 60, b=b)
    iters = []
    for frac in (1.0, 0.8, 0.6, 0.4):
        g = FunctionVector(Function.ABS, 30, c=frac * lam_max)
        out = solver.solve(f, g, st, warm_start=True)
        assert out["status"] == Status.SUCCESS
        iters.append(out["iterations"])
    solver.free()
    # Warm-started continuation should not be slower than the cold solve.
    assert min(iters[1:]) <= iters[0]


def test_sparse_native(native):
    sp = pytest.importorskip("scipy.sparse")
    rng = np.random.default_rng(11)
    A = sp.random(50, 25, density=0.3, random_state=7, format="csr")
    b = rng.standard_normal(50)
    f = FunctionVector(Function.SQUARE, 50, b=b)
    g = FunctionVector(Function.ABS, 25, c=0.05)
    out = native.solve_graph_native(A, f, g, abs_tol=1e-5, rel_tol=1e-5)
    assert out["status"] == Status.SUCCESS
    dense_out = native.solve_graph_native(
        np.asarray(A.todense()), f, g, abs_tol=1e-5, rel_tol=1e-5
    )
    assert out["optval"] == pytest.approx(dense_out["optval"], rel=1e-3)


def test_nonneg_ls_native(native):
    rng = np.random.default_rng(21)
    A = rng.standard_normal((40, 20))
    b = rng.standard_normal(40)
    f = FunctionVector(Function.SQUARE, 40, b=b)
    g = FunctionVector(Function.INDGE0, 20)
    out = native.solve_graph_native(A, f, g, abs_tol=1e-6, rel_tol=1e-6)
    assert out["status"] == Status.SUCCESS
    assert np.all(out["x"] >= -1e-4)


def test_enum_abi_stability():
    """Enum integer values are part of the C ABI (test_c_interface.cpp:149-162)."""
    assert int(Function.ABS) == 0
    assert int(Function.LOGISTIC) == 8
    assert int(Function.SQUARE) == 14
    assert int(Function.ZERO) == 15
    assert int(Status.SUCCESS) == 0
    assert int(Status.MAX_ITER) == 3
    assert int(Status.NAN_FOUND) == 4


def test_cone_lp_native(native):
    """LP with known solution: min x1 + 2 x2 s.t. x1+x2 = 1, x >= 0."""
    from pogs_tpu.types import Cone, ConeConstraint

    A = np.array([[1.0, 1.0], [-1.0, 0.0], [0.0, -1.0]])
    b = np.array([1.0, 0.0, 0.0])
    c = np.array([1.0, 2.0])
    Ky = [ConeConstraint(Cone.ZERO, [0]), ConeConstraint(Cone.NON_NEG, [1, 2])]
    out = native.solve_cone_native(A, b, c, Ky=Ky, abs_tol=1e-6, rel_tol=1e-6)
    assert out["status"] == Status.SUCCESS
    assert out["optval"] == pytest.approx(1.0, abs=1e-3)
    np.testing.assert_allclose(out["x"], [1.0, 0.0], atol=2e-3)


def test_cone_socp_native_matches_python(native):
    """SOCP with closed form: min c'x s.t. ||x − x0|| ≤ r
    → x* = x0 − r c/||c||, optval = c'x0 − r||c||."""
    from pogs_tpu.types import Cone, ConeConstraint
    from pogs_tpu.api.cone import solve_cone

    rng = np.random.default_rng(3)
    n = 5
    x0 = rng.standard_normal(n)
    c = rng.standard_normal(n)
    r = 1.5
    # b − Ax = (r, x − x0) ∈ SOC.
    A = np.vstack([np.zeros((1, n)), -np.eye(n)])
    b = np.concatenate([[r], -x0])
    Ky = [ConeConstraint(Cone.SOC, range(n + 1))]
    expect = float(c @ x0 - r * np.linalg.norm(c))

    out_n = native.solve_cone_native(A, b, c, Ky=Ky, abs_tol=1e-7,
                                     rel_tol=1e-7, max_iter=20000)
    assert out_n["status"] == Status.SUCCESS
    assert out_n["optval"] == pytest.approx(expect, rel=1e-3, abs=1e-3)

    out_p = solve_cone(A, b, c, Ky=Ky, abs_tol=1e-6, rel_tol=1e-6,
                       max_iter=10000, dtype="float64")
    assert out_p["status"] == int(Status.SUCCESS)
    assert out_n["optval"] == pytest.approx(out_p["optval"], rel=1e-3, abs=1e-3)


def test_cone_native_rejects_sdp(native):
    from pogs_tpu.types import Cone, ConeConstraint

    A = np.eye(3)
    Ky = [ConeConstraint(Cone.SDP, [0, 1, 2])]
    with pytest.raises(RuntimeError, match="SDP"):
        native.NativeConeSolver(A, Ky=Ky)


def test_cone_exp_native(native):
    """Exponential-cone feasibility: min t s.t. (1, 1, t) in K_exp → t = e."""
    from pogs_tpu.types import Cone, ConeConstraint

    # variables x = (t,); rows: b - Ax = (1, 1, t) in EXP_PRIMAL
    A = np.array([[0.0], [0.0], [-1.0]])
    b = np.array([1.0, 1.0, 0.0])
    c = np.array([1.0])
    Ky = [ConeConstraint(Cone.EXP_PRIMAL, [0, 1, 2])]
    out = native.solve_cone_native(A, b, c, Ky=Ky, abs_tol=1e-7, rel_tol=1e-7,
                                   max_iter=10000)
    assert out["status"] == Status.SUCCESS
    assert out["x"][0] == pytest.approx(np.e, rel=1e-2)


def test_cone_sparse_native_lp(native):
    """Sparse CSR cone solve (CGLS projector) matches the dense path."""
    sp = pytest.importorskip("scipy.sparse")
    A = np.array([[1.0, 1.0], [-1.0, 0.0], [0.0, -1.0]])
    b = np.array([1.0, 0.0, 0.0])
    c = np.array([1.0, 2.0])
    from pogs_tpu.types import Cone, ConeConstraint
    Ky = [ConeConstraint(Cone.ZERO, [0]), ConeConstraint(Cone.NON_NEG, [1, 2])]
    solver = native.NativeConeSolver(sp.csr_matrix(A), Ky=Ky)
    out = solver.solve(b, c, SolverSettings(abs_tol=1e-6, rel_tol=1e-6))
    solver.free()
    assert out["status"] == Status.SUCCESS
    assert out["optval"] == pytest.approx(1.0, abs=1e-2)
    np.testing.assert_allclose(out["x"], [1.0, 0.0], atol=1e-2)
