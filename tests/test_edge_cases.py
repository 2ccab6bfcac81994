"""Edge-case robustness: degenerate shapes, extreme parameters, validation.

The reference's validation surface (cone index checks prox_lib_cone.h:50-66,
convexity clamps prox_lib.h:62-69, QP/Kx rejection pogs.cpp:1935-1944) plus
shape degeneracies it never tests.
"""

import numpy as np
import pytest

from pogs_tpu import (
    Function, FunctionVector, GraphFormSolver, SolverSettings, Status,
    solve_lasso, solve_graph_form, Cone, ConeConstraint,
)
from pogs_tpu.cones.sets import validate_cones
from pogs_tpu.solver.cone import ConeSolver


def test_one_by_one():
    # min 0.5(2x - 3)^2 + |x|  →  x = (6-1)/4 = 1.25 when x > 0.
    A = np.array([[2.0]])
    f = FunctionVector(Function.SQUARE, 1, b=3.0)
    g = FunctionVector(Function.ABS, 1)
    out = solve_graph_form(A, f, g, abs_tol=1e-7, rel_tol=1e-7)
    assert out["status"] == 0
    assert out["x"][0] == pytest.approx(1.25, abs=1e-3)


def test_single_row_and_single_column():
    rng = np.random.default_rng(0)
    # one row
    A = rng.standard_normal((1, 6))
    f = FunctionVector(Function.SQUARE, 1, b=1.0)
    g = FunctionVector(Function.SQUARE, 6, c=0.5)
    out = solve_graph_form(A, f, g, abs_tol=1e-6, rel_tol=1e-6)
    assert out["status"] == 0
    # one column
    A = rng.standard_normal((6, 1))
    f = FunctionVector(Function.SQUARE, 6, b=rng.standard_normal(6))
    g = FunctionVector(Function.ABS, 1, c=0.1)
    out = solve_graph_form(A, f, g, abs_tol=1e-6, rel_tol=1e-6)
    assert out["status"] == 0


def test_zero_matrix():
    """A = 0: y must be 0, x minimizes g alone; the Sinkhorn regularizer
    keeps the equilibration finite (equil_helper.h:19-23)."""
    A = np.zeros((4, 3))
    f = FunctionVector(Function.SQUARE, 4, b=1.0)
    g = FunctionVector(Function.SQUARE, 3, b=2.0)
    out = solve_graph_form(A, f, g, abs_tol=1e-6, rel_tol=1e-6, max_iter=500)
    # Regression: norm2_est(0) used to be 0/0 = NaN, aborting the solve
    # NAN_FOUND at iteration 0 (it previously "passed" only because huge
    # pre-fix equilibration scalings made the iteration-0 prox output
    # land on 2.0 by accident).
    assert out["status"] == 0
    assert np.all(np.isfinite(out["x"]))
    np.testing.assert_allclose(out["x"], 2.0, atol=1e-2)
    np.testing.assert_allclose(out["y"], 0.0, atol=1e-2)


def test_huge_lambda_kills_x():
    rng = np.random.default_rng(1)
    A = rng.standard_normal((20, 10))
    b = rng.standard_normal(20)
    lam = 100.0 * float(np.max(np.abs(A.T @ b)))
    out = solve_lasso(A, b, lam, abs_tol=1e-6, rel_tol=1e-6)
    assert out["status"] == 0
    np.testing.assert_allclose(out["x"], 0.0, atol=1e-4)


def test_max_iter_one():
    rng = np.random.default_rng(2)
    A = rng.standard_normal((10, 5))
    f = FunctionVector(Function.SQUARE, 10, b=1.0)
    g = FunctionVector(Function.ABS, 5)
    out = solve_graph_form(A, f, g, max_iter=1)
    assert out["status"] == int(Status.MAX_ITER)
    assert np.all(np.isfinite(out["x"]))


def test_length_mismatch_raises():
    A = np.eye(4)
    f = FunctionVector(Function.SQUARE, 3)
    g = FunctionVector(Function.ABS, 4)
    with pytest.raises(ValueError, match="length"):
        GraphFormSolver(A).solve(f, g)


def test_convexity_clamps():
    fv = FunctionVector(Function.SQUARE, 3, c=-1.0, e=-2.0)
    assert np.all(np.asarray(fv.c) == 0.0)
    assert np.all(np.asarray(fv.e) == 0.0)


def test_cone_validation():
    # overlapping indices
    with pytest.raises(ValueError, match="multiple"):
        validate_cones(
            [ConeConstraint(Cone.NON_NEG, [0, 1]),
             ConeConstraint(Cone.ZERO, [1])], 3,
        )
    # out of range
    with pytest.raises(ValueError, match="range"):
        validate_cones([ConeConstraint(Cone.NON_NEG, [5])], 3)
    # exp cone arity
    with pytest.raises(ValueError, match="exactly 3"):
        validate_cones([ConeConstraint(Cone.EXP_PRIMAL, [0, 1])], 3)
    # SDP packed length
    with pytest.raises(ValueError, match="n\\(n\\+1\\)/2"):
        validate_cones([ConeConstraint(Cone.SDP, [0, 1])], 3)


def test_qp_with_kx_rejected():
    """Quadratic objective + K_x constraints: explicit rejection
    (pogs.cpp:1935-1944)."""
    A = np.eye(3)
    P = np.eye(3)
    solver = ConeSolver(A, Kx=[ConeConstraint(Cone.NON_NEG, [0, 1, 2])])
    with pytest.raises(ValueError, match="quadratic"):
        solver.solve(np.ones(3), np.ones(3), P=P)


def test_empty_cones_is_least_norm_like():
    """No cones at all: HSDE on free rows — certificate machinery must not
    misfire on a trivially feasible problem."""
    A = np.eye(3)
    b = np.ones(3)
    c = np.zeros(3)
    solver = ConeSolver(A, Ky=[ConeConstraint(Cone.ZERO, [0, 1, 2])])
    res = solver.solve(b, c)
    assert res.status == Status.SUCCESS
    np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-3)


def test_warm_start_shapes_checked():
    A = np.eye(4)
    f = FunctionVector(Function.SQUARE, 4, b=1.0)
    g = FunctionVector(Function.ABS, 4)
    s = GraphFormSolver(A)
    out = s.solve(f, g, x_init=np.zeros(4), nu_init=np.zeros(4))
    assert out.status in (Status.SUCCESS, Status.MAX_ITER)


def test_fv_from_objs_roundtrip():
    from pogs_tpu.types import FunctionObj

    objs = [FunctionObj(Function.ABS, a=2.0, b=1.0, c=0.5),
            FunctionObj(Function.SQUARE, d=-1.0, e=3.0)]
    fv = FunctionVector.from_objs(objs)
    assert fv.n == 2
    assert fv.h[0] == int(Function.ABS) and fv.h[1] == int(Function.SQUARE)
    assert np.asarray(fv.a)[0] == 2.0 and np.asarray(fv.e)[1] == 3.0


def test_param_length_mismatch_raises():
    with pytest.raises(ValueError, match="parameter length"):
        FunctionVector(Function.SQUARE, 10, b=np.ones(7))


def test_nan_input_reports_nan_found():
    A = np.eye(4)
    A[1, 1] = np.nan
    f = FunctionVector(Function.SQUARE, 4, b=1.0)
    g = FunctionVector(Function.ABS, 4)
    out = solve_graph_form(A, f, g, max_iter=50)
    assert out["status"] in (int(Status.NAN_FOUND), int(Status.MAX_ITER))
    # must not silently claim SUCCESS
    assert out["status"] != int(Status.SUCCESS)


def test_function_obj_list_api():
    """Reference calling convention: plain FunctionObj lists."""
    from pogs_tpu.types import FunctionObj

    n = 6
    b = np.linspace(-1, 1, n)
    f = [FunctionObj(Function.SQUARE, b=float(bi)) for bi in b]
    g = [FunctionObj(Function.ABS, c=0.3) for _ in range(n)]
    out = solve_graph_form(np.eye(n), f, g, abs_tol=1e-6, rel_tol=1e-6)
    assert out["status"] == 0
    expect = np.sign(b) * np.maximum(np.abs(b) - 0.3, 0.0)
    np.testing.assert_allclose(out["x"], expect, atol=1e-3)
