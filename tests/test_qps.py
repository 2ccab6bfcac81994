"""QPS/MPS reader-writer tests.

Covers the format semantics the Maros–Mészáros files rely on (QUADOBJ
mirroring, objective-row RHS constant, RANGES resolution, bound types)
plus a full pipeline check: vendored HS21 → parse → solve_qp → the
published optimum, and a write→read→solve round trip on the CVXQP1
CUTE-recipe problem against its published optimal value.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pogs_tpu.utils.qps import (  # noqa: E402
    load_qps,
    loads_qps,
    qps_to_solve_qp_kwargs,
    save_qps,
)

DATA = os.path.join(os.path.dirname(__file__), "data")


def test_hs21_parse():
    p = load_qps(os.path.join(DATA, "HS21.QPS"))
    assert p["name"] == "HS21"
    assert p["col_names"] == ["X1", "X2"]
    np.testing.assert_allclose(p["Q"], np.diag([0.02, 2.0]))
    np.testing.assert_allclose(p["c"], [0.0, 0.0])
    assert p["c0"] == -100.0
    assert p["sense"] == [">="]
    np.testing.assert_allclose(p["A"], [[10.0, -1.0]])
    np.testing.assert_allclose(p["rhs"], [10.0])
    np.testing.assert_allclose(p["lb"], [2.0, -50.0])
    np.testing.assert_allclose(p["ub"], [50.0, 50.0])


def test_hs21_solve_end_to_end():
    from pogs_tpu.api.qp import solve_qp
    from pogs_tpu.types import Status

    p = load_qps(os.path.join(DATA, "HS21.QPS"))
    kw = qps_to_solve_qp_kwargs(p)
    out = solve_qp(abs_tol=1e-8, rel_tol=1e-8, dtype=np.float64, **kw)
    assert Status(out["status"]) == Status.SUCCESS
    assert abs(out["optval"] + p["c0"] - (-99.96)) < 1e-5
    np.testing.assert_allclose(out["x"], [2.0, 0.0], atol=1e-5)


def test_hs21_sparse_load_matches_dense():
    from scipy import sparse as sp

    d = load_qps(os.path.join(DATA, "HS21.QPS"))
    s = load_qps(os.path.join(DATA, "HS21.QPS"), sparse=True)
    assert sp.issparse(s["Q"]) and sp.issparse(s["A"])
    np.testing.assert_allclose(s["Q"].toarray(), d["Q"])
    np.testing.assert_allclose(s["A"].toarray(), d["A"])


def test_cvxqp1_roundtrip_and_solve(tmp_path):
    from benchmarks.maros_meszaros import cvxqp_problem, solve_with_pogs_tpu

    src = cvxqp_problem(1, 100, optval=1.1590718e4)
    path = tmp_path / "CVXQP1_S.QPS"
    save_qps(path, src["name"], src["Q"], src["c"], src["c0"], src["A"],
             src["sense"], src["rhs"], src["lb"], src["ub"])
    p = load_qps(path)
    np.testing.assert_allclose(p["Q"], src["Q"], rtol=0, atol=0)
    np.testing.assert_allclose(p["A"], src["A"], rtol=0, atol=0)
    np.testing.assert_allclose(p["rhs"], src["rhs"])
    np.testing.assert_allclose(p["lb"], src["lb"])
    np.testing.assert_allclose(p["ub"], src["ub"])
    assert p["sense"] == src["sense"]

    p["optval"] = src["optval"]
    res = solve_with_pogs_tpu(p, abs_tol=1e-7, rel_tol=1e-7)
    assert abs(res["objective"] - src["optval"]) / src["optval"] < 1e-4


def test_ranges_resolution():
    text = """\
NAME          RNG
ROWS
 N  OBJ
 L  RL
 G  RG
 E  REP
 E  REN
COLUMNS
    X  OBJ 1.0 RL 1.0
    X  RG 1.0 REP 1.0
    X  REN 1.0
RHS
    RHS1  RL 5.0 RG 2.0
    RHS1  REP 1.0 REN 1.0
RANGES
    RNG1  RL 3.0 RG 4.0
    RNG1  REP 2.0 REN -2.0
ENDATA
"""
    p = loads_qps(text)
    got = dict(zip(p["row_names"], zip(p["sense"], p["rhs"])))
    # L with range 3, rhs 5  →  2 <= x <= 5
    assert got["RL"] == ("<=", 5.0) and got["RL:lo"] == (">=", 2.0)
    # G with range 4, rhs 2  →  2 <= x <= 6
    assert got["RG"] == ("<=", 6.0) and got["RG:lo"] == (">=", 2.0)
    # E with range +2, rhs 1 →  1 <= x <= 3
    assert got["REP"] == ("<=", 3.0) and got["REP:lo"] == (">=", 1.0)
    # E with range -2, rhs 1 → -1 <= x <= 1
    assert got["REN"] == ("<=", 1.0) and got["REN:lo"] == (">=", -1.0)
    # Both emitted rows carry the same coefficient vector.
    np.testing.assert_allclose(p["A"], np.ones((8, 1)))


def test_bound_types_and_negative_up_rule():
    text = """\
NAME          BND
ROWS
 N  OBJ
 G  R0
COLUMNS
    A  OBJ 1.0 R0 1.0
    B  OBJ 1.0 R0 1.0
    C  OBJ 1.0 R0 1.0
    D  OBJ 1.0 R0 1.0
    E  OBJ 1.0 R0 1.0
RHS
BOUNDS
 FR BND  A
 MI BND  B
 UP BND  B 7.0
 UP BND  C -1.0
 LO BND  D -3.0
 UP BND  D -1.0
 FX BND  E 4.0
ENDATA
"""
    p = loads_qps(text)
    inf = np.inf
    np.testing.assert_allclose(p["lb"], [-inf, -inf, -inf, -3.0, 4.0])
    np.testing.assert_allclose(p["ub"], [inf, 7.0, -1.0, -1.0, 4.0])
    # Only C triggered the classic negative-UP lower-bound drop.
    assert p["lowered_lb"] == ["C"]


def test_objsense_max_is_folded():
    text = """\
NAME          MX
OBJSENSE
    MAX
ROWS
 N  OBJ
 L  R0
COLUMNS
    X  OBJ 3.0 R0 1.0
RHS
    RHS1  R0 2.0 OBJ 5.0
QUADOBJ
    X  X -2.0
ENDATA
"""
    p = loads_qps(text)
    assert p["objsense"] == "MAX"
    # max 3x - x^2 - 5 became min -3x + x^2 + 5.
    np.testing.assert_allclose(p["c"], [-3.0])
    np.testing.assert_allclose(p["Q"], [[2.0]])
    assert p["c0"] == 5.0


def test_quadobj_mirrors_qmatrix_does_not():
    head = """\
NAME          Q
ROWS
 N  OBJ
COLUMNS
    X  OBJ 1.0
    Y  OBJ 1.0
RHS
"""
    quadobj = head + "QUADOBJ\n    X  Y 3.0\nENDATA\n"
    qmatrix = head + ("QMATRIX\n    X  Y 3.0\n    Y  X 3.0\n"
                      "ENDATA\n")
    np.testing.assert_allclose(loads_qps(quadobj)["Q"],
                               [[0.0, 3.0], [3.0, 0.0]])
    np.testing.assert_allclose(loads_qps(qmatrix)["Q"],
                               [[0.0, 3.0], [3.0, 0.0]])


def test_integer_markers_rejected():
    text = """\
NAME          INT
ROWS
 N  OBJ
 L  R0
COLUMNS
    MARKER                 'MARKER'                 'INTORG'
    X  OBJ 1.0 R0 1.0
RHS
ENDATA
"""
    with pytest.raises(ValueError, match="integer"):
        loads_qps(text)
    bv = """\
NAME          BV
ROWS
 N  OBJ
COLUMNS
    X  OBJ 1.0
RHS
BOUNDS
 BV BND  X
ENDATA
"""
    with pytest.raises(ValueError, match="integer"):
        loads_qps(bv)


def test_qps_to_solve_qp_kwargs_sparse():
    from scipy import sparse as sp

    p = load_qps(os.path.join(DATA, "HS21.QPS"), sparse=True)
    kw = qps_to_solve_qp_kwargs(p)
    assert sp.issparse(kw["G"])
    # The >= row arrives negated as G x <= h.
    np.testing.assert_allclose(kw["G"].toarray(), [[-10.0, 1.0]])
    np.testing.assert_allclose(kw["h"], [-10.0])
    assert "A" not in kw
    # Sparse Q passes through; solve_qp's diagonal detection handles it.
    assert sp.issparse(kw["P"])
    out = __import__("pogs_tpu").solve_qp(
        abs_tol=1e-8, rel_tol=1e-8, dtype=np.float64, **kw)
    assert abs(out["optval"] - 100.0 + 99.96) < 1e-5  # c0 = -100


def test_plain_mps_lp_solves():
    """A plain MPS file (no QUADOBJ) is an LP; the kwargs lower into
    solve_lp and match scipy linprog."""
    from scipy.optimize import linprog

    from pogs_tpu import solve_lp

    text = """\
NAME          LP1
ROWS
 N  COST
 L  LIM1
 G  LIM2
 E  EQ1
COLUMNS
    X1  COST 1.0 LIM1 1.0
    X1  LIM2 1.0
    X2  COST 2.0 LIM1 1.0
    X2  EQ1 1.0
    X3  COST -1.0 LIM2 1.0
    X3  EQ1 1.0
RHS
    RHS  LIM1 4.0 LIM2 1.0
    RHS  EQ1 7.0
BOUNDS
 UP BND  X1 4.0
 LO BND  X2 -1.0
ENDATA
"""
    p = loads_qps(text)
    assert not p["Q"].any()
    kw = qps_to_solve_qp_kwargs(p)
    kw.pop("P")
    q = kw.pop("q")
    out = solve_lp(q, **kw, abs_tol=1e-7, rel_tol=1e-7, max_iter=20000,
                   dtype=np.float64)
    # independent oracle on the same interval form
    A_ub, b_ub, A_eq, b_eq = [], [], [], []
    for row, s, r in zip(p["A"], p["sense"], p["rhs"]):
        if s == "<=":
            A_ub.append(row), b_ub.append(r)
        elif s == ">=":
            A_ub.append(-row), b_ub.append(-r)
        else:
            A_eq.append(row), b_eq.append(r)
    ref = linprog(p["c"], A_ub=np.array(A_ub), b_ub=np.array(b_ub),
                  A_eq=np.array(A_eq), b_eq=np.array(b_eq),
                  bounds=list(zip(p["lb"], p["ub"])), method="highs")
    assert ref.status == 0
    assert abs(out["optval"] + p["c0"] - ref.fun) < 1e-6 * max(1.0,
                                                               abs(ref.fun))


def test_solve_qps_one_call():
    """pogs_tpu.solve_qps: load + route + constant-corrected objective."""
    from pogs_tpu import solve_qps
    from pogs_tpu.types import Status

    out = solve_qps(os.path.join(DATA, "HS21.QPS"), abs_tol=1e-8,
                    rel_tol=1e-8, dtype=np.float64)
    assert out["name"] == "HS21"
    assert Status(out["status"]) == Status.SUCCESS
    assert abs(out["objective"] - (-99.96)) < 1e-5
    np.testing.assert_allclose(out["x"], [2.0, 0.0], atol=1e-5)
    # sparse load path too
    out2 = solve_qps(os.path.join(DATA, "HS21.QPS"), sparse=True,
                     abs_tol=1e-8, rel_tol=1e-8, dtype=np.float64)
    assert abs(out2["objective"] - (-99.96)) < 1e-5
