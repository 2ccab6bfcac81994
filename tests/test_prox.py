"""Prox library unit tests — analytic values + optimality residuals.

Modeled on the reference's test strategy (tests/test_proximal.cpp): every
closed form is checked against hand-computed values and/or the prox
optimality condition  h'(x*) + rho (x* - v) = 0  (plus a brute-force
numeric oracle for the generic (a,b,c,d,e) transform).
"""

import numpy as np
import pytest
import jax.numpy as jnp
from scipy.optimize import minimize_scalar
from scipy.special import lambertw as scipy_lambertw

from pogs_tpu.types import Function, FunctionVector
from pogs_tpu.prox.tools import lambertw_exp, cubic_solve
from pogs_tpu.prox.scalar import PROX, FUNC
from pogs_tpu.prox.vector import prox_eval, func_eval


def test_lambertw_exp_matches_scipy():
    x = np.linspace(-30, 300, 1000)
    got = np.asarray(lambertw_exp(jnp.asarray(x, jnp.float64)))
    # scipy overflows e^x beyond ~700; stay within range and compare W(e^x)
    ref = np.real(scipy_lambertw(np.exp(np.minimum(x, 700.0))))
    np.testing.assert_allclose(got, ref, rtol=1e-10)


def test_lambertw_exp_large_x():
    # For large x, w + log(w) = x exactly characterizes the root.
    x = jnp.asarray([500.0, 700.0, 5000.0], jnp.float64)
    w = lambertw_exp(x)
    np.testing.assert_allclose(np.asarray(w + jnp.log(w)), np.asarray(x), rtol=1e-12)


def test_cubic_solve_positive_root():
    # x^3 + p x^2 + q x + r with known positive root structure used by
    # prox of 1/x: x^3 - v x^2 - 1/rho = 0.
    for v in [0.0, 0.1, 1.0, 10.0, 100.0]:
        for rho in [0.01, 1.0, 100.0]:
            root = float(cubic_solve(jnp.float64(-v), jnp.float64(0.0), jnp.float64(-1.0 / rho)))
            resid = root**3 - v * root**2 - 1.0 / rho
            assert root > 0
            assert abs(resid) < 1e-8 * max(1.0, root**3)


# --- closed forms against hand-computed values -----------------------------

def test_prox_abs_soft_threshold():
    v = jnp.asarray([-2.0, -0.5, 0.0, 0.5, 2.0], jnp.float64)
    got = PROX[Function.ABS](v, jnp.float64(1.0))
    np.testing.assert_allclose(np.asarray(got), [-1.0, 0.0, 0.0, 0.0, 1.0], atol=1e-12)


def test_prox_square_shrinkage():
    v = jnp.asarray([-3.0, 1.0, 4.0], jnp.float64)
    got = PROX[Function.SQUARE](v, jnp.float64(2.0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(v) * 2.0 / 3.0, rtol=1e-12)


def test_prox_indicators():
    v = jnp.asarray([-1.5, 0.3, 2.0], jnp.float64)
    rho = jnp.float64(1.0)
    np.testing.assert_allclose(np.asarray(PROX[Function.INDBOX01](v, rho)), [0.0, 0.3, 1.0])
    np.testing.assert_allclose(np.asarray(PROX[Function.INDEQ0](v, rho)), [0.0, 0.0, 0.0])
    np.testing.assert_allclose(np.asarray(PROX[Function.INDGE0](v, rho)), [0.0, 0.3, 2.0])
    np.testing.assert_allclose(np.asarray(PROX[Function.INDLE0](v, rho)), [-1.5, 0.0, 0.0])


def test_prox_huber_regions():
    rho = jnp.float64(1.0)
    # inside: |v| < 1 + 1/rho = 2 -> v*rho/(1+rho)
    np.testing.assert_allclose(float(PROX[Function.HUBER](jnp.float64(1.0), rho)), 0.5)
    # outside: shift by 1/rho
    np.testing.assert_allclose(float(PROX[Function.HUBER](jnp.float64(5.0), rho)), 4.0)
    np.testing.assert_allclose(float(PROX[Function.HUBER](jnp.float64(-5.0), rho)), -4.0)


def test_prox_hinge_both_sides():
    rho = jnp.float64(2.0)
    # max(0, x): v >= 1/rho -> v - 1/rho; v <= 0 -> v; 0 < v < 1/rho -> 0
    f = PROX[Function.MAXPOS0]
    np.testing.assert_allclose(float(f(jnp.float64(3.0), rho)), 2.5)
    np.testing.assert_allclose(float(f(jnp.float64(-1.0), rho)), -1.0)
    np.testing.assert_allclose(float(f(jnp.float64(0.25), rho)), 0.0)
    # max(0, -x)
    g = PROX[Function.MAXNEG0]
    np.testing.assert_allclose(float(g(jnp.float64(-3.0), rho)), -2.5)
    np.testing.assert_allclose(float(g(jnp.float64(1.0), rho)), 1.0)
    np.testing.assert_allclose(float(g(jnp.float64(-0.25), rho)), 0.0)


# --- optimality residuals for the transcendental proxes ---------------------

@pytest.mark.parametrize(
    "h,deriv,domain",
    [
        (Function.EXP, lambda x: np.exp(x), (-5.0, 5.0)),
        (Function.NEGLOG, lambda x: -1.0 / x, (0.1, 10.0)),
        (Function.NEGENTR, lambda x: np.log(x) + 1.0, (0.1, 10.0)),
        (Function.RECIPR, lambda x: -1.0 / x**2, (0.1, 10.0)),
        (Function.LOGISTIC, lambda x: 1.0 / (1.0 + np.exp(-x)), (-20.0, 20.0)),
    ],
)
def test_prox_optimality(h, deriv, domain):
    rng = np.random.default_rng(0)
    v = rng.uniform(domain[0], domain[1], size=64)
    for rho in [0.1, 1.0, 10.0]:
        x = np.asarray(PROX[h](jnp.asarray(v, jnp.float64), jnp.float64(rho)))
        resid = deriv(x) + rho * (x - v)
        np.testing.assert_allclose(resid, 0.0, atol=5e-6)


# --- generic transform vs numeric minimization ------------------------------

@pytest.mark.parametrize("h", [Function.ABS, Function.SQUARE, Function.HUBER,
                               Function.LOGISTIC, Function.MAXPOS0, Function.EXP])
def test_prox_eval_generic_transform(h):
    rng = np.random.default_rng(1)
    n = 16
    a = rng.uniform(0.5, 2.0, n)
    b = rng.uniform(-1.0, 1.0, n)
    c = rng.uniform(0.5, 2.0, n)
    d = rng.uniform(-0.5, 0.5, n)
    e = rng.uniform(0.0, 1.0, n)
    v = rng.uniform(-2.0, 2.0, n)
    rho = 1.7

    fv = FunctionVector(int(h), n, a=a, b=b, c=c, d=d, e=e, dtype=jnp.float64)
    got = np.asarray(prox_eval(fv, jnp.asarray(v, jnp.float64), jnp.float64(rho)))

    scalar_h = {
        Function.ABS: abs,
        Function.SQUARE: lambda t: 0.5 * t * t,
        Function.HUBER: lambda t: 0.5 * t * t if abs(t) < 1 else abs(t) - 0.5,
        Function.LOGISTIC: lambda t: np.logaddexp(0.0, t),
        Function.MAXPOS0: lambda t: max(0.0, t),
        Function.EXP: np.exp,
    }[h]

    for i in range(n):
        def obj(t):
            return (c[i] * scalar_h(a[i] * t - b[i]) + d[i] * t + 0.5 * e[i] * t * t
                    + 0.5 * rho * (t - v[i]) ** 2)
        ref = minimize_scalar(obj, bounds=(-50, 50), method="bounded",
                              options={"xatol": 1e-12}).x
        assert abs(got[i] - ref) < 1e-6, f"i={i}: got {got[i]}, ref {ref}"


def test_func_eval_matches_manual():
    n = 8
    rng = np.random.default_rng(2)
    b = rng.normal(size=n)
    x = rng.normal(size=n)
    fv = FunctionVector(Function.SQUARE, n, b=b, dtype=jnp.float64)
    got = float(func_eval(fv, jnp.asarray(x, jnp.float64)))
    np.testing.assert_allclose(got, 0.5 * np.sum((x - b) ** 2), rtol=1e-12)


def test_mixed_function_vector_dispatch():
    # Half ABS, half SQUARE in one vector — masked multi-type dispatch.
    h = np.array([int(Function.ABS)] * 4 + [int(Function.SQUARE)] * 4, np.int32)
    fv = FunctionVector(h, dtype=jnp.float64)
    v = jnp.asarray(np.linspace(-2, 2, 8), jnp.float64)
    got = np.asarray(prox_eval(fv, v, jnp.float64(1.0)))
    va = np.asarray(v)
    expect = np.concatenate([
        np.sign(va[:4]) * np.maximum(np.abs(va[:4]) - 1.0, 0.0),
        va[4:] / 2.0,
    ])
    np.testing.assert_allclose(got, expect, atol=1e-12)


def test_float32_float64_consistency():
    rng = np.random.default_rng(3)
    v = rng.uniform(-3, 3, 128)
    for h in [Function.ABS, Function.SQUARE, Function.HUBER, Function.LOGISTIC,
              Function.NEGLOG, Function.EXP]:
        x64 = np.asarray(PROX[h](jnp.asarray(v, jnp.float64), jnp.float64(1.3)))
        x32 = np.asarray(PROX[h](jnp.asarray(v, jnp.float32), jnp.float32(1.3)))
        # f32 carries ~1e-7 relative error through a handful of transcendental
        # ops; 1e-4 absolute at O(1) magnitudes is the expected precision.
        np.testing.assert_allclose(x32, x64, atol=5e-4)


def test_prox_argmin_property_all_functions(rng):
    """Universal argmin check: for every h and random (a,b,c,d,e,rho,v),
    obj(prox(v)) <= obj(prox(v) + delta) for random perturbations delta.
    Catches any closed-form or transform error without per-function
    oracles (complements the hand-computed cases above)."""
    import numpy as np
    import jax.numpy as jnp
    from pogs_tpu.types import Function, FunctionVector
    from pogs_tpu.prox.vector import prox_eval, func_eval

    N = 64
    for h in Function:
        a = rng.uniform(0.5, 2.0, N)
        b = rng.uniform(-1.0, 1.0, N)
        c = rng.uniform(0.2, 2.0, N)
        d = rng.uniform(-0.5, 0.5, N)
        e = rng.uniform(0.0, 1.0, N)
        v = rng.uniform(-3.0, 3.0, N)
        rho = float(rng.uniform(0.3, 3.0))
        fv = FunctionVector(h, N, a=a, b=b, c=c, d=d, e=e, dtype=jnp.float64)
        x = np.asarray(prox_eval(fv, jnp.asarray(v), rho))
        assert np.all(np.isfinite(x)), f"{h.name}: non-finite prox"

        def total_obj(z):
            # elementwise objective + quadratic penalty (no sum: keep
            # per-coordinate comparisons to localize failures)
            zj = jnp.asarray(z)
            fo = fv.replace_params()  # same params
            av = fv.a * zj - fv.b
            from pogs_tpu.prox.scalar import FUNC
            hval = FUNC[h](av)
            return np.asarray(
                fv.c * hval + fv.d * zj + 0.5 * fv.e * zj * zj
                + 0.5 * rho * (zj - v) ** 2
            )

        base = total_obj(x)
        assert np.all(np.isfinite(base)), f"{h.name}: non-finite objective"
        for scale in (1e-3, 1e-2, 0.1):
            for _ in range(3):
                delta = rng.standard_normal(N) * scale
                cand = x + delta
                if h in (Function.NEGLOG, Function.RECIPR, Function.NEGENTR):
                    # domain is a*z - b > 0, i.e. z > b/a (a > 0 here)
                    zmin = (np.asarray(fv.b) + 1e-6) / np.asarray(fv.a)
                    cand = np.maximum(cand, zmin)
                if h == Function.INDBOX01:
                    cand = np.clip((cand - np.asarray(fv.b)) /
                                   np.asarray(fv.a), 0, 1)
                    cand = np.asarray(fv.a) * 0 + cand  # already feasible z
                    cand = (cand + np.asarray(fv.b)) / np.asarray(fv.a)
                if h == Function.INDEQ0:
                    cand = np.full(N, np.asarray(fv.b) / np.asarray(fv.a))
                if h == Function.INDGE0:
                    az = np.asarray(fv.a) * cand - np.asarray(fv.b)
                    cand = np.where(az < 0,
                                    np.asarray(fv.b) / np.asarray(fv.a), cand)
                if h == Function.INDLE0:
                    az = np.asarray(fv.a) * cand - np.asarray(fv.b)
                    cand = np.where(az > 0,
                                    np.asarray(fv.b) / np.asarray(fv.a), cand)
                other = total_obj(cand)
                # prox must be no worse than any feasible perturbation
                # (tolerance for f64 roundoff in the comparison itself)
                viol = base - other
                assert np.max(viol) <= 1e-6 * (1.0 + np.abs(base).max()), (
                    f"{h.name}: prox not a minimizer "
                    f"(violation {np.max(viol):.2e})"
                )


def test_prox_zero_a_degrades_to_quadratic(rng):
    """a = 0 makes the h-term constant: prox must be the quadratic/linear
    minimizer (v*rho - d)/(e + rho), not NaN."""
    import numpy as np
    import jax.numpy as jnp
    from pogs_tpu.types import Function, FunctionVector
    from pogs_tpu.prox.vector import prox_eval

    n = 8
    v = rng.standard_normal(n)
    d = rng.standard_normal(n)
    e = rng.uniform(0.1, 1.0, n)
    rho = 1.7
    fv = FunctionVector(Function.ABS, n, a=0.0, d=d, e=e, dtype=jnp.float64)
    out = np.asarray(prox_eval(fv, jnp.asarray(v), rho))
    expect = (v * rho - d) / (e + rho)
    assert np.all(np.isfinite(out))
    np.testing.assert_allclose(out, expect, rtol=1e-12)
