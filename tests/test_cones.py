"""Cone projection tests — membership, Moreau identity, analytic cases.

Mirrors the strategy of tests/test_cone_projections.cpp: exp-cone case
analysis (in-cone / boundary / polar / general), Moreau decomposition
property v = Π_K(v) − Π_{K*}(−v), plus projection-optimality oracles.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from pogs_tpu.types import Cone, ConeConstraint
from pogs_tpu.cones.projections import (
    project_soc,
    project_sdp_packed,
    project_exp_primal,
    project_exp_dual,
)
from pogs_tpu.cones.sets import ConeSet, validate_cones


def _in_exp_cone(p, tol=1e-6):
    r, s, t = p
    if s > tol:
        return s * np.exp(r / s) <= t * (1 + 1e-6) + tol
    return abs(s) <= tol and r <= tol and t >= -tol


# --- SOC ---------------------------------------------------------------------

def test_soc_cases(rng):
    # inside: unchanged
    v = jnp.asarray([[5.0, 1.0, 2.0]], jnp.float64)
    np.testing.assert_allclose(np.asarray(project_soc(v)), np.asarray(v))
    # polar: -> 0
    v = jnp.asarray([[-5.0, 1.0, 2.0]], jnp.float64)
    np.testing.assert_allclose(np.asarray(project_soc(v)), 0.0, atol=1e-12)
    # general: scale
    v = jnp.asarray([[0.0, 3.0, 4.0]], jnp.float64)
    out = np.asarray(project_soc(v))[0]
    np.testing.assert_allclose(out[0], 2.5)
    np.testing.assert_allclose(np.linalg.norm(out[1:]), 2.5)


def test_soc_projection_optimality(rng):
    # Π(v) must be the closest point: compare against dense sampling of
    # feasible directions via the projection characterization
    # <v - Π(v), z - Π(v)> <= 0 for all z in K.
    v = jnp.asarray(rng.normal(size=(32, 5)), jnp.float64)
    p = np.asarray(project_soc(v))
    v = np.asarray(v)
    for _ in range(200):
        z_tail = rng.normal(size=(32, 4))
        z_head = np.linalg.norm(z_tail, axis=1) * (1 + rng.random(32))
        z = np.concatenate([z_head[:, None], z_tail], axis=1)
        inner = np.sum((v - p) * (z - p), axis=1)
        assert np.all(inner <= 1e-8)


# --- SDP ---------------------------------------------------------------------

def _unpack(vec, n):
    X = np.zeros((n, n))
    k = 0
    for col in range(n):
        for row in range(col, n):
            X[row, col] = X[col, row] = vec[k]
            k += 1
    return X


def test_sdp_projection_psd(rng):
    n = 4
    L = n * (n + 1) // 2
    v = jnp.asarray(rng.normal(size=(8, L)), jnp.float64)
    out = np.asarray(project_sdp_packed(v, n))
    for k in range(8):
        X = _unpack(out[k], n)
        w = np.linalg.eigvalsh(X)
        assert np.all(w >= -1e-10)
        # Idempotence: projecting a PSD matrix returns it.
        again = np.asarray(project_sdp_packed(jnp.asarray(out[k:k+1]), n))[0]
        np.testing.assert_allclose(again, out[k], atol=1e-10)


def test_sdp_matches_eig_clamp(rng):
    n = 3
    Arand = rng.normal(size=(n, n))
    S = (Arand + Arand.T) / 2
    pack = []
    for col in range(n):
        for row in range(col, n):
            pack.append(S[row, col])
    out = np.asarray(project_sdp_packed(jnp.asarray([pack], jnp.float64), n))[0]
    w, V = np.linalg.eigh(S)
    Xp = V @ np.diag(np.maximum(w, 0)) @ V.T
    np.testing.assert_allclose(_unpack(out, n), Xp, atol=1e-10)


# --- Exponential cone --------------------------------------------------------

def test_exp_primal_cases():
    # in cone: unchanged
    v = jnp.asarray([[0.0, 1.0, 2.0]], jnp.float64)  # 1*e^0=1 <= 2
    np.testing.assert_allclose(np.asarray(project_exp_primal(v))[0], [0, 1, 2], atol=1e-9)
    # boundary ray: r <= 0, s ~ 0, t >= 0
    v = jnp.asarray([[-1.0, 0.0, 3.0]], jnp.float64)
    np.testing.assert_allclose(np.asarray(project_exp_primal(v))[0], [-1, 0, 3], atol=1e-9)
    # polar cone: -> 0
    v = jnp.asarray([[1.0, -5.0, -10.0]], jnp.float64)
    out = np.asarray(project_exp_primal(v))[0]
    np.testing.assert_allclose(out, 0.0, atol=1e-7)


def test_exp_primal_general_feasible_and_optimal(rng):
    pts = rng.normal(size=(64, 3)) * 2.0
    out = np.asarray(project_exp_primal(jnp.asarray(pts, jnp.float64)))
    from scipy.optimize import minimize
    for k in range(0, 64, 7):  # oracle-check a subsample (slsqp is slow)
        p = out[k]
        assert _in_exp_cone(p, tol=1e-5), f"projection not in cone: {pts[k]} -> {p}"

        def obj(z):
            return np.sum((z - pts[k]) ** 2)

        cons = [{"type": "ineq", "fun": lambda z: z[1]},
                {"type": "ineq",
                 "fun": lambda z: z[2] - z[1] * np.exp(z[0] / max(z[1], 1e-9))}]
        ref = minimize(obj, np.maximum(pts[k], [0, 0.5, 0.5]), method="SLSQP",
                       constraints=cons,
                       options={"maxiter": 200, "ftol": 1e-12})
        if ref.success and _in_exp_cone(ref.x, 1e-5):
            assert obj(p) <= obj(ref.x) + 1e-4, (
                f"suboptimal projection at {pts[k]}: ours {obj(p)}, oracle {obj(ref.x)}"
            )


def test_exp_primal_multiroot_regression():
    """Points where the KKT residual G has SEVERAL roots on one branch:
    a single whole-branch bisection lands on a λ<0 (invalid) root and
    returns a feasible but suboptimal point.  The multi-bracket scan must
    find the valid root; oracle d² values were verified with SLSQP from
    many starts."""
    pts = np.array([
        [-0.66891234, 1.95006689, 1.16531048],
        [-0.1722013, 1.18620918, 0.68929045],
    ])
    d2_opt = np.array([0.0200935505711086, 0.0429971935234799])
    out = np.asarray(project_exp_primal(jnp.asarray(pts, jnp.float64)))
    d2 = np.sum((out - pts) ** 2, axis=1)
    np.testing.assert_allclose(d2, d2_opt, rtol=1e-10)


def test_exp_primal_kkt_fuzz(rng):
    """Every smooth-boundary projection must satisfy the normal-cone
    condition v − p = λ∇φ(p), λ ≥ 0 to near machine precision (the
    cancellation-free candidate forms keep this tight even as the
    projection approaches the z = 0 edge, where w = e^{x/y} → 0)."""
    V = rng.standard_normal((500, 3)) * np.array([2.0, 1.5, 2.0])
    P = np.asarray(project_exp_primal(jnp.asarray(V, jnp.float64)))
    checked = 0
    for v, p in zip(V, P):
        d = v - p
        if (np.linalg.norm(d) < 1e-9 or np.linalg.norm(p) < 1e-9
                or p[1] < 1e-9):
            continue  # interior / polar / ray-face cases
        u = p[0] / p[1]
        w = np.exp(np.clip(u, -200, 200))
        g = np.array([w, w * (1 - u), -1.0])
        lam = d @ g / (g @ g)
        resid = np.linalg.norm(d - lam * g) / (1 + np.linalg.norm(v))
        assert lam >= -1e-9, (v, p, lam)
        assert resid < 1e-10, (v, p, resid)
        checked += 1
    assert checked > 100  # the fuzz must actually exercise the boundary case


def test_exp_moreau_identity(rng):
    """v = Π_K(v) − Π_{K*}(−v) for the exponential cone pair."""
    pts = jnp.asarray(rng.normal(size=(128, 3)) * 3.0, jnp.float64)
    pk = np.asarray(project_exp_primal(pts))
    pd = np.asarray(project_exp_dual(-pts))
    np.testing.assert_allclose(pk - pd, np.asarray(pts), atol=2e-5)


def test_exp_dual_membership(rng):
    pts = jnp.asarray(rng.normal(size=(64, 3)) * 2.0, jnp.float64)
    out = np.asarray(project_exp_dual(pts))
    for p in out:
        u, s, w = p
        if u < -1e-8:
            assert -u * np.exp(s / u) <= np.e * w * (1 + 1e-5) + 1e-5
        else:
            assert u <= 1e-6 and s >= -1e-6 and w >= -1e-6


# --- ConeSet -----------------------------------------------------------------

def test_coneset_project_mixed(rng):
    dim = 14
    cones = [
        ConeConstraint(Cone.ZERO, [0, 1]),
        ConeConstraint(Cone.NON_NEG, [2, 3]),
        ConeConstraint(Cone.NON_POS, [4]),
        ConeConstraint(Cone.SOC, [5, 6, 7]),
        ConeConstraint(Cone.EXP_PRIMAL, [8, 9, 10]),
        # 11..13 free
    ]
    cs = ConeSet(cones, dim)
    v = jnp.asarray(rng.normal(size=dim) * 2, jnp.float64)
    out = np.asarray(cs.project(v))
    vn = np.asarray(v)
    assert out[0] == 0 and out[1] == 0
    assert out[2] >= 0 and out[3] >= 0
    assert out[4] <= 0
    assert np.linalg.norm(out[6:8]) <= out[5] + 1e-9
    assert _in_exp_cone(out[8:11], tol=1e-5)
    np.testing.assert_allclose(out[11:], vn[11:])  # free coords untouched


def test_coneset_validation():
    with pytest.raises(ValueError):
        validate_cones([ConeConstraint(Cone.NON_NEG, [0, 0])], 4)
    with pytest.raises(ValueError):
        validate_cones([ConeConstraint(Cone.NON_NEG, [5])], 4)
    with pytest.raises(ValueError):
        validate_cones([ConeConstraint(Cone.SDP, [0, 1, 2, 3])], 8)
    with pytest.raises(ValueError):
        validate_cones([ConeConstraint(Cone.EXP_PRIMAL, [0, 1])], 8)


def test_coneset_dual():
    cones = [
        ConeConstraint(Cone.ZERO, [0]),
        ConeConstraint(Cone.NON_NEG, [1]),
        ConeConstraint(Cone.EXP_PRIMAL, [2, 3, 4]),
    ]
    cs = ConeSet(cones, 5).dual()
    kinds = sorted(c.cone for c in cs.constraints)
    assert kinds == [Cone.NON_NEG, Cone.EXP_DUAL]  # zero cone dualizes to free


def test_coneset_moreau(rng):
    """Moreau over a whole mixed cone set: v = Π_K(v) − Π_{K*}(−v).

    Free coordinates belong to K only via 'no constraint' (their dual is
    {0}); restrict the check to constrained coordinates.
    """
    dim = 12
    cones = [
        ConeConstraint(Cone.NON_NEG, [0, 1, 2]),
        ConeConstraint(Cone.SOC, [3, 4, 5]),
        ConeConstraint(Cone.EXP_PRIMAL, [6, 7, 8]),
        ConeConstraint(Cone.NON_POS, [9, 10, 11]),
    ]
    cs = ConeSet(cones, dim)
    csd = cs.dual()
    v = jnp.asarray(rng.normal(size=dim) * 2, jnp.float64)
    lhs = np.asarray(cs.project(v)) - np.asarray(csd.project(-v))
    np.testing.assert_allclose(lhs, np.asarray(v), atol=2e-5)


def test_constrain_average(rng):
    cones = [
        ConeConstraint(Cone.SOC, [0, 1, 2]),
        ConeConstraint(Cone.NON_NEG, [3, 4]),
    ]
    cs = ConeSet(cones, 6)
    w = jnp.asarray([3.0, 6.0, 9.0, 1.0, 2.0, 7.0], jnp.float64)
    out = np.asarray(cs.constrain_average(w))
    np.testing.assert_allclose(out[:3], 6.0)       # averaged within SOC
    np.testing.assert_allclose(out[3:], [1, 2, 7])  # separable untouched
