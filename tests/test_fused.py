"""Fused VMEM-resident ADMM kernel vs the XLA while_loop — exact parity.

The Pallas kernel (pogs_tpu/ops/fused_admm.py) implements the identical
algorithm, so on the same inputs it must reproduce the XLA loop's iterate
trajectory: same iteration count, same status, optval/x to f32 roundoff.
Runs in interpreter mode on the CPU backend.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from pogs_tpu.types import Function, FunctionVector, SolverSettings
from pogs_tpu.prox.vector import prox_eval, func_eval, scale_f, scale_g
from pogs_tpu.linalg.equil import equilibrate
from pogs_tpu.linalg.norm import norm2_est
from pogs_tpu.projector.direct import DirectProjector
from pogs_tpu.solver.admm import admm_loop
from pogs_tpu.ops.fused_admm import fused_admm_loop, fused_admm_eligible


def _both_solve(A, f, g, settings):
    """Run the XLA loop and the fused kernel on identical scaled inputs."""
    m, n = A.shape
    dt = A.dtype
    eq = equilibrate(A)
    nA = norm2_est(eq.A)
    proj = DirectProjector()
    fac = proj.init(eq.A, s=1.0)
    f_s = scale_f(f, eq.d)
    g_s = scale_g(g, eq.e)
    z0 = jnp.zeros((m + n,), dt)

    def prox_fn(x_in, y_in, rho):
        return prox_eval(g_s, x_in, rho), prox_eval(f_s, y_in, rho)

    def eval_fn(x12, y12):
        return func_eval(f_s, y12) + func_eval(g_s, x12)

    def project_fn(px, py, tol, xw):
        return proj.project(eq.A, fac, px, py, tol, xw)

    ref = admm_loop(eq.A, nA, eq.d, eq.e, prox_fn, eval_fn, project_fn,
                    settings, z0, z0, jnp.asarray(1.0, dt))
    fus = fused_admm_loop(
        eq.A, fac["op"], nA,
        f.h, tuple(jnp.asarray(p, dt) for p in f_s.params),
        g.h, tuple(jnp.asarray(p, dt) for p in g_s.params),
        settings, z0, z0, 1.0, interpret=True,
    )
    return ref, fus


def _assert_match(ref, fus, atol=2e-5):
    assert int(ref["final_iter"]) == int(fus["final_iter"])
    assert int(ref["status"]) == int(fus["status"])
    assert float(fus["optval"]) == pytest.approx(float(ref["optval"]), rel=1e-4)
    np.testing.assert_allclose(
        np.asarray(ref["x12"]), np.asarray(fus["x12"]), atol=atol
    )
    np.testing.assert_allclose(
        np.asarray(ref["z"]), np.asarray(fus["z"]), atol=atol
    )


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def _rand_problem(rng, m, n, dtype=jnp.float32):
    A = jnp.asarray(rng.standard_normal((m, n)), dtype)
    b = rng.standard_normal(m)
    return A, b


def test_fused_matches_xla_lasso_tall(rng):
    A, b = _rand_problem(rng, 60, 40)
    f = FunctionVector(Function.SQUARE, 60, b=b, dtype=jnp.float32)
    g = FunctionVector(Function.ABS, 40, c=0.5, dtype=jnp.float32)
    ref, fus = _both_solve(A, f, g, SolverSettings(max_iter=400))
    _assert_match(ref, fus)


def test_fused_matches_xla_wide(rng):
    A, b = _rand_problem(rng, 30, 70)
    f = FunctionVector(Function.SQUARE, 30, b=b, dtype=jnp.float32)
    g = FunctionVector(Function.ABS, 70, c=0.3, dtype=jnp.float32)
    ref, fus = _both_solve(A, f, g, SolverSettings(max_iter=400))
    _assert_match(ref, fus)


def test_fused_matches_xla_logistic(rng):
    m, n = 50, 20
    A = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
    labels = np.sign(rng.standard_normal(m))
    f = FunctionVector(Function.LOGISTIC, m, a=-labels, dtype=jnp.float32)
    g = FunctionVector(Function.ABS, n, c=0.2, dtype=jnp.float32)
    ref, fus = _both_solve(A, f, g, SolverSettings(max_iter=400))
    _assert_match(ref, fus, atol=5e-5)


def test_fused_matches_xla_nonneg_gapstop(rng):
    A, b = _rand_problem(rng, 40, 25)
    f = FunctionVector(Function.SQUARE, 40, b=b, dtype=jnp.float32)
    g = FunctionVector(Function.INDGE0, 25, dtype=jnp.float32)
    st = SolverSettings(max_iter=400, gap_stop=True)
    ref, fus = _both_solve(A, f, g, st)
    _assert_match(ref, fus)


def test_fused_max_iter_status(rng):
    A, b = _rand_problem(rng, 40, 25)
    f = FunctionVector(Function.SQUARE, 40, b=b, dtype=jnp.float32)
    g = FunctionVector(Function.ABS, 25, c=0.5, dtype=jnp.float32)
    st = SolverSettings(max_iter=5)
    ref, fus = _both_solve(A, f, g, st)
    _assert_match(ref, fus)
    assert int(fus["status"]) != 0  # MAX_ITER


def test_fused_eligibility():
    st = SolverSettings()
    assert fused_admm_eligible(500, 300, jnp.float32, st)
    assert not fused_admm_eligible(20000, 5000, jnp.float32, st)
    assert not fused_admm_eligible(100, 50, jnp.float32,
                                   st.replace(use_anderson=True))
    assert not fused_admm_eligible(100, 50, jnp.float32,
                                   st.replace(use_exact_tol=True))


def test_fused_via_solver_front_end(rng):
    """use_fused=True forces the fused path through GraphFormSolver."""
    from pogs_tpu.solver.graph import GraphFormSolver
    from pogs_tpu.types import Status

    A, b = _rand_problem(rng, 48, 32)
    f = FunctionVector(Function.SQUARE, 48, b=b, dtype=jnp.float32)
    g = FunctionVector(Function.ABS, 32, c=0.4, dtype=jnp.float32)
    st = SolverSettings(use_fused=True, max_iter=500)
    res_f = GraphFormSolver(A, dtype=jnp.float32, settings=st).solve(f, g)
    res_x = GraphFormSolver(
        A, dtype=jnp.float32, settings=st.replace(use_fused=False)
    ).solve(f, g)
    assert res_f.status == Status.SUCCESS
    assert int(res_f.final_iter) == int(res_x.final_iter)
    assert float(res_f.optval) == pytest.approx(float(res_x.optval), rel=1e-4)
    np.testing.assert_allclose(
        np.asarray(res_f.x), np.asarray(res_x.x), atol=5e-5
    )


def test_fused_warm_start_lambda_path(rng):
    """Warm-started repeat solves through the fused path match the XLA
    path (has_warm=True plumbs z0/zt0 into the kernel)."""
    from pogs_tpu.solver.graph import GraphFormSolver
    from pogs_tpu.types import Status

    A, b = _rand_problem(rng, 40, 24)
    f = FunctionVector(Function.SQUARE, 40, b=b, dtype=jnp.float32)
    st = SolverSettings(max_iter=600)
    iters = {}
    for label, uf in (("fused", True), ("xla", False)):
        solver = GraphFormSolver(A, dtype=jnp.float32,
                                 settings=st.replace(use_fused=uf))
        seq = []
        for frac in (1.0, 0.7, 0.5):
            g = FunctionVector(Function.ABS, 24, c=frac * 0.6,
                               dtype=jnp.float32)
            res = solver.solve(f, g)
            assert res.status == Status.SUCCESS
            seq.append(int(res.final_iter))
        iters[label] = seq
    assert iters["fused"] == iters["xla"]
    # Warm-started continuation converges faster than the cold solve.
    assert min(iters["fused"][1:]) <= iters["fused"][0]


def test_fused_batched_sweep_matches_vmap():
    """Chunked batched fused kernel (ops/fused_admm_batch.py) through the
    batched_graph_solve front end: lane-for-lane trajectory parity with
    the vmapped XLA loop (iterations + statuses identical)."""
    from pogs_tpu.parallel.batch import batched_graph_solve

    rng = np.random.default_rng(0)
    m, n, K = 100, 60, 10
    A = rng.standard_normal((m, n)).astype(np.float32)
    b = rng.standard_normal(m).astype(np.float32)
    lam_max = float(np.max(np.abs(A.T @ b)))
    lambdas = (np.geomspace(0.5, 0.1, K) * lam_max).astype(np.float32)
    f = FunctionVector(Function.SQUARE, m, b=b, dtype=jnp.float32)
    g = FunctionVector(Function.ABS, n, dtype=jnp.float32)
    st_x = SolverSettings(abs_tol=1e-4, rel_tol=1e-3, gap_stop=False,
                          use_fused=False)
    st_f = SolverSettings(abs_tol=1e-4, rel_tol=1e-3, gap_stop=False,
                          use_fused=True)
    ref = batched_graph_solve(A, f, g, lambdas, settings=st_x)
    fus = batched_graph_solve(A, f, g, lambdas, settings=st_f)
    np.testing.assert_array_equal(np.asarray(ref["iterations"]),
                                  np.asarray(fus["iterations"]))
    np.testing.assert_array_equal(np.asarray(ref["status"]),
                                  np.asarray(fus["status"]))
    np.testing.assert_allclose(np.asarray(fus["x"]), np.asarray(ref["x"]),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(fus["optval"]),
                               np.asarray(ref["optval"]), rtol=1e-3)


def test_fused_batched_chunk_padding():
    """K not a multiple of the chunk size: padded lanes are dropped and
    real lanes still match the XLA path."""
    from pogs_tpu.ops.fused_admm_batch import batched_chunk_for
    from pogs_tpu.parallel.batch import batched_graph_solve

    rng = np.random.default_rng(3)
    m, n, K = 60, 40, 5  # chunk will be > K -> single padded chunk
    assert batched_chunk_for(m, n, jnp.float32) >= 8
    A = rng.standard_normal((m, n)).astype(np.float32)
    b = rng.standard_normal(m).astype(np.float32)
    lambdas = np.linspace(1.0, 0.2, K).astype(np.float32)
    f = FunctionVector(Function.SQUARE, m, b=b, dtype=jnp.float32)
    g = FunctionVector(Function.ABS, n, dtype=jnp.float32)
    st_x = SolverSettings(abs_tol=1e-4, rel_tol=1e-3, gap_stop=False,
                          use_fused=False)
    st_f = SolverSettings(abs_tol=1e-4, rel_tol=1e-3, gap_stop=False,
                          use_fused=True)
    ref = batched_graph_solve(A, f, g, lambdas, settings=st_x)
    fus = batched_graph_solve(A, f, g, lambdas, settings=st_f)
    assert np.asarray(fus["x"]).shape == (K, n)
    np.testing.assert_array_equal(np.asarray(ref["iterations"]),
                                  np.asarray(fus["iterations"]))
    np.testing.assert_allclose(np.asarray(fus["optval"]),
                               np.asarray(ref["optval"]), rtol=1e-3)


def test_fused_batched_wide_matrix():
    """Wide (m < n) chunked batched kernel takes the Woodbury branch —
    parity with the vmapped XLA loop."""
    from pogs_tpu.parallel.batch import batched_graph_solve

    rng = np.random.default_rng(11)
    m, n, K = 40, 90, 6
    A = rng.standard_normal((m, n)).astype(np.float32)
    b = rng.standard_normal(m).astype(np.float32)
    lam_max = float(np.max(np.abs(A.T @ b)))
    lambdas = (np.geomspace(0.6, 0.2, K) * lam_max).astype(np.float32)
    f = FunctionVector(Function.SQUARE, m, b=b, dtype=jnp.float32)
    g = FunctionVector(Function.ABS, n, dtype=jnp.float32)
    st_x = SolverSettings(abs_tol=1e-4, rel_tol=1e-3, gap_stop=False,
                          use_fused=False)
    st_f = SolverSettings(abs_tol=1e-4, rel_tol=1e-3, gap_stop=False,
                          use_fused=True)
    ref = batched_graph_solve(A, f, g, lambdas, settings=st_x)
    fus = batched_graph_solve(A, f, g, lambdas, settings=st_f)
    np.testing.assert_array_equal(np.asarray(ref["iterations"]),
                                  np.asarray(fus["iterations"]))
    np.testing.assert_array_equal(np.asarray(ref["status"]),
                                  np.asarray(fus["status"]))
    np.testing.assert_allclose(np.asarray(fus["optval"]),
                               np.asarray(ref["optval"]), rtol=2e-3)


def test_fused_batched_instant_convergence_optval():
    """Regression (self-review): a lane converging at k=0 must report the
    objective of its FIRING iterate, not the 0.0 carry initializer —
    λ ≥ λ_max drives x* = 0 and converges immediately."""
    from pogs_tpu.parallel.batch import batched_graph_solve

    rng = np.random.default_rng(21)
    m, n, K = 60, 40, 8
    A = rng.standard_normal((m, n)).astype(np.float32)
    b = rng.standard_normal(m).astype(np.float32)
    lam_max = float(np.max(np.abs(A.T @ b)))
    # First lanes far above λ_max (instant x*=0 convergence), rest normal.
    lambdas = np.array([10 * lam_max, 5 * lam_max] +
                       list(np.geomspace(0.5, 0.1, K - 2) * lam_max),
                       np.float32)
    f = FunctionVector(Function.SQUARE, m, b=b, dtype=jnp.float32)
    g = FunctionVector(Function.ABS, n, dtype=jnp.float32)
    st_x = SolverSettings(abs_tol=1e-4, rel_tol=1e-3, gap_stop=False,
                          use_fused=False)
    st_f = SolverSettings(abs_tol=1e-4, rel_tol=1e-3, gap_stop=False,
                          use_fused=True)
    ref = batched_graph_solve(A, f, g, lambdas, settings=st_x)
    fus = batched_graph_solve(A, f, g, lambdas, settings=st_f)
    np.testing.assert_array_equal(np.asarray(ref["iterations"]),
                                  np.asarray(fus["iterations"]))
    np.testing.assert_allclose(np.asarray(fus["optval"]),
                               np.asarray(ref["optval"]), rtol=2e-3,
                               atol=1e-4)
    assert float(np.asarray(fus["optval"])[0]) > 0.1  # not the 0.0 initializer


def test_fused_warm_path_matches_xla_scan():
    """Warm-started scan path through the fused kernel == the XLA-loop
    scan, step for step (same warm-start carries)."""
    from pogs_tpu.parallel.batch import solve_lasso_path

    rng = np.random.default_rng(7)
    m, n, K = 100, 60, 12
    A = rng.standard_normal((m, n)).astype(np.float32)
    b = rng.standard_normal(m).astype(np.float32)
    lam_max = float(np.max(np.abs(A.T @ b)))
    lambdas = (np.geomspace(0.5, 0.05, K) * lam_max).astype(np.float32)
    st_x = SolverSettings(abs_tol=1e-5, rel_tol=1e-5, use_fused=False)
    st_f = SolverSettings(abs_tol=1e-5, rel_tol=1e-5, use_fused=True)
    xla = solve_lasso_path(A, b, lambdas, settings=st_x, warm=True)
    fus = solve_lasso_path(A, b, lambdas, settings=st_f, warm=True)
    np.testing.assert_array_equal(np.asarray(xla["iterations"]),
                                  np.asarray(fus["iterations"]))
    assert bool(jnp.all(fus["status"] == 0))
    np.testing.assert_allclose(np.asarray(fus["optval"]),
                               np.asarray(xla["optval"]), rtol=1e-3)


def test_fused_batched_multi_rhs():
    """Per-lane f.b (multi-right-hand-side) through the chunked fused
    kernel — and combined with a per-lane λ ladder."""
    from pogs_tpu.parallel.batch import batched_graph_solve

    rng = np.random.default_rng(3)
    m, n, K = 40, 20, 6
    A = rng.standard_normal((m, n)).astype(np.float32)
    B = rng.standard_normal((K, m)).astype(np.float32)
    f = FunctionVector(Function.SQUARE, m, dtype=jnp.float32)
    g = FunctionVector(Function.ABS, n, c=0.3, dtype=jnp.float32)
    st_x = SolverSettings(abs_tol=1e-5, rel_tol=1e-5, use_fused=False)
    st_f = SolverSettings(abs_tol=1e-5, rel_tol=1e-5, use_fused=True)
    for kw in ({"f_b_batch": B},
               {"f_b_batch": B,
                "g_c_batch": np.linspace(0.5, 0.1, K).astype(np.float32)}):
        ref = batched_graph_solve(A, f, g, settings=st_x, **kw)
        fus = batched_graph_solve(A, f, g, settings=st_f, **kw)
        np.testing.assert_array_equal(np.asarray(ref["iterations"]),
                                      np.asarray(fus["iterations"]))
        np.testing.assert_array_equal(np.asarray(ref["status"]),
                                      np.asarray(fus["status"]))
        np.testing.assert_allclose(np.asarray(fus["optval"]),
                                   np.asarray(ref["optval"]), rtol=1e-3)


def test_fused_batch_eligibility():
    """Auto-selection predicate for the chunked batched kernel: pin the
    accept/reject matrix so a silent fall-through to the 2x-slower
    vmapped path cannot sneak in."""
    from pogs_tpu.parallel.batch import _fused_batch_eligible

    st = SolverSettings(use_fused=True)  # force: backend-independent
    ok = lambda **kw: _fused_batch_eligible(
        kw.pop("m", 100), kw.pop("n", 60), kw.pop("dt", jnp.float32),
        kw.pop("st", st), kw.pop("mesh", None),
        kw.pop("c_kind", "lane_scalar"), kw.pop("e_kind", "shared"),
        kw.pop("fb_kind", "shared"))

    assert ok()                                     # λ-sweep
    assert ok(c_kind="lane_vec")
    assert ok(c_kind="shared", fb_kind="lane_vec")  # multi-RHS
    assert not ok(c_kind="shared")                  # nothing varies
    assert not ok(e_kind="lane_vec")                # e sweeps unsupported
    assert not ok(dt=jnp.float64)                   # f32 only
    assert not ok(st=SolverSettings(use_fused=True, use_anderson=True))
    assert not ok(st=SolverSettings(use_fused=False))
    assert not ok(m=4000, n=4000)                   # over VMEM budget
