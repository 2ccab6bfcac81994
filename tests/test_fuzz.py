"""Randomized cross-implementation sweep: JAX solver vs native C++ runtime.

Both implement the same algorithm with the same constants; on random
problems with random objective mixes their optimal values must agree.
This is the widest-net correctness test — any prox/scaling/loop bug that
affects one implementation shows up as a value mismatch.
"""

import numpy as np
import pytest

from pogs_tpu.types import Function, FunctionVector, Status
from pogs_tpu.api.graph import solve_graph_form

G_POOL = [Function.ABS, Function.SQUARE, Function.HUBER, Function.INDBOX01,
          Function.INDGE0, Function.INDLE0, Function.MAXPOS0,
          Function.MAXNEG0, Function.ZERO]
F_POOL = [Function.SQUARE, Function.HUBER, Function.LOGISTIC, Function.ABS]


@pytest.fixture(scope="module")
def native():
    from pogs_tpu import native as nat

    if not nat.is_available():
        try:
            nat.build()
        except Exception as exc:
            pytest.skip(f"native unavailable: {exc}")
    return nat


@pytest.mark.parametrize("seed", range(12))
def test_random_problem_jax_vs_native(native, seed):
    rng = np.random.default_rng(seed)
    m = int(rng.integers(15, 60))
    n = int(rng.integers(5, 40))
    A = rng.standard_normal((m, n))
    b = rng.standard_normal(m)

    h_f = rng.choice([int(t) for t in F_POOL], m).astype(np.int32)
    h_g = rng.choice([int(t) for t in G_POOL], n).astype(np.int32)
    # Random parameters; e > 0 on g keeps every mix bounded.
    sign = rng.choice([-1.0, 1.0], m)
    f = FunctionVector(h_f, a=sign * rng.uniform(0.5, 1.5, m), b=b,
                       c=rng.uniform(0.3, 2.0, m))
    g = FunctionVector(h_g, b=rng.uniform(-0.5, 0.5, n),
                       c=rng.uniform(0.3, 2.0, n), e=0.1)

    out_jax = solve_graph_form(A, f, g, abs_tol=1e-6, rel_tol=1e-6,
                               max_iter=20000, dtype="float64",
                               gap_stop=False)
    out_nat = native.solve_graph_native(A, f, g, abs_tol=1e-6, rel_tol=1e-6,
                                        max_iter=20000)
    assert out_jax["status"] == int(Status.SUCCESS), f"jax failed seed {seed}"
    assert out_nat["status"] == Status.SUCCESS, f"native failed seed {seed}"
    scale = 1.0 + abs(out_jax["optval"])
    assert abs(out_jax["optval"] - out_nat["optval"]) <= 2e-3 * scale, (
        f"seed {seed}: jax {out_jax['optval']:.6f} "
        f"vs native {out_nat['optval']:.6f}"
    )
