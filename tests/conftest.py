"""Test harness config: CPU backend with 8 virtual devices (simulates a
multi-chip mesh, per SURVEY.md §4), float64 enabled for math oracles."""

import os

# Force the CPU backend (the ambient env may point at a TPU): tests simulate
# an 8-device mesh on host CPU, per the multi-chip test strategy.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# A TPU-tunnel plugin (if present) registers itself at interpreter boot and
# overrides platform selection via jax.config — override it back.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: the suite is compile-dominated (~9 min of
# mostly jit compiles); repeat runs reuse compiled executables.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """XLA-CPU segfault mitigation (see tests/README note in conftest):
    with the full 300+-test suite in one process, late sparse (BCOO)
    solves segfault inside compiled executables — an accumulated-state
    issue in the CPU runtime (crash site moves with suite composition;
    subsets always pass; memory is plentiful).  Dropping executable
    references between modules keeps the live-program count bounded.
    The persistent compilation cache makes the recompiles cheap."""
    yield
    import pogs_tpu.solver.graph as _g
    import pogs_tpu.solver.cone as _c
    import pogs_tpu.parallel.batch as _b

    _g._SOLVE_CACHE.clear()
    _g._INIT_CACHE.clear()
    _c._CONE_SOLVE_CACHE.clear()
    _c._CONE_INIT_CACHE.clear()
    _b._BATCH_CACHE.clear()
    _b._CONE_BATCH_CACHE.clear()
    jax.clear_caches()
