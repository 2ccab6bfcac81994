"""Checkpoint / resume for solver state (SURVEY.md §5.4).

The reference keeps warm-start state only in memory (SetInitX /
SetInitLambda, reference src/include/pogs.h:112-119; implicit carry-over
src/cpu/pogs.cpp:573).  Because our solver state is an explicit pytree, it
serializes trivially — long λ-paths, preemptible jobs, and cross-process
warm starts just work.

The checkpoint stores the ADMM iterate (z, zt), the adapted rho, and a
fingerprint of the problem matrix so a resume against a different A is
rejected instead of silently mis-warm-starting.
"""

from __future__ import annotations

import hashlib
from pathlib import Path
from typing import Union

import numpy as np


def _fingerprint(A) -> str:
    h = hashlib.sha256()
    h.update(str(A.shape).encode())
    if hasattr(A, "M"):  # SparseMatrix operator: hash the BCOO buffers
        h.update(np.asarray(A.M.data, np.float32).tobytes())
        h.update(np.asarray(A.M.indices, np.int32).tobytes())
    else:
        arr = A.dense() if hasattr(A, "dense") else A
        h.update(np.ascontiguousarray(np.asarray(arr, np.float32)).tobytes())
    return h.hexdigest()[:16]


def save_state(solver, path: Union[str, Path]) -> None:
    """Serialize a GraphFormSolver's warm-start state to ``path`` (.npz)."""
    if solver._z is None:
        raise ValueError("solver has no state to checkpoint (no solve yet)")
    np.savez(
        Path(path),
        z=np.asarray(solver._z),
        zt=np.asarray(solver._zt),
        rho=np.asarray(solver.rho),
        fingerprint=np.asarray(_fingerprint(solver.A)),
        shape=np.asarray([solver.m, solver.n]),
    )


def load_state(solver, path: Union[str, Path], strict: bool = True):
    """Restore warm-start state saved by :func:`save_state`.

    With ``strict`` (default) the checkpoint must match the solver's matrix
    fingerprint; set False to warm-start a *similar* problem (same shape).
    """
    import jax.numpy as jnp

    data = np.load(Path(path), allow_pickle=False)
    m, n = (int(v) for v in data["shape"])
    if (m, n) != (solver.m, solver.n):
        raise ValueError(
            f"checkpoint shape {(m, n)} != solver shape {(solver.m, solver.n)}"
        )
    if strict:
        fp = _fingerprint(solver.A)
        if str(data["fingerprint"]) != fp:
            raise ValueError(
                "checkpoint was created for a different matrix "
                "(pass strict=False to warm-start anyway)"
            )
    solver._z = jnp.asarray(data["z"], solver.dtype)
    solver._zt = jnp.asarray(data["zt"], solver.dtype)
    solver.rho = float(data["rho"])
    return solver
