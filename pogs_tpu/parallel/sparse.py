"""Row-block-sharded sparse operator (BASELINE config 5: cone-form
LP/SOCP with row-sharded *sparse* A).

GSPMD propagates shardings through dense matmuls for free, but a BCOO
matvec lowers to gather + segment-sum over a GLOBAL index array — the
compiler cannot split that by rows.  So the distributed sparse plan is
explicit, mirroring the dense row plan (parallel/mesh.py:7-20) with
``shard_map``:

  * storage      — per-shard local COO blocks with UNIFORM padded nnz:
                   ``data/rows/cols`` of shape (R, nnz_max), the leading
                   axis sharded over the mesh's row axis; ``rows`` hold
                   shard-LOCAL row ids (the reference stores one global
                   CSR+CSC pair on a single node, matrix_sparse.cpp:97-128)
  * ``A @ x``    — local gather+segment-sum, y stays row-sharded (no comms)
  * ``Aᵀ @ y``   — local scatter-accumulate + one psum over the row axis
  * equilibration scaling — purely local (d is row-sharded, e replicated)

The operator satisfies the same mv/rmv/sq_mv/sq_rmv/scale/frob2 contract
as DenseMatrix/SparseMatrix (linalg/matrix.py), so the CGLS projector and
the HSDE 'cg' strategy run on it unchanged — the cone solver never knows
the matrix is distributed.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8 top-level API; the experimental path is deprecated
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


@jax.tree_util.register_pytree_node_class
class ShardedSparseMatrix:
    """Sparse operator stored as R row blocks over a named mesh axis."""

    def __init__(self, data, rows, cols, shape, mesh: Mesh, axis: str):
        self.data = data    # (R, nnz_max) values, zero-padded
        self.rows = rows    # (R, nnz_max) LOCAL row ids (int32)
        self.cols = cols    # (R, nnz_max) column ids (int32)
        self._shape = tuple(shape)
        self.mesh = mesh
        self.axis = axis

    # pytree protocol -------------------------------------------------------
    def tree_flatten(self):
        return (self.data, self.rows, self.cols), (
            self._shape, self.mesh, self.axis)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.data, obj.rows, obj.cols = children
        obj._shape, obj.mesh, obj.axis = aux
        return obj

    # operator contract -----------------------------------------------------
    @property
    def shape(self):
        return self._shape

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def is_sparse(self):
        return True

    @property
    def _m_local(self):
        return self._shape[0] // self.mesh.shape[self.axis]

    def _specs3(self):
        return (P(self.axis, None),) * 3

    def _mv_with(self, data, x):
        m_local = self._m_local

        def local(d, r, c, xx):
            vals = d[0] * xx[c[0]]
            return jax.ops.segment_sum(vals, r[0], num_segments=m_local)

        return shard_map(
            local, mesh=self.mesh,
            in_specs=self._specs3() + (P(),),
            out_specs=P(self.axis),
        )(data, self.rows, self.cols, x)

    def _rmv_with(self, data, y):
        n = self._shape[1]
        ax = self.axis

        def local(d, r, c, yy):
            vals = d[0] * yy[r[0]]
            out = jax.ops.segment_sum(vals, c[0], num_segments=n)
            return jax.lax.psum(out, ax)

        return shard_map(
            local, mesh=self.mesh,
            in_specs=self._specs3() + (P(ax),),
            out_specs=P(),
        )(data, self.rows, self.cols, y)

    def mv(self, x):
        return self._mv_with(self.data, x)

    def rmv(self, y):
        return self._rmv_with(self.data, y)

    def sq_mv(self, v):
        return self._mv_with(self.data * self.data, v)

    def sq_rmv(self, v):
        return self._rmv_with(self.data * self.data, v)

    def scale(self, d, e) -> "ShardedSparseMatrix":
        ax = self.axis

        def local(dat, r, c, dd, ee):
            return dat * (dd[r[0]] * ee[c[0]])[None, :]

        new_data = shard_map(
            local, mesh=self.mesh,
            in_specs=self._specs3() + (P(ax), P()),
            out_specs=P(ax, None),
        )(self.data, self.rows, self.cols, d, e)
        return ShardedSparseMatrix(new_data, self.rows, self.cols,
                                   self._shape, self.mesh, self.axis)

    def scalar_mul(self, s) -> "ShardedSparseMatrix":
        return ShardedSparseMatrix(self.data * s, self.rows, self.cols,
                                   self._shape, self.mesh, self.axis)

    def frob2(self):
        return jnp.sum(self.data * self.data)


def shard_sparse(
    A, mesh: Mesh, axis: str = "rows", dtype=None
) -> Tuple[ShardedSparseMatrix, int]:
    """Partition a scipy sparse matrix into row blocks on ``mesh[axis]``.

    Rows are zero-padded to a multiple of the shard count and every block
    is padded to a common nnz (zero entries are inert in all contracted
    ops).  Returns (operator, m_original) — callers pad b and add the
    padded rows to a Zero cone via :func:`pad_cone_rows`.
    """
    import scipy.sparse as sp

    R = int(mesh.shape[axis])
    A = sp.csr_matrix(A)
    m, n = A.shape
    m_pad = (-m) % R
    if m_pad:
        A = sp.vstack([A, sp.csr_matrix((m_pad, n))]).tocsr()
    m_tot = m + m_pad
    m_local = m_tot // R
    blocks = [A[i * m_local:(i + 1) * m_local].tocoo() for i in range(R)]
    nnz_max = max(max((blk.nnz for blk in blocks), default=1), 1)
    npdt = np.dtype(dtype) if dtype is not None else np.float64
    data = np.zeros((R, nnz_max), npdt)
    rows = np.zeros((R, nnz_max), np.int32)
    cols = np.zeros((R, nnz_max), np.int32)
    for i, blk in enumerate(blocks):
        data[i, : blk.nnz] = blk.data
        rows[i, : blk.nnz] = blk.row
        cols[i, : blk.nnz] = blk.col
    sh = NamedSharding(mesh, P(axis, None))
    return (
        ShardedSparseMatrix(
            jax.device_put(jnp.asarray(data), sh),
            jax.device_put(jnp.asarray(rows), sh),
            jax.device_put(jnp.asarray(cols), sh),
            (m_tot, n), mesh, axis,
        ),
        m,
    )


def pad_cone_rows(b, cones, m_tot: int):
    """Extend (b, K_y) over padded zero rows: b_pad = 0 on a Zero cone
    (0 − 0·x = 0 ∈ {0}, so padding never affects the solution)."""
    from pogs_tpu.types import Cone, ConeConstraint

    m = len(b)
    if m_tot == m:
        return np.asarray(b), list(cones)
    b_pad = np.zeros(m_tot, np.asarray(b).dtype)
    b_pad[:m] = np.asarray(b)
    return b_pad, list(cones) + [
        ConeConstraint(Cone.ZERO, range(m, m_tot))
    ]
