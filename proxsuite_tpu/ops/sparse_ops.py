"""Sparse-matrix primitives for the matrix-free backend (BCOO).

TPU-first counterpart of the reference's CSC kernels
(/root/reference/include/proxsuite/linalg/sparse/core.hpp and
proxqp/sparse/utils.hpp:261-330 noalias_gevmmv_add / noalias_symhiv_add):
instead of pointer-chasing CSC loops, problems are stored as
`jax.experimental.sparse.BCOO` (static nse, static shapes) whose matvecs
lower to XLA gather/segment ops -- jittable, vmappable, differentiable.
Scaling and norm reductions operate directly on (data, indices), so the
Ruiz loop can carry sparse operands through `lax.while_loop` with a fixed
pytree structure.

The reference's sparse LDLT (factorize.hpp/rowmod.hpp/update.hpp) is
deliberately NOT ported: scatter-heavy supernodal factorization is
TPU-hostile (SURVEY.md section 7 "lead with the matrix-free path"); large
sparse problems go through MINRES on the masked KKT operator instead,
exactly like the reference's own SparseBackend::MatrixFree fallback for
factors above 1e7 nonzeros (sparse/workspace.hpp:318).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import sparse as jsparse

BCOO = jsparse.BCOO


def from_any(M, shape=None, dtype=None) -> BCOO:
    """Convert scipy.sparse / dense / BCOO input to a canonical BCOO."""
    if isinstance(M, BCOO):
        return M if dtype is None else BCOO(
            (M.data.astype(dtype), M.indices), shape=M.shape)
    if hasattr(M, "tocoo"):  # scipy.sparse
        coo = M.tocoo()
        data = jnp.asarray(coo.data, dtype)
        idx = jnp.stack([jnp.asarray(coo.row, jnp.int32),
                         jnp.asarray(coo.col, jnp.int32)], axis=1)
        return BCOO((data, idx), shape=M.shape)
    M = np.asarray(M)
    return BCOO.fromdense(jnp.asarray(M, dtype))


def col_max_abs(M: BCOO) -> jax.Array:
    """Per-column infinity norm of a BCOO matrix."""
    ncols = M.shape[1]
    if M.nse == 0 or M.shape[0] == 0:
        return jnp.zeros((ncols,), M.dtype)
    return jax.ops.segment_max(
        jnp.abs(M.data), M.indices[:, 1], num_segments=ncols,
        indices_are_sorted=False).clip(0.0)


def row_max_abs(M: BCOO) -> jax.Array:
    nrows = M.shape[0]
    if M.nse == 0 or M.shape[1] == 0:
        return jnp.zeros((nrows,), M.dtype)
    return jax.ops.segment_max(
        jnp.abs(M.data), M.indices[:, 0], num_segments=nrows,
        indices_are_sorted=False).clip(0.0)


def scale_rows_cols(M: BCOO, d_row: jax.Array, d_col: jax.Array) -> BCOO:
    """diag(d_row) @ M @ diag(d_col) without changing the pattern."""
    data = M.data * d_row[M.indices[:, 0]] * d_col[M.indices[:, 1]]
    return BCOO((data, M.indices), shape=M.shape)


def scale_data(M: BCOO, s) -> BCOO:
    return BCOO((M.data * s, M.indices), shape=M.shape)


def diag_of(M: BCOO) -> jax.Array:
    """Dense diagonal of a square BCOO matrix."""
    n = M.shape[0]
    on_diag = M.indices[:, 0] == M.indices[:, 1]
    return jax.ops.segment_sum(
        jnp.where(on_diag, M.data, 0.0), M.indices[:, 0], num_segments=n)


def density(M) -> float:
    """nnz / size of a scipy/BCOO/dense matrix (host-side, for policy)."""
    size = M.shape[0] * M.shape[1]
    if size == 0:
        return 0.0
    if isinstance(M, BCOO):
        return M.nse / size
    if hasattr(M, "nnz"):
        return M.nnz / size
    return float(np.count_nonzero(np.asarray(M))) / size
