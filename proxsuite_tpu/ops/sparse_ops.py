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


def exact_matvec_bcoo(M: BCOO, x: jax.Array):
    """M @ x to double-float precision for BCOO M.

    Sparse counterpart of ops/df.py exact_matvec (high-accuracy mode,
    reference anchor sparse/solver.hpp:342 — the reference's f64 accuracy
    is backend-independent). Per-element products are made exact with
    two_prod; the per-row reductions are made exact by splitting the
    products onto per-row power-of-two grids (Ozaki-style): each 12-bit
    piece is an integer multiple of its row grid, so its segment_sum is
    EXACT for rows with up to 2^12 nonzeros, and four pieces push the
    unsummed remainder below ~2^-48 of the row magnitude — the same
    floor as the dense exact_matvec. Cost: 6 segment_sums + 1
    segment_max instead of 1 segment_sum.
    """
    from .df import df_sum_terms, two_prod

    m = M.shape[0]
    dtype = M.dtype
    if M.nse == 0 or m == 0:
        z = jnp.zeros((m,), dtype)
        return z, z
    rows = M.indices[:, 0]
    p, e = two_prod(M.data, x[M.indices[:, 1]])
    # per-row power-of-two grid from the product magnitudes
    pmax = jax.ops.segment_max(jnp.abs(p), rows, num_segments=m).clip(0.0)
    # exact power-of-two grid via ldexp (jnp.exp2 is off-grid in f32,
    # see ops/df.py _pow2_grid)
    safe = jnp.where(pmax > 0, pmax, 1.0)
    # exponent clamped so grid_k = sigma * 2^-48 never underflows to 0
    # (a denormal sigma makes round(R / grid) divide by zero -> NaN)
    sigma = jnp.ldexp(jnp.ones_like(safe),
                      jnp.clip(jnp.ceil(jnp.log2(safe)),
                               -70, None).astype(jnp.int32))
    sig_e = sigma.astype(dtype)[rows]
    piece_bits = 12
    terms = []
    R = p
    for k in range(1, 5):
        grid = sig_e * (2.0 ** (-k * piece_bits))
        q = jnp.round(R / grid) * grid
        terms.append(jax.ops.segment_sum(q, rows, num_segments=m))
        R = R - q
    terms.append(jax.ops.segment_sum(R, rows, num_segments=m))
    terms.append(jax.ops.segment_sum(e, rows, num_segments=m))
    return df_sum_terms(terms)


def scale_rows_cols_df(M: BCOO, M_lo: BCOO, d_row, d_col, s=None):
    """Error-free diag(d_row) @ (M + M_lo) @ diag(d_col) [* s].

    Double-float counterpart of scale_rows_cols for high-accuracy
    ingestion: the scaled entries are computed with two_prod/df_mul so
    the (hi, lo) output represents the f64 product to ~2^-45, mirroring
    api.build_scaled_qp_ha's dense treatment. M and M_lo share indices.
    Returns (BCOO hi, BCOO lo).
    """
    from .df import df_mul, two_prod

    r, c = M.indices[:, 0], M.indices[:, 1]
    scale = two_prod(d_row[r], d_col[c])
    if s is not None:
        scale = df_mul(scale, (jnp.broadcast_to(s, scale[0].shape),
                               jnp.zeros_like(scale[0])))
    hi, lo = df_mul(scale, (M.data, M_lo.data))
    return (BCOO((hi, M.indices), shape=M.shape),
            BCOO((lo, M.indices), shape=M.shape))


def from_any_df(M, dtype=jnp.float32):
    """Ingest f64 sparse/dense input as a (hi, lo) BCOO pair (host-side).

    The data vector is split into exact f32 words (api.split_df_host);
    indices are shared between the two BCOOs.
    """
    if hasattr(M, "tocoo"):  # scipy.sparse
        coo = M.tocoo()
        data64 = np.asarray(coo.data, np.float64)
        idx = jnp.stack([jnp.asarray(coo.row, jnp.int32),
                         jnp.asarray(coo.col, jnp.int32)], axis=1)
        shape = M.shape
    elif isinstance(M, BCOO):
        data64 = np.asarray(M.data, np.float64)
        idx = M.indices
        shape = M.shape
    else:
        dense = np.asarray(M, np.float64)
        rr, cc = np.nonzero(dense)
        data64 = dense[rr, cc]
        idx = jnp.stack([jnp.asarray(rr, jnp.int32),
                         jnp.asarray(cc, jnp.int32)], axis=1)
        shape = dense.shape
    hi = data64.astype(np.float32)
    lo = (data64 - hi.astype(np.float64)).astype(np.float32)
    return (BCOO((jnp.asarray(hi, dtype), idx), shape=shape),
            BCOO((jnp.asarray(lo, dtype), idx), shape=shape))


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
