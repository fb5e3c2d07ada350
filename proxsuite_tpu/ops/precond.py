"""Ruiz equilibration, TPU-native.

Re-implements the semantics of the reference dense Ruiz preconditioner
(/root/reference/include/proxsuite/proxqp/dense/preconditioner/ruiz.hpp:31-311)
as a fixed-shape `lax.while_loop`: iterative infinity-norm row/column
equilibration of [H A^T C^T] plus a cost normalization gamma. Works on the
*extended* inequality matrix C (generic rows + box rows materialized as a
scaled identity), which is mathematically identical to the reference's
separate i_scaled bookkeeping: a box row k has a single entry, so its row
infinity-norm is i_scaled[k] and column k's max includes i_scaled[k] --
exactly the reference's formulas.

Scaling conventions (reference ruiz.hpp:389-392, 513-694):
    H_s = c * Dx H Dx        g_s = c * Dx g
    A_s = Dy A Dx            b_s = Dy b
    C_s = Dz C Dx            u_s = Dz u,  l_s = Dz l
    x_s = x / dx             x   = x_s * dx
    y   = y_s * dy / c       z   = z_s * dz / c
    unscaled dual residual  = r_s / (dx * c)
    unscaled primal residual(eq/in) = r_s / (dy or dz)
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..types import HessianType, infty_norm


class RuizState(NamedTuple):
    H: jax.Array
    g: jax.Array
    A: jax.Array
    b: jax.Array
    C: jax.Array
    u: jax.Array
    l: jax.Array
    delta_x: jax.Array  # cumulative column scaling (n,)
    delta_y: jax.Array  # cumulative eq row scaling (n_eq,)
    delta_z: jax.Array  # cumulative in row scaling (n_c,)
    c: jax.Array        # cumulative cost scaling (scalar)
    err: jax.Array      # ||1 - delta_round||_inf of the last round
    it: jax.Array


def _col_max_abs(M: jax.Array) -> jax.Array:
    """Per-column infinity norm; zero-size row dim gives zeros."""
    if M.shape[0] == 0:
        return jnp.zeros((M.shape[1],), M.dtype)
    return jnp.max(jnp.abs(M), axis=0)


def _row_max_abs(M: jax.Array) -> jax.Array:
    if M.shape[1] == 0:
        return jnp.zeros((M.shape[0],), M.dtype)
    return jnp.max(jnp.abs(M), axis=1)


def ruiz_equilibrate(
    H: jax.Array,
    g: jax.Array,
    A: jax.Array,
    b: jax.Array,
    C: jax.Array,
    u: jax.Array,
    l: jax.Array,
    *,
    hessian_type: HessianType = HessianType.Dense,
    max_iter: int = 10,
    epsilon: float = 1e-3,
    infeasibility_preconditioning: bool = False,
) -> RuizState:
    """Run Ruiz equilibration; returns scaled problem and scaling vectors.

    Semantics of reference detail::ruiz_scale_qp_in_place (ruiz.hpp:31-311):
    up to (max_iter - 1) rounds, stopping when ||1 - delta||_inf <= epsilon.
    `infeasibility_preconditioning` pins all row scalings to one
    (ruiz.hpp:170-172), used when solving the closest-feasible problem.
    """
    dtype = H.dtype
    n = H.shape[0]
    n_eq = A.shape[0]
    n_c = C.shape[0]
    eps_machine = jnp.finfo(dtype).eps

    def delta_from(norms):
        aux = jnp.sqrt(norms)
        return jnp.where(aux == 0, jnp.ones_like(aux), 1.0 / (aux + eps_machine))

    def body(s: RuizState) -> RuizState:
        # --- normalization vector (ruiz.hpp:92-201) ---
        colA = _col_max_abs(s.A)
        colC = _col_max_abs(s.C)
        if hessian_type == HessianType.Dense:
            colH = _col_max_abs(s.H)
            dx = delta_from(jnp.maximum(jnp.maximum(colH, colA), colC))
        elif hessian_type == HessianType.Diagonal:
            dH = jnp.abs(jnp.diagonal(s.H))
            dx = delta_from(jnp.maximum(jnp.maximum(dH, colA), colC))
        else:  # Zero
            dx = delta_from(jnp.maximum(colA, colC))

        if infeasibility_preconditioning:
            dy = jnp.ones((n_eq,), dtype)
            dz = jnp.ones((n_c,), dtype)
        else:
            dy = delta_from(_row_max_abs(s.A))
            dz = delta_from(_row_max_abs(s.C))

        # --- scale in place (ruiz.hpp:202-308) ---
        A_new = dy[:, None] * s.A * dx[None, :]
        C_new = dz[:, None] * s.C * dx[None, :]
        g_new = s.g * dx
        b_new = s.b * dy
        u_new = s.u * dz
        l_new = s.l * dz

        if hessian_type == HessianType.Dense:
            H_new = dx[:, None] * s.H * dx[None, :]
            # cost normalization: gamma = 1/max(1, mean of col inf-norms)
            gamma = 1.0 / jnp.maximum(
                jnp.asarray(1.0, dtype), jnp.mean(_col_max_abs(H_new))
            )
            H_new = H_new * gamma
        elif hessian_type == HessianType.Diagonal:
            dH = jnp.diagonal(s.H) * dx * dx
            gamma = 1.0 / jnp.maximum(
                jnp.asarray(1.0, dtype), infty_norm(dH) / max(n, 1)
            )
            H_new = jnp.diagflat(dH) * gamma
        else:
            H_new = s.H
            gamma = jnp.asarray(1.0, dtype)
        g_new = g_new * gamma

        delta_round = jnp.concatenate([dx, dy, dz])
        err = infty_norm(1.0 - delta_round)
        return RuizState(
            H=H_new, g=g_new, A=A_new, b=b_new, C=C_new, u=u_new, l=l_new,
            delta_x=s.delta_x * dx, delta_y=s.delta_y * dy, delta_z=s.delta_z * dz,
            c=s.c * gamma, err=err, it=s.it + 1,
        )

    init = RuizState(
        H=H, g=g, A=A, b=b, C=C, u=u, l=l,
        delta_x=jnp.ones((n,), dtype),
        delta_y=jnp.ones((n_eq,), dtype),
        delta_z=jnp.ones((n_c,), dtype),
        c=jnp.asarray(1.0, dtype),
        err=jnp.asarray(jnp.inf, dtype),
        it=jnp.asarray(0, jnp.int32),
    )

    # reference runs at most (max_iter - 1) scaling rounds (ruiz.hpp:77-91)
    def cond(s: RuizState):
        return jnp.logical_and(s.err > epsilon, s.it < max_iter - 1)

    return lax.while_loop(cond, body, init)


def ruiz_equilibrate_sparse(
    H, g, A, b, C, u, l,
    *,
    hessian_type: HessianType = HessianType.Dense,
    max_iter: int = 10,
    epsilon: float = 1e-3,
    infeasibility_preconditioning: bool = False,
) -> RuizState:
    """Ruiz equilibration over BCOO operands (H, A, C sparse).

    Same semantics as ruiz_equilibrate / the reference sparse Ruiz
    (/root/reference/include/proxsuite/proxqp/sparse/preconditioner/
    ruiz.hpp:113-334); norms and scalings act on (data, indices) so the
    sparsity pattern is static and the loop carries a fixed pytree.
    """
    from . import sparse_ops as sp

    dtype = H.dtype
    n = H.shape[0]
    n_eq = A.shape[0]
    n_c = C.shape[0]
    eps_machine = jnp.finfo(dtype).eps

    def delta_from(norms):
        aux = jnp.sqrt(norms)
        return jnp.where(aux == 0, jnp.ones_like(aux),
                         1.0 / (aux + eps_machine))

    def body(s: RuizState) -> RuizState:
        colA = sp.col_max_abs(s.A)
        colC = sp.col_max_abs(s.C)
        if hessian_type == HessianType.Dense:
            colH = sp.col_max_abs(s.H)
            dx = delta_from(jnp.maximum(jnp.maximum(colH, colA), colC))
        else:  # Zero (sparse path restricts to Dense/Zero hessians)
            dx = delta_from(jnp.maximum(colA, colC))

        if infeasibility_preconditioning:
            dy = jnp.ones((n_eq,), dtype)
            dz = jnp.ones((n_c,), dtype)
        else:
            dy = delta_from(sp.row_max_abs(s.A))
            dz = delta_from(sp.row_max_abs(s.C))

        A_new = sp.scale_rows_cols(s.A, dy, dx)
        C_new = sp.scale_rows_cols(s.C, dz, dx)
        g_new = s.g * dx
        b_new = s.b * dy
        u_new = s.u * dz
        l_new = s.l * dz

        if hessian_type == HessianType.Dense:
            H_new = sp.scale_rows_cols(s.H, dx, dx)
            gamma = 1.0 / jnp.maximum(
                jnp.asarray(1.0, dtype), jnp.mean(sp.col_max_abs(H_new)))
            H_new = sp.scale_data(H_new, gamma)
        else:
            H_new = s.H
            gamma = jnp.asarray(1.0, dtype)
        g_new = g_new * gamma

        delta_round = jnp.concatenate([dx, dy, dz])
        err = infty_norm(1.0 - delta_round)
        return RuizState(
            H=H_new, g=g_new, A=A_new, b=b_new, C=C_new, u=u_new, l=l_new,
            delta_x=s.delta_x * dx, delta_y=s.delta_y * dy,
            delta_z=s.delta_z * dz,
            c=s.c * gamma, err=err, it=s.it + 1)

    init = RuizState(
        H=H, g=g, A=A, b=b, C=C, u=u, l=l,
        delta_x=jnp.ones((n,), dtype),
        delta_y=jnp.ones((n_eq,), dtype),
        delta_z=jnp.ones((n_c,), dtype),
        c=jnp.asarray(1.0, dtype),
        err=jnp.asarray(jnp.inf, dtype),
        it=jnp.asarray(0, jnp.int32))

    def cond(s: RuizState):
        return jnp.logical_and(s.err > epsilon, s.it < max_iter - 1)

    return lax.while_loop(cond, body, init)


def apply_existing_scaling(
    H, g, A, b, C, u, l, delta_x, delta_y, delta_z, c, *,
    hessian_type: HessianType = HessianType.Dense,
):
    """Scale a (new) problem with previously computed Ruiz variables.

    Mirrors reference scale_qp_in_place with execute_preconditioner=false
    (ruiz.hpp:425-511): one-shot application of stored delta / c.
    """
    A_s = delta_y[:, None] * A * delta_x[None, :]
    C_s = delta_z[:, None] * C * delta_x[None, :]
    g_s = g * delta_x * c
    b_s = b * delta_y
    u_s = u * delta_z
    l_s = l * delta_z
    if hessian_type == HessianType.Zero:
        H_s = H
    else:
        H_s = delta_x[:, None] * H * delta_x[None, :] * c
    return H_s, g_s, A_s, b_s, C_s, u_s, l_s
