"""Unscaled primal/dual residuals, duality gap, infeasibility certificates.

Re-implements reference dense/utils.hpp:164-587 on the scaled workspace.
All unscalings use the Ruiz identities (see ops/precond.py docstring); in
particular the duality-gap terms need no unscaled matrices:
    x^T H x = (x_s^T H_s x_s) / c,   g^T x = (g_s^T x_s) / c,
    b^T y = (b_s^T y_s) / c.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..types import (
    HessianType,
    INFINITE_BOUND,
    ProblemSpec,
    Settings,
    infty_norm,
    negative_part,
    positive_part,
)


class ScaledQP(NamedTuple):
    """Scaled problem data + scaling variables (the solver's model view).

    C/u/l are the *extended* inequality system: generic rows stacked with box
    rows (box row k of C is the scaled identity entry i_scaled[k], the
    reference's qpwork.i_scaled). u_orig/l_orig are the unscaled, unclamped
    user bounds used for the closest-feasible shifts (utils.hpp:214-224).
    """

    H: jax.Array
    g: jax.Array
    A: jax.Array
    b: jax.Array
    C: jax.Array
    u: jax.Array       # scaled, clamped at +-1e20 before scaling
    l: jax.Array
    u_orig: jax.Array  # unscaled, unclamped
    l_orig: jax.Array
    delta_x: jax.Array
    delta_y: jax.Array
    delta_z: jax.Array
    c: jax.Array


def unscale_x(qp: ScaledQP, x):
    return x * qp.delta_x


def unscale_y(qp: ScaledQP, y):
    return y * qp.delta_y / qp.c


def unscale_z(qp: ScaledQP, z):
    return z * qp.delta_z / qp.c


def scale_x(qp: ScaledQP, x):
    return x / qp.delta_x


def scale_y(qp: ScaledQP, y):
    return y / qp.delta_y * qp.c


def scale_z(qp: ScaledQP, z):
    return z / qp.delta_z * qp.c


class PrimalResidualOut(NamedTuple):
    pri_lhs: jax.Array       # max primal infeasibility (or closest-feasible stat)
    eq_rhs_0: jax.Array      # ||Ax|| unscaled (relative criterion)
    in_rhs_0: jax.Array      # ||Cx|| unscaled (relative criterion)
    se_out: jax.Array        # unscaled Ax - b
    si_out: jax.Array        # unscaled [Cx-u]_+ + [Cx-l]_-
    se_scaled: jax.Array     # scaled Ax - b (inner-loop working value)
    Cx_unscaled: jax.Array   # unscaled Cx (reused to seed ru/rl)


def global_primal_residual(
    spec: ProblemSpec,
    settings: Settings,
    qp: ScaledQP,
    x: jax.Array,
    status_primal_infeasible: jax.Array,
) -> PrimalResidualOut:
    """Reference global_primal_residual (dense/utils.hpp:164-252)."""
    se_s = qp.A @ x
    se_un = se_s / qp.delta_y
    eq_rhs_0 = infty_norm(se_un)

    Cx_s = qp.C @ x
    Cx_un = Cx_s / qp.delta_z  # box rows yield unscaled x (identity rows)
    in_rhs_0 = infty_norm(Cx_un[: spec.n_in])
    si_un = positive_part(Cx_un - qp.u_orig) + negative_part(Cx_un - qp.l_orig)
    if spec.box_constraints:
        x_un = unscale_x(qp, x)
        in_rhs_0 = jnp.maximum(
            in_rhs_0, infty_norm(x_un - si_un[spec.n_in:]))
        in_rhs_0 = jnp.maximum(in_rhs_0, infty_norm(x_un))
    se_un = se_un - qp.b / qp.delta_y

    in_lhs = infty_norm(si_un)
    eq_lhs = infty_norm(se_un)
    pri_lhs = jnp.maximum(eq_lhs, in_lhs)
    if settings.primal_infeasibility_solving:
        # closest-feasible mode: once primal infeasibility is certified the
        # stopping statistic becomes ||A^T se + C^T si|| (utils.hpp:241-248).
        At_se = (qp.A.T @ (se_un / qp.delta_y)) / qp.delta_x
        Ct_si = (qp.C.T @ (si_un / qp.delta_z)) / qp.delta_x
        pri_lhs_cf = infty_norm(At_se + Ct_si)
        pri_lhs = jnp.where(status_primal_infeasible, pri_lhs_cf, pri_lhs)

    return PrimalResidualOut(
        pri_lhs=pri_lhs,
        eq_rhs_0=eq_rhs_0,
        in_rhs_0=in_rhs_0,
        se_out=se_un,
        si_out=si_un,
        se_scaled=se_un * qp.delta_y,
        Cx_unscaled=Cx_un,
    )


class DualResidualOut(NamedTuple):
    dua_lhs: jax.Array
    rhs_0: jax.Array        # ||Hx|| unscaled
    rhs_1: jax.Array        # ||A^T y|| unscaled
    rhs_3: jax.Array        # ||C^T z|| unscaled
    duality_gap: jax.Array
    rhs_duality_gap: jax.Array
    dual_res_scaled: jax.Array


def global_dual_residual(
    spec: ProblemSpec,
    qp: ScaledQP,
    x: jax.Array,
    y: jax.Array,
    z: jax.Array,
    active_up: jax.Array,
    active_low: jax.Array,
) -> DualResidualOut:
    """Reference global_dual_residual (dense/utils.hpp:437-587)."""
    dtype = x.dtype
    inv_dxc = 1.0 / (qp.delta_x * qp.c)
    dr = qp.g

    if spec.hessian_type == HessianType.Zero:
        Hx = jnp.zeros_like(x)
        rhs_0 = jnp.asarray(0.0, dtype)
    else:
        if spec.hessian_type == HessianType.Diagonal:
            Hx = jnp.diagonal(qp.H) * x
        else:
            Hx = qp.H @ x
        rhs_0 = infty_norm(Hx * inv_dxc)
    dr = dr + Hx

    duality_gap = (qp.g @ x) / qp.c
    rhs_gap = jnp.abs(duality_gap)
    if spec.hessian_type != HessianType.Zero:
        xHx = (Hx @ x) / qp.c
        duality_gap = duality_gap + xHx
        rhs_gap = jnp.maximum(rhs_gap, jnp.abs(xHx))

    ATy = qp.A.T @ y
    dr = dr + ATy
    rhs_1 = infty_norm(ATy * inv_dxc)

    # generic and box contributions kept separate for the relative criterion
    # (utils.hpp:508-526 takes the max of the two norms); without box rows
    # the unsliced product also works for sparse (BCOO) C
    if spec.box_constraints:
        CTz_in = qp.C[: spec.n_in].T @ z[: spec.n_in]
        rhs_3 = infty_norm(CTz_in * inv_dxc)
        dr = dr + CTz_in
        CTz_box = qp.C[spec.n_in:].T @ z[spec.n_in:]
        rhs_3 = jnp.maximum(rhs_3, infty_norm(CTz_box * inv_dxc))
        dr = dr + CTz_box
    else:
        CTz_in = qp.C.T @ z
        rhs_3 = infty_norm(CTz_in * inv_dxc)
        dr = dr + CTz_in

    dua_lhs = infty_norm(dr * inv_dxc)

    by = (qp.b @ y) / qp.c
    rhs_gap = jnp.maximum(rhs_gap, jnp.abs(by))
    duality_gap = duality_gap + by

    # z^T u / z^T l terms masked by the current active set, bounds clamped at
    # the infinite-bound sentinel (utils.hpp:545-586)
    z_un = unscale_z(qp, z)
    u_cl = jnp.minimum(qp.u_orig, INFINITE_BOUND)
    l_cl = jnp.maximum(qp.l_orig, -INFINITE_BOUND)
    zu = jnp.sum(jnp.where(active_up, z_un, 0.0) * u_cl)
    rhs_gap = jnp.maximum(rhs_gap, jnp.abs(zu))
    duality_gap = duality_gap + zu
    zl = jnp.sum(jnp.where(active_low, z_un, 0.0) * l_cl)
    rhs_gap = jnp.maximum(rhs_gap, jnp.abs(zl))
    duality_gap = duality_gap + zl

    return DualResidualOut(
        dua_lhs=dua_lhs,
        rhs_0=rhs_0,
        rhs_1=rhs_1,
        rhs_3=rhs_3,
        duality_gap=duality_gap,
        rhs_duality_gap=rhs_gap,
        dual_res_scaled=dr,
    )


def primal_infeasibility_certificate(
    spec: ProblemSpec,
    settings: Settings,
    qp: ScaledQP,
    ATdy: jax.Array,
    CTdz: jax.Array,
    dy: jax.Array,
    dz: jax.Array,
) -> jax.Array:
    """Reference global_primal_residual_infeasibility (utils.hpp:269-324).

    Parity note: the reference code computes u'pos(dz) - l'neg(dz) (its own
    comment says "- l^T[-dz]_+", i.e. + l'neg(dz), the textbook Farkas
    term). We replicate the code, not the comment: certificates with
    negative components against finite lower bounds are therefore not
    detected, exactly as in the reference.
    """
    nonzero = jnp.logical_or(infty_norm(dy) != 0, infty_norm(dz) != 0)
    ATdy_un = ATdy / (qp.delta_x * qp.c)
    CTdz_un = CTdz / (qp.delta_x * qp.c)
    lb1 = dy @ qp.b + positive_part(dz) @ qp.u - negative_part(dz) @ qp.l
    dy_un = unscale_y(qp, dy)
    dz_un = unscale_z(qp, dz)
    ub = settings.eps_primal_inf * jnp.maximum(infty_norm(dy_un), infty_norm(dz_un))
    lb2 = infty_norm(ATdy_un + CTdz_un)
    return jnp.logical_and(nonzero, jnp.logical_and(lb2 <= ub, lb1 <= -ub))


def dual_infeasibility_certificate(
    spec: ProblemSpec,
    settings: Settings,
    qp: ScaledQP,
    Adx: jax.Array,
    Cdx: jax.Array,
    Hdx: jax.Array,
    dx: jax.Array,
) -> jax.Array:
    """Reference global_dual_residual_infeasibility (utils.hpp:343-419).

    Parity note: like the reference, bounds clamped at exactly 1e20 compare
    as finite here (`u_scaled <= 1.E20` at utils.hpp:389), so rays pushing
    against an originally-infinite bound are not certified dual-infeasible.
    """
    Hdx_un = Hdx / (qp.delta_x * qp.c)
    Adx_un = Adx / qp.delta_y
    Cdx_un = Cdx / qp.delta_z
    gdx = dx @ qp.g
    dx_un = unscale_x(qp, dx)
    bound = infty_norm(dx_un) * settings.eps_dual_inf

    first = infty_norm(Adx_un) <= bound
    # per-row recession conditions; comparisons against the scaled clamped
    # bounds mirror utils.hpp:387-410 exactly
    both = jnp.logical_and(qp.u <= INFINITE_BOUND, qp.l >= -INFINITE_BOUND)
    up_inf = qp.u > INFINITE_BOUND
    low_inf = qp.l < -INFINITE_BOUND
    ok = jnp.where(
        both,
        jnp.logical_and(Cdx_un <= bound, Cdx_un >= -bound),
        jnp.where(
            up_inf, Cdx_un >= -bound,
            jnp.where(low_inf, Cdx_un <= bound, True),
        ),
    )
    first = jnp.logical_and(first, jnp.all(ok) if ok.size else True)

    bound_c = bound * qp.c
    second = jnp.logical_and(infty_norm(Hdx_un) <= bound_c, gdx <= -bound_c)
    return jnp.logical_and(
        jnp.logical_and(first, second), infty_norm(dx_un) != 0)
