"""Unscaled primal/dual residuals, duality gap, infeasibility certificates.

Re-implements reference dense/utils.hpp:164-587 on the scaled workspace.
All unscalings use the Ruiz identities (see ops/precond.py docstring); in
particular the duality-gap terms need no unscaled matrices:
    x^T H x = (x_s^T H_s x_s) / c,   g^T x = (g_s^T x_s) / c,
    b^T y = (b_s^T y_s) / c.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

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
    # double-float low words of the scaled data (high-accuracy ingestion:
    # f64 host data split hi/lo and scaled error-free, see api.py /
    # ops/df.py); None when high_accuracy is off.
    H_lo: Optional[jax.Array] = None
    g_lo: Optional[jax.Array] = None
    A_lo: Optional[jax.Array] = None
    b_lo: Optional[jax.Array] = None
    C_lo: Optional[jax.Array] = None
    u_lo: Optional[jax.Array] = None
    l_lo: Optional[jax.Array] = None


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
    Cx_scaled: jax.Array     # scaled Cx (reused to seed ru/rl)
    # double-float low words of the scaled seeds (zeros unless
    # settings.high_accuracy)
    se_scaled_lo: jax.Array
    Cx_scaled_lo: jax.Array


def global_primal_residual(
    spec: ProblemSpec,
    settings: Settings,
    qp: ScaledQP,
    x: jax.Array,
    status_primal_infeasible: jax.Array,
    x_lo=None,
) -> PrimalResidualOut:
    """Reference global_primal_residual (dense/utils.hpp:164-252).

    high_accuracy: the cancelling combinations (Ax - b, Cx - bounds) are
    formed in double-float from exact matvecs BEFORE any lossy elementwise
    op, so the returned residuals carry only relative error (~1e-7 of the
    residual itself, not of the operands). The inequality violation is
    then formed in scaled space -- equivalent for all finite bounds since
    the row scalings are positive.
    """
    if settings.high_accuracy:
        from .df import (df_add, df_add_f32, df_to_f32, exact_matvec,
                         exact_matvec_d)
        se_df = exact_matvec_d(qp.A, qp.A_lo, x, x_lo)
        eq_rhs_0 = infty_norm(df_to_f32(se_df) / qp.delta_y)
        se_scaled, se_scaled_lo = df_add_f32(se_df, -qp.b)
        if qp.b_lo is not None:
            se_scaled, se_scaled_lo = df_add_f32(
                (se_scaled, se_scaled_lo), -qp.b_lo)
        se_un = (se_scaled + se_scaled_lo) / qp.delta_y

        Cx_df = exact_matvec_d(qp.C, qp.C_lo, x, x_lo)
        Cx_scaled, Cx_scaled_lo = Cx_df
        Cx_un = df_to_f32(Cx_df) / qp.delta_z
        in_rhs_0 = infty_norm(Cx_un[: spec.n_in])
        # violation against the WORKING scaled bounds qp.u/qp.l -- the same
        # values the inner loop enforces; re-deriving u_orig*delta_z here
        # differs by one f32 rounding and freezes pri_res at ~6e-8*|u|
        viol_u = df_add_f32(Cx_df, -qp.u)
        viol_l = df_add_f32(Cx_df, -qp.l)
        if qp.u_lo is not None:
            viol_u = df_add_f32(viol_u, -qp.u_lo)
            viol_l = df_add_f32(viol_l, -qp.l_lo)
        si_un = (positive_part(df_to_f32(viol_u))
                 + negative_part(df_to_f32(viol_l))) / qp.delta_z
        if spec.box_constraints:
            x_un = unscale_x(qp, x)
            in_rhs_0 = jnp.maximum(
                in_rhs_0, infty_norm(x_un - si_un[spec.n_in:]))
            in_rhs_0 = jnp.maximum(in_rhs_0, infty_norm(x_un))
    else:
        se_s = qp.A @ x
        se_un = se_s / qp.delta_y
        eq_rhs_0 = infty_norm(se_un)

        Cx_scaled = qp.C @ x
        Cx_un = Cx_scaled / qp.delta_z  # box rows yield unscaled x (identity)
        in_rhs_0 = infty_norm(Cx_un[: spec.n_in])
        si_un = (positive_part(Cx_un - qp.u_orig)
                 + negative_part(Cx_un - qp.l_orig))
        if spec.box_constraints:
            x_un = unscale_x(qp, x)
            in_rhs_0 = jnp.maximum(
                in_rhs_0, infty_norm(x_un - si_un[spec.n_in:]))
            in_rhs_0 = jnp.maximum(in_rhs_0, infty_norm(x_un))
        se_un = se_un - qp.b / qp.delta_y
        se_scaled = se_un * qp.delta_y
        se_scaled_lo = jnp.zeros_like(se_scaled)
        Cx_scaled_lo = jnp.zeros_like(Cx_scaled)

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
        se_scaled=se_scaled,
        Cx_scaled=Cx_scaled,
        se_scaled_lo=se_scaled_lo,
        Cx_scaled_lo=Cx_scaled_lo,
    )


class DualResidualOut(NamedTuple):
    dua_lhs: jax.Array
    rhs_0: jax.Array        # ||Hx|| unscaled
    rhs_1: jax.Array        # ||A^T y|| unscaled
    rhs_3: jax.Array        # ||C^T z|| unscaled
    duality_gap: jax.Array
    rhs_duality_gap: jax.Array
    dual_res_scaled: jax.Array
    dual_res_lo: jax.Array  # df low word (zeros unless high_accuracy)


def global_dual_residual(
    spec: ProblemSpec,
    settings: Settings,
    qp: ScaledQP,
    x: jax.Array,
    y: jax.Array,
    z: jax.Array,
    active_up: jax.Array,
    active_low: jax.Array,
    x_lo=None, y_lo=None, z_lo=None,
) -> DualResidualOut:
    """Reference global_dual_residual (dense/utils.hpp:437-587).

    high_accuracy: Hx + g + A'y + C'z cancels to ~eps_abs at convergence;
    all four terms are exact-matvec'd and combined in double-float before
    the lossy unscale of the (small) result.
    """
    if settings.high_accuracy:
        return _global_dual_residual_ha(spec, qp, x, y, z,
                                        active_up, active_low,
                                        x_lo, y_lo, z_lo)
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
        dual_res_lo=jnp.zeros_like(dr),
    )


def _global_dual_residual_ha(
    spec: ProblemSpec,
    qp: ScaledQP,
    x, y, z, active_up, active_low,
    x_lo=None, y_lo=None, z_lo=None,
) -> DualResidualOut:
    """High-accuracy dual residual: the stationarity sum and the
    duality-gap scalar cancellation run in double-float. Covers every
    HessianType (zero/diagonal H contribute exact elementwise products)
    and box constraints (generic and box C^T z norms kept separate for the
    relative criterion, utils.hpp:508-526)."""
    from .df import (df_add, df_add_f32, df_to_f32, exact_dot, exact_matvec,
                     two_prod, two_sum)

    from .df import exact_matvec_d

    def mvd(M, M_lo, v, v_lo):
        return exact_matvec_d(M, M_lo, v, v_lo)

    tr = lambda M: None if M is None else M.T
    dtype = x.dtype
    inv_dxc = 1.0 / (qp.delta_x * qp.c)
    if spec.hessian_type == HessianType.Zero:
        Hx_df = (jnp.zeros_like(x), jnp.zeros_like(x))
        Hx = Hx_df[0]
        rhs_0 = jnp.asarray(0.0, dtype)
    elif spec.hessian_type == HessianType.Diagonal:
        d = jnp.diagonal(qp.H)
        Hx_df = two_prod(d, x)
        if qp.H_lo is not None:
            Hx_df = df_add_f32(Hx_df, jnp.diagonal(qp.H_lo) * x)
        if x_lo is not None:
            Hx_df = df_add_f32(Hx_df, d * x_lo)
        Hx = df_to_f32(Hx_df)
        rhs_0 = infty_norm(Hx * inv_dxc)
    else:
        Hx_df = mvd(qp.H, qp.H_lo, x, x_lo)
        Hx = df_to_f32(Hx_df)
        rhs_0 = infty_norm(Hx * inv_dxc)
    ATy_df = mvd(qp.A.T, tr(qp.A_lo), y, y_lo)
    rhs_1 = infty_norm(df_to_f32(ATy_df) * inv_dxc)
    if spec.box_constraints:
        ni = spec.n_in
        C_lo_in = None if qp.C_lo is None else qp.C_lo[:ni]
        C_lo_bx = None if qp.C_lo is None else qp.C_lo[ni:]
        CTz_in_df = mvd(qp.C[:ni].T, tr(C_lo_in), z[:ni],
                        None if z_lo is None else z_lo[:ni])
        CTz_bx_df = mvd(qp.C[ni:].T, tr(C_lo_bx), z[ni:],
                        None if z_lo is None else z_lo[ni:])
        rhs_3 = jnp.maximum(infty_norm(df_to_f32(CTz_in_df) * inv_dxc),
                            infty_norm(df_to_f32(CTz_bx_df) * inv_dxc))
        CTz_df = df_add(CTz_in_df, CTz_bx_df)
    else:
        CTz_df = mvd(qp.C.T, tr(qp.C_lo), z, z_lo)
        rhs_3 = infty_norm(df_to_f32(CTz_df) * inv_dxc)
    dr_df = df_add(df_add(df_add_f32(Hx_df, qp.g), ATy_df), CTz_df)
    if qp.g_lo is not None:
        dr_df = df_add_f32(dr_df, qp.g_lo)
    dr, dr_lo = dr_df
    dua_lhs = infty_norm((dr + dr_lo) * inv_dxc)

    # duality gap: five cancelling scalar terms combined in df
    gx_h, gx_l = exact_dot(qp.g, x)
    gx = (gx_h + gx_l) / qp.c
    xHx_h, xHx_l = exact_dot(Hx, x)
    xHx = (xHx_h + xHx_l) / qp.c
    by_h, by_l = exact_dot(qp.b, y)
    by = (by_h + by_l) / qp.c
    z_un = unscale_z(qp, z)
    u_cl = jnp.minimum(qp.u_orig, INFINITE_BOUND)
    l_cl = jnp.maximum(qp.l_orig, -INFINITE_BOUND)
    zu_h, zu_l = exact_dot(jnp.where(active_up, z_un, 0.0), u_cl)
    zu = zu_h + zu_l
    zl_h, zl_l = exact_dot(jnp.where(active_low, z_un, 0.0), l_cl)
    zl = zl_h + zl_l
    gap_hi, gap_lo = two_sum(gx, xHx)
    for t in (by, zu, zl):
        gap_hi, e = two_sum(gap_hi, t)
        gap_lo = gap_lo + e
    duality_gap = gap_hi + gap_lo
    rhs_gap = jnp.maximum(
        jnp.maximum(jnp.abs(gx), jnp.abs(xHx)),
        jnp.maximum(jnp.abs(by), jnp.maximum(jnp.abs(zu), jnp.abs(zl))))

    return DualResidualOut(
        dua_lhs=dua_lhs, rhs_0=rhs_0, rhs_1=rhs_1, rhs_3=rhs_3,
        duality_gap=duality_gap, rhs_duality_gap=rhs_gap,
        dual_res_scaled=dr, dual_res_lo=dr_lo)


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
