"""User-facing solver API.

Mirrors the reference dense wrapper surface
(/root/reference/include/proxsuite/proxqp/dense/wrapper.hpp): a stateless
`solve(...)` (wrapper.hpp:1000-1233) and a stateful `QP` object with
init/update/solve/cleanup and warm starts (wrapper.hpp:115-996). The
stateful object orchestrates jitted functional pieces; all compute is
jit-compiled per (ProblemSpec, Settings) and cached.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .ops.precond import apply_existing_scaling, ruiz_equilibrate
from .ops.residuals import ScaledQP, scale_x, scale_y, scale_z
from .solver import qp_solve_core
from .types import (
    HessianType,
    INFINITE_BOUND,
    InitialGuess,
    ProblemSpec,
    QPSolverOutput,
    Results,
    Settings,
)


def _clamp_bounds(u, l):
    """Reference setup clamps infinite bounds at +-1e20 (helpers.hpp:628-649)."""
    u_cl = jnp.minimum(u, INFINITE_BOUND)
    l_cl = jnp.maximum(l, -INFINITE_BOUND)
    return u_cl, l_cl


def default_rho_for(spec: ProblemSpec, settings: Settings, dtype) -> float:
    """Dtype/structure-aware proximal-rho default.

    The reference already keys the rho default on the backend (1e-6 for
    PrimalDualLDLT, 1e-5 for PrimalLDLT, settings.hpp:87-109). On TPU the
    analogous hazard is single precision + Zero Hessian: the KKT block
    P = rho*I makes kappa(K) ~ 1/rho, and at rho=1e-6 an f32
    factorization cannot refine (contraction rate kappa*eps_f32 > 1 --
    observed NaN divergence on box LPs). rho=1e-4 keeps kappa within the
    refinement contraction regime; the proximal outer loop absorbs the
    larger rho with a few extra iterations.
    """
    rho = settings.default_rho
    if (jnp.finfo(dtype).bits < 64
            and spec.hessian_type == HessianType.Zero):
        rho = max(rho, 1e-4)
    return rho


def extend_box(spec: ProblemSpec, C, u, l, u_box, l_box, dtype):
    """Materialize box constraints as identity rows appended to C.

    The reference keeps a separate scaled-identity vector (i_scaled,
    dense/workspace.hpp); mathematically the extended matrix is identical
    and keeps every kernel shape-uniform (see ops/precond.py docstring).
    """
    if not spec.box_constraints:
        return C, u, l
    eye = jnp.eye(spec.n, dtype=dtype)
    return (jnp.concatenate([C, eye], axis=0),
            jnp.concatenate([u, u_box]),
            jnp.concatenate([l, l_box]))


def build_scaled_qp(
    spec: ProblemSpec,
    settings: Settings,
    H, g, A, b, C, u, l,
    u_box=None, l_box=None,
    *,
    execute_preconditioner: bool = True,
    delta_x=None, delta_y=None, delta_z=None, c=None,
) -> ScaledQP:
    """Clamp bounds, extend box rows, run (or re-apply) Ruiz equilibration.

    Counterpart of reference dense::setup (helpers.hpp:500-667).
    """
    # Full operand precision for every product in the solve path: TPU
    # matmuls default to bf16 operands, which corrupts residuals and
    # convergence checks in f32 (see ops/chol.py).
    with jax.default_matmul_precision("highest"):
        return _build_scaled_qp_hp(
            spec, settings, H, g, A, b, C, u, l, u_box, l_box,
            execute_preconditioner=execute_preconditioner,
            delta_x=delta_x, delta_y=delta_y, delta_z=delta_z, c=c)


def _build_scaled_qp_hp(
    spec: ProblemSpec,
    settings: Settings,
    H, g, A, b, C, u, l,
    u_box=None, l_box=None,
    *,
    execute_preconditioner: bool = True,
    delta_x=None, delta_y=None, delta_z=None, c=None,
) -> ScaledQP:
    dtype = jnp.asarray(H).dtype
    C_e, u_e, l_e = extend_box(spec, C, u, l, u_box, l_box, dtype)
    u_cl, l_cl = _clamp_bounds(u_e, l_e)

    if execute_preconditioner:
        rz = ruiz_equilibrate(
            H, g, A, b, C_e, u_cl, l_cl,
            hessian_type=spec.hessian_type,
            max_iter=settings.preconditioner_max_iter,
            epsilon=settings.preconditioner_accuracy,
            infeasibility_preconditioning=settings.primal_infeasibility_solving,
        )
        return ScaledQP(
            H=rz.H, g=rz.g, A=rz.A, b=rz.b, C=rz.C, u=rz.u, l=rz.l,
            u_orig=u_e, l_orig=l_e,
            delta_x=rz.delta_x, delta_y=rz.delta_y, delta_z=rz.delta_z, c=rz.c)
    else:
        if delta_x is None:
            delta_x = jnp.ones((spec.n,), dtype)
            delta_y = jnp.ones((spec.n_eq,), dtype)
            delta_z = jnp.ones((spec.n_c,), dtype)
            c = jnp.asarray(1.0, dtype)
        H_s, g_s, A_s, b_s, C_s, u_s, l_s = apply_existing_scaling(
            H, g, A, b, C_e, u_cl, l_cl, delta_x, delta_y, delta_z, c,
            hessian_type=spec.hessian_type)
        return ScaledQP(
            H=H_s, g=g_s, A=A_s, b=b_s, C=C_s, u=u_s, l=l_s,
            u_orig=u_e, l_orig=l_e,
            delta_x=delta_x, delta_y=delta_y, delta_z=delta_z, c=c)


def solve_scaled(
    spec: ProblemSpec,
    settings: Settings,
    qp: ScaledQP,
    x0=None, y0=None, z0=None,
    rho=None, mu_eq=None, mu_in=None,
) -> Results:
    """Solve a pre-scaled QP. Warm-start values are *unscaled*."""
    dtype = qp.H.dtype
    eq_init = settings.initial_guess == InitialGuess.EQUALITY_CONSTRAINED_INITIAL_GUESS
    warm = settings.initial_guess in (
        InitialGuess.WARM_START,
        InitialGuess.WARM_START_WITH_PREVIOUS_RESULT,
        InitialGuess.COLD_START_WITH_PREVIOUS_RESULT,
    )
    if warm and x0 is not None:
        xs = scale_x(qp, jnp.asarray(x0, dtype))
        ys = scale_y(qp, jnp.asarray(y0, dtype))
        zs = scale_z(qp, jnp.asarray(z0, dtype))
    else:
        xs = jnp.zeros((spec.n,), dtype)
        ys = jnp.zeros((spec.n_eq,), dtype)
        zs = jnp.zeros((spec.n_c,), dtype)
    rho = jnp.asarray(default_rho_for(spec, settings, dtype)
                      if rho is None else rho, dtype)
    mu_eq = jnp.asarray(settings.default_mu_eq if mu_eq is None else mu_eq, dtype)
    mu_in = jnp.asarray(settings.default_mu_in if mu_in is None else mu_in, dtype)
    # full operand precision on TPU (see build_scaled_qp)
    with jax.default_matmul_precision("highest"):
        return qp_solve_core(
            spec, settings, qp, xs, ys, zs, rho, mu_eq, mu_in,
            eq_init_guess=eq_init)


def split_df_host(v) -> tuple:
    """Split f64 host data into exact (hi, lo) f32 words (ops/df.py)."""
    v64 = np.asarray(v, np.float64)
    hi = v64.astype(np.float32)
    lo = (v64 - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


@functools.partial(jax.jit, static_argnums=(0, 1))
def build_scaled_qp_ha(
    spec: ProblemSpec,
    settings: Settings,
    H, H_lo, g, g_lo, A, A_lo, b, b_lo, C, C_lo, u, u_lo, l, l_lo,
    u_box=None, u_box_lo=None, l_box=None, l_box_lo=None,
) -> ScaledQP:
    """High-accuracy setup: f64 data arrives as (hi, lo) f32 word pairs
    (split_df_host); Ruiz runs on the hi words to pick the scalings, then
    the scaled data is recomputed from the full double-float data with
    error-free products (ops/df.py df_mul/two_prod) so the solved problem
    matches the f64 input to ~2^-45 instead of f32's 2^-24. The hi words
    of the result feed the factorizations; the lo words feed the residual
    paths. Box constraints become exact identity rows appended to C
    (lo word 0), mirroring extend_box; every HessianType works (Ruiz is
    hessian_type-aware, and zero/diagonal H have exact lo words)."""
    from .ops.df import df_mul, two_prod

    with jax.default_matmul_precision("highest"):
        if spec.box_constraints:
            eye = jnp.eye(spec.n, dtype=C.dtype)
            C = jnp.concatenate([C, eye], axis=0)
            C_lo = jnp.concatenate([C_lo, jnp.zeros_like(eye)], axis=0)
            u = jnp.concatenate([u, u_box])
            u_lo = jnp.concatenate([u_lo, u_box_lo])
            l = jnp.concatenate([l, l_box])
            l_lo = jnp.concatenate([l_lo, l_box_lo])
        u_cl, l_cl = _clamp_bounds(u, l)
        rz = ruiz_equilibrate(
            H, g, A, b, C, u_cl, l_cl,
            hessian_type=spec.hessian_type,
            max_iter=settings.preconditioner_max_iter,
            epsilon=settings.preconditioner_accuracy,
            infeasibility_preconditioning=settings.primal_infeasibility_solving)
        dx, dy, dz, c = rz.delta_x, rz.delta_y, rz.delta_z, rz.c

        cb = jnp.broadcast_to(c, dx.shape)
        sH = df_mul(two_prod(dx[:, None], dx[None, :]),
                    (jnp.broadcast_to(c, (1, 1)), jnp.zeros((1, 1), c.dtype)))
        H_s = df_mul(sH, (H, H_lo))
        g_s = df_mul((g, g_lo), two_prod(dx, cb))
        A_s = df_mul(two_prod(dy[:, None], dx[None, :]), (A, A_lo))
        b_s = df_mul((b, b_lo), (dy, jnp.zeros_like(dy)))
        u_s = df_mul((jnp.minimum(u, INFINITE_BOUND),
                      jnp.where(u <= INFINITE_BOUND, u_lo, 0.0)),
                     (dz, jnp.zeros_like(dz)))
        l_s = df_mul((jnp.maximum(l, -INFINITE_BOUND),
                      jnp.where(l >= -INFINITE_BOUND, l_lo, 0.0)),
                     (dz, jnp.zeros_like(dz)))
        C_s = df_mul(two_prod(dz[:, None], dx[None, :]), (C, C_lo))
        return ScaledQP(
            H=H_s[0], g=g_s[0], A=A_s[0], b=b_s[0], C=C_s[0],
            u=u_s[0], l=l_s[0],
            u_orig=u, l_orig=l,
            delta_x=dx, delta_y=dy, delta_z=dz, c=c,
            H_lo=H_s[1], g_lo=g_s[1], A_lo=A_s[1], b_lo=b_s[1],
            C_lo=C_s[1], u_lo=u_s[1], l_lo=l_s[1])


@functools.partial(jax.jit, static_argnums=(0, 1))
def _solve_jit(spec, settings, H, g, A, b, C, u, l, u_box, l_box, x0, y0, z0):
    qp = build_scaled_qp(
        spec, settings, H, g, A, b, C, u, l, u_box, l_box,
        execute_preconditioner=settings.compute_preconditioner)
    return solve_scaled(spec, settings, qp, x0, y0, z0)


def solve(
    H=None, g=None, A=None, b=None, C=None, l=None, u=None,
    *,
    l_box=None, u_box=None,
    x=None, y=None, z=None,
    settings: Optional[Settings] = None,
    hessian_type: HessianType = HessianType.Dense,
    eps_abs: Optional[float] = None,
    eps_rel: Optional[float] = None,
    max_iter: Optional[int] = None,
    initial_guess: Optional[InitialGuess] = None,
    check_duality_gap: Optional[bool] = None,
    primal_infeasibility_solving: Optional[bool] = None,
    **settings_overrides,
) -> Results:
    """Stateless dense QP solve (reference dense::solve, wrapper.hpp:1000).

        min 0.5 x'Hx + g'x   s.t.  Ax = b,  l <= Cx <= u,
                                   (l_box <= x <= u_box)

    None constraint blocks are treated as empty. Returns a Results pytree of
    device arrays; dtype follows the inputs (float64 requires
    jax.config.update("jax_enable_x64", True)).
    """
    settings = settings or Settings()
    overrides = dict(settings_overrides)
    for name, val in (("eps_abs", eps_abs), ("eps_rel", eps_rel),
                      ("max_iter", max_iter), ("initial_guess", initial_guess),
                      ("check_duality_gap", check_duality_gap),
                      ("primal_infeasibility_solving", primal_infeasibility_solving)):
        if val is not None:
            overrides[name] = val
    if x is not None and "initial_guess" not in overrides:
        overrides["initial_guess"] = InitialGuess.WARM_START
    if overrides:
        settings = settings.replace(**overrides)

    g = jnp.atleast_1d(jnp.asarray(g))
    dtype = g.dtype
    n = g.shape[0]
    H = jnp.zeros((n, n), dtype) if H is None else jnp.asarray(H, dtype)
    if H is not None and hessian_type == HessianType.Dense and H.ndim == 1:
        H = jnp.diagflat(H)
    A = jnp.zeros((0, n), dtype) if A is None else jnp.asarray(A, dtype).reshape(-1, n)
    b = jnp.zeros((A.shape[0],), dtype) if b is None else jnp.atleast_1d(jnp.asarray(b, dtype))
    C = jnp.zeros((0, n), dtype) if C is None else jnp.asarray(C, dtype).reshape(-1, n)
    n_in = C.shape[0]
    u = jnp.full((n_in,), jnp.inf, dtype) if u is None else jnp.atleast_1d(jnp.asarray(u, dtype))
    l = jnp.full((n_in,), -jnp.inf, dtype) if l is None else jnp.atleast_1d(jnp.asarray(l, dtype))
    box = u_box is not None or l_box is not None
    if box:
        u_box = jnp.full((n,), jnp.inf, dtype) if u_box is None else jnp.asarray(u_box, dtype)
        l_box = jnp.full((n,), -jnp.inf, dtype) if l_box is None else jnp.asarray(l_box, dtype)
    else:
        u_box = jnp.zeros((0,), dtype)
        l_box = jnp.zeros((0,), dtype)

    spec = ProblemSpec(
        n=n, n_eq=A.shape[0], n_in=n_in,
        box_constraints=box, hessian_type=hessian_type)

    warm = settings.initial_guess in (
        InitialGuess.WARM_START,
        InitialGuess.WARM_START_WITH_PREVIOUS_RESULT,
        InitialGuess.COLD_START_WITH_PREVIOUS_RESULT)
    if warm:
        x0 = jnp.zeros((n,), dtype) if x is None else jnp.asarray(x, dtype)
        y0 = jnp.zeros((spec.n_eq,), dtype) if y is None else jnp.asarray(y, dtype)
        z0 = jnp.zeros((spec.n_c,), dtype) if z is None else jnp.asarray(z, dtype)
        if z0.shape[0] == spec.n_in and spec.box_constraints:
            z0 = jnp.concatenate([z0, jnp.zeros((n,), dtype)])
    else:
        x0 = jnp.zeros((n,), dtype)
        y0 = jnp.zeros((spec.n_eq,), dtype)
        z0 = jnp.zeros((spec.n_c,), dtype)

    return _solve_jit(spec, settings, H, g, A, b, C, u, l, u_box, l_box, x0, y0, z0)
