"""ProxQP algorithm core: BCL outer loop + semismooth Newton inner loop.

TPU-native re-implementation of the reference dense solver
(/root/reference/include/proxsuite/proxqp/dense/solver.hpp:1088-1843 qp_solve,
:884-1077 primal_dual_newton_semi_smooth, :756-869 newton step, :566-677 BCL /
Martinez updates). Everything is fixed-shape `lax.while_loop` state so the
whole solve jits, vmaps over problem batches, and shard_maps over device
meshes. Per-lane "done" flags freeze converged problems under vmap.

Solved in scaled space (Ruiz), same sequencing as the reference:

    outer k:  residuals -> convergence -> save prevs -> seed shifted
              residuals -> inner semismooth Newton (while err_in > eta_in)
              -> infeasibility handling -> BCL/Martinez penalty update
              -> cold restart -> mu update (free here: factors don't
              depend on mu, see ops/kkt.py).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .ops import kkt
from .ops.df import df_add_f32, df_div, df_scale
from .ops.kkt import KKTFactors, KKTOperand
from .ops.linesearch import LinesearchOperand, primal_dual_linesearch
from .ops.residuals import (
    ScaledQP,
    dual_infeasibility_certificate,
    global_dual_residual,
    global_primal_residual,
    primal_infeasibility_certificate,
    unscale_x,
    unscale_y,
    unscale_z,
)
from .types import (
    HessianType,
    Info,
    MeritFunctionType,
    ProblemSpec,
    QPSolverOutput,
    Results,
    Settings,
    infty_norm,
    negative_part,
    positive_part,
)


def resolve_backend(spec: ProblemSpec, settings: Settings,
                    dtype=None) -> str:
    """kkt_backend Automatic rule (see types.py Settings docstring).

    The reference's Automatic choice (dense_backend_choice,
    dense/wrapper.hpp:82-113) is a flop model between factoring the full
    (n+m) KKT and the n-sized primal form. On TPU the masked-Schur
    n-factor always wins on flops (refactorize-always is one batched MXU
    Cholesky), so the dims/accuracy-aware switch here is a CONDITIONING
    escape hatch instead: the Schur form squares the KKT condition number
    through its mu^-1 Gram terms, so when the requested accuracy is
    tighter than ~sqrt(machine eps) of the working dtype the full
    quasi-definite factor (primaldual) is the safe automatic choice.
    high_accuracy is exempt: its double-float refinement restores the
    Schur backend's accuracy (tests/test_high_accuracy.py at 1e-8).
    """
    if settings.kkt_backend:
        return settings.kkt_backend
    if spec.hessian_type == HessianType.Zero:
        # P = rho*I alone: the Schur form squares 1/rho -- always escape
        return "primaldual"
    if dtype is not None and not settings.high_accuracy:
        eps_mach = float(jnp.finfo(dtype).eps)
        if settings.eps_abs < 1e-2 * eps_mach ** 0.5:
            return "primaldual"
    return "schur"


def use_df_factor(spec: ProblemSpec, settings: Settings, dtype) -> bool:
    """Whether the primaldual backend factors in double-float.

    Honored only where it matters and works: f32 working dtype (f64 has
    native accuracy), high_accuracy (the df refinement residual is what
    the df factor contracts against), primaldual backend (the Schur
    backend's squared conditioning makes df-factoring it pointless --
    escape to primaldual instead). See types.Settings.factor_df and
    ops/chol.py FullDFLDL for the numerics.
    """
    return (settings.factor_df is True
            and settings.high_accuracy
            and jnp.finfo(dtype).bits < 64
            and resolve_backend(spec, settings, dtype) == "primaldual")


def _merit_factor(settings: Settings) -> float:
    """mu_in multiplier in the shifted residuals: alpha_gpdal for GPDAL, 1
    for PDAL (reference solver.hpp:1536-1543, :699-728)."""
    if settings.merit_function_type == MeritFunctionType.GPDAL:
        return settings.alpha_gpdal
    return 1.0


def _small_step_tol(dtype) -> float:
    """Reference uses 1e-11 (f64) for the stalled-step break
    (solver.hpp:973); scaled to f32 precision when running single."""
    return 1e-11 if jnp.finfo(dtype).bits >= 64 else 1e-6


def _hdx(spec: ProblemSpec, qp: ScaledQP, dx):
    if spec.hessian_type == HessianType.Zero:
        return jnp.zeros_like(dx)
    if spec.hessian_type == HessianType.Diagonal:
        return jnp.diagonal(qp.H) * dx
    return qp.H @ dx


class InnerState(NamedTuple):
    x: jax.Array
    y: jax.Array
    z: jax.Array
    ru: jax.Array        # C x - u + fac*mu_in*z_prev (scaled)
    rl: jax.Array        # C x - l + fac*mu_in*z_prev (scaled)
    se: jax.Array        # A x - b + mu_eq (y_prev - y) (scaled)
    dual_res: jax.Array  # H x + rho (x - x_prev) + A^T y + C^T z (scaled)
    # double-float low words of the above (zeros unless high_accuracy;
    # iterate updates are error-free two_sum accumulations in that mode)
    x_lo: jax.Array
    y_lo: jax.Array
    z_lo: jax.Array
    ru_lo: jax.Array
    rl_lo: jax.Array
    se_lo: jax.Array
    dres_lo: jax.Array
    active_up: jax.Array
    active_low: jax.Array
    dx: jax.Array
    dy: jax.Array
    dz: jax.Array
    err_in: jax.Array
    best_err: jax.Array
    stalls: jax.Array
    lin_err: jax.Array
    minres_iters: jax.Array  # cumulative matrix-free iterations
    k: jax.Array         # body runs completed
    iters_add: jax.Array # iteration count to add on break (reference +iter+1)
    status: jax.Array
    done: jax.Array


def inner_newton(
    spec: ProblemSpec,
    settings: Settings,
    qp: ScaledQP,
    factors: KKTFactors,
    op: KKTOperand,
    x, y, z, ru, rl, se, dual_res,
    lows,                # 7-tuple of low words (x,y,z,ru,rl,se,dres)
    x_prev,
    rho, mu_eq, mu_in,
    eps_int,
    status,
    skip,
) -> InnerState:
    """Reference primal_dual_newton_semi_smooth (solver.hpp:882-1077)."""
    dtype = x.dtype
    fac = _merit_factor(settings)
    small_tol = _small_step_tol(dtype)
    gpdal = settings.merit_function_type == MeritFunctionType.GPDAL
    ha = settings.high_accuracy

    def upd(hi, lo, t):
        """df(hi, lo) += t (error-free in HA mode, plain add otherwise)."""
        if not ha:
            return hi + t, lo
        return df_add_f32((hi, lo), t)

    def body(s: InnerState) -> InnerState:
        # collapsed working views (exact hi when HA is off)
        ru_v = s.ru + s.ru_lo if ha else s.ru
        rl_v = s.rl + s.rl_lo if ha else s.rl
        se_v = s.se + s.se_lo if ha else s.se
        dres_v = s.dual_res + s.dres_lo if ha else s.dual_res
        z_v = s.z + s.z_lo if ha else s.z

        # --- active set from shifted residuals (solver.hpp:773-778) ---
        up = ru_v >= 0
        low = rl_v <= 0
        active = jnp.logical_or(up, low)
        inactive = jnp.logical_not(active)

        # --- rhs assembly (solver.hpp:787-847) ---
        rhs_x = -dres_v + qp.C.T @ jnp.where(inactive, z_v, 0.0)
        rhs_y = -se_v
        shift = z_v * mu_in * fac
        rhs_z = jnp.where(up, -ru_v + shift,
                          jnp.where(low, -rl_v + shift, 0.0))

        # --- masked KKT solve with iterative refinement ---
        backend = resolve_backend(spec, settings, dtype)
        df_fac = use_df_factor(spec, settings, dtype)
        if backend == "matrixfree":
            sys = kkt.build_masked_system(spec, active, mu_eq, mu_in, dtype)
            solve_fn = kkt.minres_solve_fn(spec, settings, op, sys, rho)
        elif backend == "primaldual":
            sys = kkt.build_masked_system(spec, active, mu_eq, mu_in, dtype)
            solve_fn = (kkt.primaldual_df_solve_fn(spec, op, sys, rho)
                        if df_fac
                        else kkt.primaldual_solve_fn(spec, op, sys, rho))
        else:
            sys = kkt.build_newton_system(spec, factors, active, mu_eq, mu_in)
            solve_fn = None
        dx, dy, dzJ, lin_err, step_its = kkt.solve_with_refinement(
            spec, settings, factors, op, sys, rho, rhs_x, rhs_y, rhs_z,
            eps_int, solve_fn=solve_fn, df_dw=df_fac)
        if df_fac:
            # df directions: keep the low words through every consumer
            (dx, dx_l), (dy, dy_l), (dzJ, dzJ_l) = dx, dy, dzJ
        else:
            dx_l = dy_l = dzJ_l = None
        # inactive multipliers step to zero (solver.hpp:860-868)
        dz = jnp.where(active, dzJ, -z_v)
        # (s.z - z_v) is exact (Sterbenz): the pair stays normalized
        dz_l = (jnp.where(active, dzJ_l, -(s.z_lo + (s.z - z_v)))
                if df_fac else None)

        # --- directional products (df-exact in HA: the incremental state
        # updates below must not pollute the low words with f32 matvec
        # accumulation error, or err_in floors at ~1e-6) ---
        if ha:
            from .ops.df import df_add, df_neg, exact_matvec_d, two_prod
            tr = lambda M: None if M is None else M.T
            if spec.hessian_type == HessianType.Dense:
                Hdx_df = exact_matvec_d(qp.H, qp.H_lo, dx, dx_l)
            elif spec.hessian_type == HessianType.Diagonal:
                Hdx_df = two_prod(jnp.diagonal(qp.H), dx)
                if qp.H_lo is not None:
                    Hdx_df = df_add_f32(Hdx_df,
                                        jnp.diagonal(qp.H_lo) * dx)
                if dx_l is not None:
                    Hdx_df = df_add_f32(Hdx_df, jnp.diagonal(qp.H) * dx_l)
            else:
                Hdx_df = (jnp.zeros_like(dx), jnp.zeros_like(dx))
            Adx_df = exact_matvec_d(qp.A, qp.A_lo, dx, dx_l)
            ATdy_df = exact_matvec_d(qp.A.T, tr(qp.A_lo), dy, dy_l)
            Cdx_df = exact_matvec_d(qp.C, qp.C_lo, dx, dx_l)
            CTdz_df = exact_matvec_d(qp.C.T, tr(qp.C_lo), dz, dz_l)
            if gpdal:
                Cdx_df = df_add(
                    Cdx_df,
                    two_prod((settings.alpha_gpdal - 1.0) * mu_in, dz))
                if dz_l is not None:
                    Cdx_df = df_add_f32(
                        Cdx_df, (settings.alpha_gpdal - 1.0) * mu_in * dz_l)
            Hdx = Hdx_df[0] + Hdx_df[1]
            Adx = Adx_df[0] + Adx_df[1]
            ATdy = ATdy_df[0] + ATdy_df[1]
            Cdx = Cdx_df[0] + Cdx_df[1]
            CTdz = CTdz_df[0] + CTdz_df[1]
        else:
            Hdx = _hdx(spec, qp, dx)
            Adx = qp.A @ dx
            ATdy = qp.A.T @ dy
            Cdx = qp.C @ dx
            CTdz = qp.C.T @ dz
            if gpdal:
                Cdx = Cdx + (settings.alpha_gpdal - 1.0) * mu_in * dz

        # --- exact linesearch (solver.hpp:968-971) ---
        if spec.n_c > 0:
            alpha = primal_dual_linesearch(settings, LinesearchOperand(
                x=s.x, x_prev=x_prev, y=s.y, z=z_v, se=se_v, ru=ru_v,
                rl=rl_v, g=qp.g, dx=dx, dy=dy, dz=dz, Hdx=Hdx, Adx=Adx,
                Cdx=Cdx, rho=rho, mu_eq=mu_eq, mu_in=mu_in))
        else:
            alpha = jnp.asarray(1.0, dtype)

        # --- stalled step break (solver.hpp:973-983), no state update ---
        step_norm = jnp.maximum(
            jnp.maximum(infty_norm(alpha * dx), infty_norm(alpha * dy)),
            infty_norm(alpha * dz))
        small = jnp.logical_and(step_norm < small_tol, s.k > 0)

        # --- iterate update (solver.hpp:984-1009); error-free two_sum /
        # two_prod accumulation keeps the low words exact in HA mode ---
        if ha:
            from .ops.df import df_add as _dfa, df_neg as _dfn, \
                df_scale as _dfs, two_prod as _tp

            def dupd(hi, lo, step_df):
                return _dfa((hi, lo), step_df)

            def _sc(v, v_l, c):
                """df of c * direction (keeps the df-factor low word)."""
                if v_l is None:
                    return _tp(c, v)
                return _dfs((v, v_l), c)

            x_n, x_lo_n = dupd(s.x, s.x_lo, _sc(dx, dx_l, alpha))
            cdx_step = _dfs(Cdx_df, alpha)
            ru_n, ru_lo_n = dupd(s.ru, s.ru_lo, cdx_step)
            rl_n, rl_lo_n = dupd(s.rl, s.rl_lo, cdx_step)
            se_step = _dfs(_dfa(Adx_df, _dfn(_sc(dy, dy_l, mu_eq))), alpha)
            se_n, se_lo_n = dupd(s.se, s.se_lo, se_step)
            y_n, y_lo_n = dupd(s.y, s.y_lo, _sc(dy, dy_l, alpha))
            z_n, z_lo_n = dupd(s.z, s.z_lo, _sc(dz, dz_l, alpha))
            dres_step = _dfs(
                _dfa(_dfa(_dfa(_sc(dx, dx_l, rho), Hdx_df), ATdy_df),
                     CTdz_df),
                alpha)
            dual_res_n, dres_lo_n = dupd(s.dual_res, s.dres_lo, dres_step)
        else:
            x_n, x_lo_n = upd(s.x, s.x_lo, alpha * dx)
            ru_n, ru_lo_n = upd(s.ru, s.ru_lo, alpha * Cdx)
            rl_n, rl_lo_n = upd(s.rl, s.rl_lo, alpha * Cdx)
            se_n, se_lo_n = upd(s.se, s.se_lo, alpha * (Adx - mu_eq * dy))
            y_n, y_lo_n = upd(s.y, s.y_lo, alpha * dy)
            z_n, z_lo_n = upd(s.z, s.z_lo, alpha * dz)
            dual_res_n, dres_lo_n = upd(
                s.dual_res, s.dres_lo, alpha * (rho * dx + Hdx + ATdy + CTdz))

        # --- inner stopping criterion (solver.hpp:687-743) ---
        ru_nv = ru_n + ru_lo_n if ha else ru_n
        rl_nv = rl_n + rl_lo_n if ha else rl_n
        se_nv = se_n + se_lo_n if ha else se_n
        dres_nv = dual_res_n + dres_lo_n if ha else dual_res_n
        z_nv = z_n + z_lo_n if ha else z_n
        if ha:
            # the w cancellation (pos(ru)+neg(rl) ~ fac mu z on active
            # rows) also runs in df: masks apply to both words
            fmuz = _dfs((z_n, z_lo_n), fac * mu_in)
            pos_df = (jnp.where(ru_nv > 0, ru_n, 0.0),
                      jnp.where(ru_nv > 0, ru_lo_n, 0.0))
            neg_df = (jnp.where(rl_nv < 0, rl_n, 0.0),
                      jnp.where(rl_nv < 0, rl_lo_n, 0.0))
            w_df = _dfa(_dfa(pos_df, neg_df), _dfn(fmuz))
            w = w_df[0] + w_df[1]
        else:
            w = (positive_part(ru_nv) + negative_part(rl_nv)
                 - fac * mu_in * z_nv)
        err_in = jnp.maximum(
            jnp.maximum(infty_norm(w), infty_norm(se_nv)),
            infty_norm(dres_nv))

        # --- infeasibility certificates (solver.hpp:1028-1063) ---
        check = jnp.logical_or(
            s.k % settings.frequence_infeasibility_check == 0,
            settings.primal_infeasibility_solving)
        is_prim_inf = jnp.logical_and(check, primal_infeasibility_certificate(
            spec, settings, qp, ATdy, CTdz, dy, dz))
        is_dual_inf = jnp.logical_and(
            jnp.logical_and(check, jnp.logical_not(is_prim_inf)),
            dual_infeasibility_certificate(spec, settings, qp, Adx, Cdx, Hdx, dx))

        if settings.verbose:
            # inner-iteration diagnostic line (reference solver.hpp:1021-1027)
            _lb1 = (dy @ qp.b + positive_part(dz) @ qp.u
                    - negative_part(dz) @ qp.l)
            _lb2 = infty_norm((qp.A.T @ dy + qp.C.T @ dz) / (qp.delta_x * qp.c))
            _ub = settings.eps_primal_inf * jnp.maximum(
                infty_norm(unscale_y(qp, dy)), infty_norm(unscale_z(qp, dz)))
            jax.debug.print(
                "  [inner {k}] err_in={e:.3e} alpha={a:.3e} lin_err={le:.3e} "
                "|dy|={ndy:.3e} |dz|={ndz:.3e} pinf={pi} dinf={di} "
                "lb1={l1:.3e} lb2={l2:.3e} ub={u:.3e}",
                k=s.k, e=err_in, a=alpha, le=lin_err,
                ndy=infty_norm(dy), ndz=infty_norm(dz),
                pi=is_prim_inf, di=is_dual_inf, l1=_lb1, l2=_lb2, u=_ub)

        status_n = jnp.where(
            is_prim_inf,
            jnp.asarray(int(QPSolverOutput.PROXQP_PRIMAL_INFEASIBLE), s.status.dtype),
            jnp.where(
                is_dual_inf,
                jnp.asarray(int(QPSolverOutput.PROXQP_DUAL_INFEASIBLE), s.status.dtype),
                s.status))
        break_inf = jnp.logical_or(
            jnp.logical_and(is_prim_inf,
                            not settings.primal_infeasibility_solving),
            is_dual_inf)
        converged = err_in <= eps_int

        # Optional stall break (TPU addition, settings.inner_stall_iters;
        # see types.py for semantics -- disabled by default).
        improved = err_in < 0.999 * s.best_err
        stalls = jnp.where(improved, 0, s.stalls + 1)
        best_err = jnp.minimum(s.best_err, err_in)
        if settings.inner_stall_iters > 0:
            stalled = stalls >= settings.inner_stall_iters
        else:
            stalled = jnp.asarray(False)

        done_n = jnp.logical_or(
            jnp.logical_or(jnp.logical_or(small, break_inf), converged),
            stalled)
        iters_add = jnp.where(
            jnp.logical_and(done_n, jnp.logical_not(s.done)), s.k + 1, s.iters_add)

        # freeze the iterate on the stalled-step break (reference breaks
        # before applying the update)
        keep = small

        def sel(new, old):
            return jnp.where(keep, old, new)

        return InnerState(
            x=sel(x_n, s.x), y=sel(y_n, s.y), z=sel(z_n, s.z),
            ru=sel(ru_n, s.ru), rl=sel(rl_n, s.rl), se=sel(se_n, s.se),
            dual_res=sel(dual_res_n, s.dual_res),
            x_lo=sel(x_lo_n, s.x_lo), y_lo=sel(y_lo_n, s.y_lo),
            z_lo=sel(z_lo_n, s.z_lo),
            ru_lo=sel(ru_lo_n, s.ru_lo), rl_lo=sel(rl_lo_n, s.rl_lo),
            se_lo=sel(se_lo_n, s.se_lo), dres_lo=sel(dres_lo_n, s.dres_lo),
            active_up=up, active_low=low,
            dx=dx, dy=dy, dz=dz,
            err_in=sel(err_in, s.err_in), best_err=best_err, stalls=stalls,
            lin_err=lin_err, minres_iters=s.minres_iters + step_its,
            k=s.k + 1, iters_add=iters_add, status=status_n, done=done_n)

    init = InnerState(
        x=x, y=y, z=z, ru=ru, rl=rl, se=se, dual_res=dual_res,
        x_lo=lows[0], y_lo=lows[1], z_lo=lows[2],
        ru_lo=lows[3], rl_lo=lows[4], se_lo=lows[5], dres_lo=lows[6],
        active_up=jnp.zeros((spec.n_c,), bool),
        active_low=jnp.zeros((spec.n_c,), bool),
        dx=jnp.zeros_like(x), dy=jnp.zeros_like(y), dz=jnp.zeros_like(z),
        err_in=jnp.asarray(1e6, dtype), best_err=jnp.asarray(jnp.inf, dtype),
        stalls=jnp.asarray(0, jnp.int32),
        lin_err=jnp.asarray(0.0, dtype),
        minres_iters=jnp.asarray(0, jnp.int32),
        k=jnp.asarray(0, jnp.int32),
        iters_add=jnp.asarray(settings.max_iter_in + 1, jnp.int32),
        status=status, done=skip)

    def cond(s: InnerState):
        return jnp.logical_and(
            jnp.logical_not(s.done), s.k < settings.max_iter_in)

    return lax.while_loop(cond, body, init)


class OuterState(NamedTuple):
    x: jax.Array
    y: jax.Array
    z: jax.Array
    # double-float low words (zeros unless settings.high_accuracy)
    x_lo: jax.Array
    y_lo: jax.Array
    z_lo: jax.Array
    active_up: jax.Array
    active_low: jax.Array
    mu_eq: jax.Array
    mu_in: jax.Array
    bcl_eta_ext: jax.Array
    bcl_eta_in: jax.Array
    scaled_eps: jax.Array
    status: jax.Array
    done: jax.Array
    k: jax.Array          # outer iterations started
    iter: jax.Array       # total inner iterations (reference info.iter)
    iter_ext: jax.Array
    minres_iters: jax.Array
    mu_updates: jax.Array
    pri_res: jax.Array
    dua_res: jax.Array
    duality_gap: jax.Array
    lin_err: jax.Array
    se_out: jax.Array
    si_out: jax.Array


def _tree_select(pred, on_true, on_false):
    return jax.tree.map(lambda a, b: jnp.where(pred, a, b), on_true, on_false)


def qp_solve_core(
    spec: ProblemSpec,
    settings: Settings,
    qp: ScaledQP,
    x0: jax.Array,
    y0: jax.Array,
    z0: jax.Array,
    rho: jax.Array,
    mu_eq0: jax.Array,
    mu_in0: jax.Array,
    *,
    eq_init_guess: bool,
) -> Results:
    """Solve one (scaled) QP. Returns unscaled Results.

    x0/y0/z0 are scaled warm-start values (zeros for a cold start);
    eq_init_guess runs the equality-constrained initial guess
    (reference helpers.hpp:199-228) before the outer loop.
    """
    dtype = qp.H.dtype
    n, n_eq, n_c = spec.n, spec.n_eq, spec.n_c
    fac = _merit_factor(settings)
    ha = settings.high_accuracy

    op = KKTOperand(H=qp.H, A=qp.A, C=qp.C)
    backend = resolve_backend(spec, settings, dtype)
    matrixfree = backend in ("matrixfree", "primaldual")
    # Penalty floors (reference settings mu_min_eq=1e-9 / mu_min_in=1e-8).
    # Every f32 backend solves a KKT system whose conditioning grows like
    # 1/mu (Schur squares it further); iterative refinement contracts only
    # while cond * eps_machine < 1, so below mu ~ 10*eps_f32 ~ 1e-6 the
    # KKT solves lose contraction and the iterates diverge (observed NaN
    # at mu_eq=1e-9 on MINRES, and on the Schur+high-accuracy path on
    # Maros-Meszaros CVXQP1_S). The reference's own 1e-9 floor encodes the
    # same criterion for f64 (1e-9 * eps_f64 ~ 2e-7 < 1). The proximal
    # outer loop absorbs the larger floor with extra iterations, so
    # high-accuracy targets stay reachable (HA certifies 1e-9 with it).
    mu_min_eq = settings.mu_min_eq
    mu_min_in = settings.mu_min_in
    if jnp.finfo(dtype).bits < 64:
        mu_min_eq = max(mu_min_eq, 1e-6)
        mu_min_in = max(mu_min_in, 1e-6)
    if matrixfree:
        z0f = jnp.zeros((0,), dtype)
        factors = kkt.KKTFactors(
            Linv_P=jnp.zeros((0, 0), dtype), P_inv_diag=z0f,
            K_aa=jnp.zeros((0, 0), dtype), K_ac=jnp.zeros((0, 0), dtype),
            K_cc=jnp.zeros((0, 0), dtype))
    else:
        factors = kkt.factorize(spec, op, rho)

    x, y, z = x0, y0, z0
    df_fac = use_df_factor(spec, settings, dtype)
    if eq_init_guess:
        no_active = jnp.zeros((n_c,), bool)
        if backend == "matrixfree":
            sys0 = kkt.build_masked_system(spec, no_active, mu_eq0, mu_in0, dtype)
            solve_fn0 = kkt.minres_solve_fn(spec, settings, op, sys0, rho)
        elif backend == "primaldual":
            sys0 = kkt.build_masked_system(spec, no_active, mu_eq0, mu_in0, dtype)
            solve_fn0 = (kkt.primaldual_df_solve_fn(spec, op, sys0, rho)
                         if df_fac
                         else kkt.primaldual_solve_fn(spec, op, sys0, rho))
        else:
            sys0 = kkt.build_newton_system(spec, factors, no_active, mu_eq0, mu_in0)
            solve_fn0 = None
        gx, gy, _, _, init_minres_its = kkt.solve_with_refinement(
            spec, settings, factors, op, sys0, rho,
            -qp.g, qp.b, jnp.zeros((n_c,), dtype),
            jnp.asarray(1.0, dtype), solve_fn=solve_fn0, df_dw=df_fac)
        if df_fac:
            # seed the outer df iterate with the full init-guess precision
            (x, x_lo_init), (y, y_lo_init) = gx, gy
        else:
            x, y = gx, gy
            x_lo_init = y_lo_init = None
    else:
        x_lo_init = y_lo_init = None

    g_un_norm = infty_norm(qp.g / (qp.delta_x * qp.c))  # dual_feasibility_rhs_2
    # reference floor is min(eps_abs, 1e-9) (solver.hpp:1381); in single
    # precision that is unreachable and would spin the inner loop, so the
    # floor is clamped to ~10x machine epsilon for f32 runs.
    eps_in_min = min(settings.eps_abs, 1e-9)
    if jnp.finfo(dtype).bits < 64:
        # high-accuracy mode computes residuals in double-float, so the
        # inner loop can be trusted well below the plain-f32 noise floor
        eps_in_min = max(eps_in_min, 1e-8 if settings.high_accuracy else 1e-6)
    bcl_eta_ext_init = 0.1 ** settings.alpha_bcl

    def gap_ok(gap, rhs_gap):
        if not settings.check_duality_gap:
            return jnp.asarray(True)
        return jnp.abs(gap) <= (settings.eps_duality_gap_abs
                                + settings.eps_duality_gap_rel * rhs_gap)

    def solved_status(status):
        closest = jnp.logical_and(
            settings.primal_infeasibility_solving,
            status == int(QPSolverOutput.PROXQP_PRIMAL_INFEASIBLE))
        return jnp.where(
            closest,
            jnp.asarray(int(QPSolverOutput.PROXQP_SOLVED_CLOSEST_PRIMAL_FEASIBLE),
                        status.dtype),
            jnp.asarray(int(QPSolverOutput.PROXQP_SOLVED), status.dtype))

    def body(s: OuterState) -> OuterState:
        is_pinf = s.status == int(QPSolverOutput.PROXQP_PRIMAL_INFEASIBLE)

        # ---- top-of-iteration residuals (solver.hpp:1397-1429) ----
        pr = global_primal_residual(spec, settings, qp, s.x, is_pinf,
                                    x_lo=s.x_lo if ha else None)
        dr = global_dual_residual(
            spec, settings, qp, s.x, s.y, s.z, s.active_up, s.active_low,
            x_lo=s.x_lo if ha else None, y_lo=s.y_lo if ha else None,
            z_lo=s.z_lo if ha else None)

        if settings.verbose:
            # per-outer-iteration residual line (reference
            # solver.hpp:1478-1485); compiled out when verbose is False
            jax.debug.print(
                "[outer {k}] pri={p:.3e} dua={d:.3e} gap={g:.3e} "
                "mu_in={m:.1e}",
                k=s.k, p=pr.pri_lhs, d=dr.dua_lhs, g=dr.duality_gap,
                m=s.mu_in)

        rhs_pri = s.scaled_eps + settings.eps_rel * jnp.maximum(
            pr.eq_rhs_0, pr.in_rhs_0)
        rhs_dua = settings.eps_abs + settings.eps_rel * jnp.maximum(
            jnp.maximum(dr.rhs_3, dr.rhs_0), jnp.maximum(dr.rhs_1, g_un_norm))
        feas = jnp.logical_and(pr.pri_lhs <= rhs_pri, dr.dua_lhs <= rhs_dua)
        solved_now = jnp.logical_and(
            feas, gap_ok(dr.duality_gap, dr.rhs_duality_gap))

        top = s._replace(
            pri_res=pr.pri_lhs, dua_res=dr.dua_lhs,
            duality_gap=dr.duality_gap,
            se_out=pr.se_out, si_out=pr.si_out)
        solved_state = top._replace(
            status=solved_status(s.status), done=jnp.asarray(True))

        # ---- not converged: run an inner loop ----
        x_prev, y_prev, z_prev = s.x, s.y, s.z

        # shifted residuals seeding (solver.hpp:1517-1559); in HA mode the
        # seeds stay double-float (the shift term's own rounding is shared
        # with the inner criterion, so it cancels there)
        if ha:
            from .ops.df import df_add as _dfa
            shift_df = df_scale((z_prev, s.z_lo), fac * s.mu_in)
            tmp_df = _dfa((pr.Cx_scaled, pr.Cx_scaled_lo), shift_df)
            ru_df = df_add_f32(tmp_df, -qp.u)
            rl_df = df_add_f32(tmp_df, -qp.l)
            if qp.u_lo is not None:
                ru_df = df_add_f32(ru_df, -qp.u_lo)
                rl_df = df_add_f32(rl_df, -qp.l_lo)
            ru, ru_lo = ru_df
            rl, rl_lo = rl_df
            se, se_lo = pr.se_scaled, pr.se_scaled_lo
            dual_res, dres_lo = dr.dual_res_scaled, dr.dual_res_lo
        else:
            tmp = pr.Cx_scaled + fac * s.mu_in * z_prev
            ru = tmp - qp.u
            rl = tmp - qp.l
            se = pr.se_scaled
            dual_res = dr.dual_res_scaled
            ru_lo = rl_lo = jnp.zeros((n_c,), dtype)
            se_lo = jnp.zeros((n_eq,), dtype)
            dres_lo = jnp.zeros((n,), dtype)

        inner = inner_newton(
            spec, settings, qp, factors, op,
            s.x, s.y, s.z, ru, rl, se, dual_res,
            (s.x_lo, s.y_lo, s.z_lo, ru_lo, rl_lo, se_lo, dres_lo),
            x_prev,
            rho, s.mu_eq, s.mu_in, s.bcl_eta_in, s.status,
            skip=solved_now)

        it_total = s.iter + jnp.where(solved_now, 0, inner.iters_add)
        minres_total = s.minres_iters + jnp.where(
            solved_now, 0, inner.minres_iters)
        status = inner.status

        # ---- infeasibility exit: certificate becomes the solution
        # (solver.hpp:1572-1580) ----
        cert_exit = jnp.logical_or(
            jnp.logical_and(
                status == int(QPSolverOutput.PROXQP_PRIMAL_INFEASIBLE),
                not settings.primal_infeasibility_solving),
            status == int(QPSolverOutput.PROXQP_DUAL_INFEASIBLE))

        # ---- scaled_eps switch for closest-feasible solving
        # (solver.hpp:1581-1595) ----
        if settings.primal_infeasibility_solving:
            ones_eq = jnp.ones((n_eq,), dtype)
            ones_c = jnp.ones((n_c,), dtype)
            col = (qp.A.T @ (ones_eq / qp.delta_y)
                   + qp.C.T @ (ones_c / qp.delta_z)) / qp.delta_x
            new_scaled_eps = infty_norm(col) * settings.eps_abs
            trigger = jnp.logical_and(
                s.scaled_eps == settings.eps_abs,
                status == int(QPSolverOutput.PROXQP_PRIMAL_INFEASIBLE))
            scaled_eps = jnp.where(trigger, new_scaled_eps, s.scaled_eps)
        else:
            scaled_eps = s.scaled_eps

        # ---- post-inner residuals & early status (solver.hpp:1596-1666) ----
        is_pinf2 = status == int(QPSolverOutput.PROXQP_PRIMAL_INFEASIBLE)
        pr2 = global_primal_residual(spec, settings, qp, inner.x, is_pinf2,
                                     x_lo=inner.x_lo if ha else None)
        pri2_ok = pr2.pri_lhs <= (
            scaled_eps + settings.eps_rel * jnp.maximum(pr2.eq_rhs_0, pr2.in_rhs_0))
        dr2 = global_dual_residual(
            spec, settings, qp, inner.x, inner.y, inner.z,
            inner.active_up, inner.active_low,
            x_lo=inner.x_lo if ha else None,
            y_lo=inner.y_lo if ha else None,
            z_lo=inner.z_lo if ha else None)
        dua2_ok = dr2.dua_lhs <= (
            settings.eps_abs + settings.eps_rel * jnp.maximum(
                jnp.maximum(dr2.rhs_3, dr2.rhs_0), jnp.maximum(dr2.rhs_1, g_un_norm)))
        solved_post = jnp.logical_and(
            jnp.logical_and(pri2_ok, dua2_ok),
            gap_ok(dr2.duality_gap, dr2.rhs_duality_gap))
        status = jnp.where(
            jnp.logical_and(solved_post, jnp.logical_not(cert_exit)),
            solved_status(status), status)

        # ---- BCL / Martinez penalty update (solver.hpp:564-677) ----
        mu_eq, mu_in = s.mu_eq, s.mu_in
        shrunk_mu_eq = jnp.maximum(
            mu_eq * settings.mu_update_factor, mu_min_eq)
        shrunk_mu_in = jnp.maximum(
            mu_in * settings.mu_update_factor, mu_min_in)
        if settings.bcl_update:
            # safe_guard compares the cumulative inner-iteration count
            # (reference solver.hpp:583-584)
            good = jnp.logical_or(
                pr2.pri_lhs <= s.bcl_eta_ext, it_total > settings.safe_guard)
            new_mu_eq = jnp.where(good, mu_eq, shrunk_mu_eq)
            new_mu_in = jnp.where(good, mu_in, shrunk_mu_in)
            bcl_eta_ext = jnp.where(
                good,
                s.bcl_eta_ext * mu_in ** settings.beta_bcl,
                bcl_eta_ext_init * new_mu_in ** settings.alpha_bcl)
            bcl_eta_in = jnp.where(
                good,
                jnp.maximum(s.bcl_eta_in * mu_in, eps_in_min),
                jnp.maximum(new_mu_in, eps_in_min))
            # bad step restores previous duals (solver.hpp:598-599)
            y_post = jnp.where(good, inner.y, y_prev)
            z_post = jnp.where(good, inner.z, z_prev)
            y_post_lo = jnp.where(good, inner.y_lo, s.y_lo)
            z_post_lo = jnp.where(good, inner.z_lo, s.z_lo)
        else:
            good = pr2.pri_lhs <= 0.95 * pr.pri_lhs
            new_mu_eq = jnp.where(good, mu_eq, shrunk_mu_eq)
            new_mu_in = jnp.where(good, mu_in, shrunk_mu_in)
            bcl_eta_ext = s.bcl_eta_ext
            bcl_eta_in = jnp.maximum(s.bcl_eta_in * 0.1, eps_in_min)
            y_post, z_post = inner.y, inner.z
            y_post_lo, z_post_lo = inner.y_lo, inner.z_lo

        # ---- cold restart (solver.hpp:1693-1725) ----
        dr3 = global_dual_residual(
            spec, settings, qp, inner.x, y_post, z_post,
            inner.active_up, inner.active_low,
            x_lo=inner.x_lo if ha else None,
            y_lo=y_post_lo if ha else None,
            z_lo=z_post_lo if ha else None)
        cold = jnp.logical_and(
            jnp.logical_and(pr2.pri_lhs >= pr.pri_lhs, dr3.dua_lhs >= dr.dua_lhs),
            mu_in <= 1e-5)
        new_mu_eq = jnp.where(cold, settings.cold_reset_mu_eq, new_mu_eq)
        new_mu_in = jnp.where(cold, settings.cold_reset_mu_in, new_mu_in)
        mu_changed = jnp.logical_or(new_mu_eq != mu_eq, new_mu_in != mu_in)

        zv = jnp.zeros_like
        worked = OuterState(
            x=jnp.where(cert_exit, inner.dx, inner.x),
            y=jnp.where(cert_exit, inner.dy, y_post),
            z=jnp.where(cert_exit, inner.dz, z_post),
            x_lo=jnp.where(cert_exit, zv(inner.x_lo), inner.x_lo),
            y_lo=jnp.where(cert_exit, zv(inner.y_lo), y_post_lo),
            z_lo=jnp.where(cert_exit, zv(inner.z_lo), z_post_lo),
            active_up=inner.active_up, active_low=inner.active_low,
            mu_eq=new_mu_eq, mu_in=new_mu_in,
            bcl_eta_ext=bcl_eta_ext, bcl_eta_in=bcl_eta_in,
            scaled_eps=scaled_eps,
            # divergence break (TPU addition, no reference counterpart
            # needed there): a backend whose KKT solves have lost all
            # contraction (e.g. Schur on a vanishing H diagonal) can
            # drive the iterates to overflow/NaN; once residuals are
            # non-finite or astronomically large no convergence test can
            # ever pass again, so stop burning max_iter and return
            # MAX_ITER_REACHED -- the wrapper's primaldual fallback then
            # engages immediately.
            status=status,
            done=jnp.logical_or(
                cert_exit,
                jnp.logical_or(
                    jnp.logical_not(jnp.isfinite(
                        pr2.pri_lhs + dr2.dua_lhs)),
                    jnp.maximum(pr2.pri_lhs, dr2.dua_lhs) > 1e12)),
            k=s.k + 1, iter=it_total, iter_ext=s.iter_ext + 1,
            minres_iters=minres_total,
            mu_updates=s.mu_updates + mu_changed.astype(jnp.int32),
            pri_res=pr2.pri_lhs,
            dua_res=jnp.where(pri2_ok, dr2.dua_lhs, dr3.dua_lhs),
            duality_gap=jnp.where(pri2_ok, dr2.duality_gap, dr3.duality_gap),
            lin_err=inner.lin_err,
            se_out=pr2.se_out, si_out=pr2.si_out)

        return _tree_select(solved_now, solved_state, worked)

    init = OuterState(
        x=x, y=y, z=z,
        x_lo=(x_lo_init if (ha and x_lo_init is not None)
              else jnp.zeros((n,), dtype)),
        y_lo=(y_lo_init if (ha and y_lo_init is not None)
              else jnp.zeros((n_eq,), dtype)),
        z_lo=jnp.zeros((n_c,), dtype),
        active_up=jnp.zeros((n_c,), bool),
        active_low=jnp.zeros((n_c,), bool),
        mu_eq=mu_eq0, mu_in=mu_in0,
        bcl_eta_ext=jnp.asarray(bcl_eta_ext_init, dtype),
        bcl_eta_in=jnp.asarray(1.0, dtype),
        scaled_eps=jnp.asarray(settings.eps_abs, dtype),
        # MAX_ITER_REACHED until proven otherwise (results.hpp:172)
        status=jnp.asarray(int(QPSolverOutput.PROXQP_MAX_ITER_REACHED), jnp.int32),
        done=jnp.asarray(False),
        k=jnp.asarray(0, jnp.int32),
        iter=jnp.asarray(0, jnp.int32),
        iter_ext=jnp.asarray(0, jnp.int32),
        minres_iters=(init_minres_its if eq_init_guess
                      else jnp.asarray(0, jnp.int32)),
        mu_updates=jnp.asarray(0, jnp.int32),
        pri_res=jnp.asarray(0.0, dtype),
        dua_res=jnp.asarray(0.0, dtype),
        duality_gap=jnp.asarray(0.0, dtype),
        lin_err=jnp.asarray(0.0, dtype),
        se_out=jnp.zeros((n_eq,), dtype),
        si_out=jnp.zeros((n_c,), dtype))

    def cond(s: OuterState):
        return jnp.logical_and(jnp.logical_not(s.done), s.k < settings.max_iter)

    fin = lax.while_loop(cond, body, init)

    # ---- unscale and package (solver.hpp:1749-1781) ----
    if ha:
        # error-free unscale of the double-float solution (ops/df.py)
        x_un, x_un_lo = df_scale((fin.x, fin.x_lo), qp.delta_x)
        y_un, y_un_lo = df_div(df_scale((fin.y, fin.y_lo), qp.delta_y), qp.c)
        z_un, z_un_lo = df_div(df_scale((fin.z, fin.z_lo), qp.delta_z), qp.c)
    else:
        x_un = unscale_x(qp, fin.x)
        y_un = unscale_y(qp, fin.y)
        z_un = unscale_z(qp, fin.z)
        x_un_lo = y_un_lo = z_un_lo = None
    # hessian-type dispatch skips the dense matvec for Zero/Diagonal
    # (reference computes the objective on the typed model the same way)
    obj = (0.5 * fin.x @ _hdx(spec, qp, fin.x) + qp.g @ fin.x) / qp.c
    info = Info(
        mu_eq=fin.mu_eq, mu_in=fin.mu_in, rho=rho,
        iter=fin.iter, iter_ext=fin.iter_ext,
        # rho never changes inside a solve; the reference's rho_updates
        # counter is also never incremented anywhere (results.hpp:42 is
        # initialized to 0 and only printed) -- quirk parity
        mu_updates=fin.mu_updates, rho_updates=jnp.asarray(0, jnp.int32),
        status=fin.status, objValue=obj,
        pri_res=fin.pri_res, dua_res=fin.dua_res,
        duality_gap=fin.duality_gap, iterative_residual=fin.lin_err,
        minimal_H_eigenvalue_estimate=jnp.asarray(0.0, dtype),
        minres_iters=fin.minres_iters)
    return Results(x=x_un, y=y_un, z=z_un, se=fin.se_out, si=fin.si_out,
                   info=info, x_lo=x_un_lo, y_lo=y_un_lo, z_lo=z_un_lo)
