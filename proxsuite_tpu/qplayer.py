"""Differentiable QP layer (JAX-native QPLayer).

Counterpart of the reference torch QPLayer
(/root/reference/bindings/python/proxsuite/torch/qplayer.py:12-253,
QPFunction / QPFunctionFn): a `jax.custom_vjp` around the batched solve
whose backward pass is the extended-conservative-Jacobian adjoint solve
(backward.py). Works under vmap/jit/grad; batching is just `jax.vmap` of
the layer (the reference fans out with OpenMP instead).

The reference's feasible variant (structural_feasibility=True) maps
directly; the infeasible variant additionally turns on
primal_infeasibility_solving in the forward solve so gradients are taken
at the closest-feasible solution.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .api import build_scaled_qp, solve_scaled
from .backward import compute_backward, compute_backward_infeasible
from .types import ProblemSpec, Settings


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _qp_layer_core(spec, settings, backward_cfg, H, g, A, b, C, u, l,
                   u_box, l_box):
    qp = build_scaled_qp(
        spec, settings, H, g, A, b, C, u, l, u_box, l_box,
        execute_preconditioner=settings.compute_preconditioner)
    res = solve_scaled(spec, settings, qp)
    return res.x, res.y, res.z


def _qp_layer_fwd(spec, settings, backward_cfg, H, g, A, b, C, u, l,
                  u_box, l_box):
    qp = build_scaled_qp(
        spec, settings, H, g, A, b, C, u, l, u_box, l_box,
        execute_preconditioner=settings.compute_preconditioner)
    res = solve_scaled(spec, settings, qp)
    return (res.x, res.y, res.z), (qp, res.x, res.y, res.z)


def _qp_layer_bwd(spec, settings, backward_cfg, residuals, cotangents):
    qp, x, y, z = residuals
    dL_dx, dL_dy, dL_dz = cotangents
    eps_bwd, rho_bwd, mu_bwd = backward_cfg
    bd = compute_backward(
        spec, settings, qp, x, y, z, dL_dx, dL_dy, dL_dz,
        eps=eps_bwd, rho_backward=rho_bwd, mu_backward=mu_bwd)
    n_in = spec.n_in
    dC = bd.dL_dC[:n_in]
    du, dl = bd.dL_du[:n_in], bd.dL_dl[:n_in]
    if spec.box_constraints:
        du_box, dl_box = bd.dL_du[n_in:], bd.dL_dl[n_in:]
    else:
        du_box = jnp.zeros((0,), x.dtype)
        dl_box = jnp.zeros((0,), x.dtype)
    return (bd.dL_dH, bd.dL_dg, bd.dL_dA, bd.dL_db, dC, du, dl,
            du_box, dl_box)


_qp_layer_core.defvjp(_qp_layer_fwd, _qp_layer_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _qp_layer_infeas_core(spec, settings, backward_cfg, H, g, A, b, C, u, l):
    """Closest-feasible (infeasible) variant: returns (x, y, z, se, si).

    Counterpart of reference QPFunctionFn_infeas
    (bindings/python/proxsuite/torch/qplayer.py:255-610); the backward is
    the extended conservative-Jacobian adjoint
    (backward.compute_backward_infeasible), NOT the standard KKT adjoint.
    """
    qp = build_scaled_qp(
        spec, settings, H, g, A, b, C, u, l,
        jnp.zeros((0,), H.dtype), jnp.zeros((0,), H.dtype),
        execute_preconditioner=settings.compute_preconditioner)
    res = solve_scaled(spec, settings, qp)
    return res.x, res.y, res.z, res.se, res.si


def _qp_layer_infeas_fwd(spec, settings, backward_cfg, H, g, A, b, C, u, l):
    out = _qp_layer_infeas_core(spec, settings, backward_cfg,
                                H, g, A, b, C, u, l)
    return out, (H, A, C, l, u, *out)


def _qp_layer_infeas_bwd(spec, settings, backward_cfg, residuals, cots):
    H, A, C, l, u, x, y, z, se, si = residuals
    gx, gy, gz, gse, gsi = cots
    eps_bwd, rho_bwd, _ = backward_cfg
    bd = compute_backward_infeasible(
        H, A, C, l, u, x, y, z, se, si, gx, gy, gz, gse, gsi,
        rho_backward=rho_bwd,
        eps_active=max(10.0 * settings.eps_abs, 1e-9))
    return (bd.dL_dH, bd.dL_dg, bd.dL_dA, bd.dL_db, bd.dL_dC,
            bd.dL_du, bd.dL_dl)


_qp_layer_infeas_core.defvjp(_qp_layer_infeas_fwd, _qp_layer_infeas_bwd)


def QPFunction(
    eps: float = 1e-9,
    maxIter: int = 1000,
    eps_backward: float = 1e-4,
    rho_backward: float = 1e-6,
    mu_backward: float = 1e-6,
    structural_feasibility: bool = True,
    settings: Optional[Settings] = None,
):
    """Differentiable QP layer factory (reference qplayer.py:12-89).

    Returns `layer(Q, p, A, b, G, l, u)` solving
        min 0.5 x'Qx + p'x  s.t.  Ax = b,  l <= Gx <= u
    and returning (x, y, z), differentiable wrt every input. Batched inputs
    (leading axis on every argument) are dispatched through vmap.

    Wrap repeated calls (training loops) in `jax.jit`: an eager call
    re-traces the solver loops every time.
    """
    base = settings or Settings()
    base = base.replace(
        eps_abs=eps, max_iter=maxIter,
        primal_infeasibility_solving=not structural_feasibility)
    backward_cfg = (eps_backward, rho_backward, mu_backward)

    def layer(Q, p, A=None, b=None, G=None, l=None, u=None):
        p = jnp.asarray(p)
        batched = p.ndim == 2
        n = p.shape[-1]
        dtype = p.dtype

        def norm(M, shape2):
            if M is None:
                lead = (p.shape[0],) if batched else ()
                return jnp.zeros(lead + shape2, dtype)
            return jnp.asarray(M, dtype)

        Q = norm(Q, (n, n))
        A = norm(A, (0, n))
        b = norm(b, (0,))
        G = norm(G, (0, n))
        n_eq = A.shape[-2]
        n_in = G.shape[-2]
        l = norm(l, (n_in,))
        u = norm(u, (n_in,))
        ub = norm(None, (0,))
        lb = norm(None, (0,))
        spec = ProblemSpec(n=n, n_eq=n_eq, n_in=n_in, box_constraints=False)

        if structural_feasibility:
            fn = functools.partial(_qp_layer_core, spec, base, backward_cfg)
            if batched:
                return jax.vmap(fn)(Q, p, A, b, G, u, l, ub, lb)
            return fn(Q, p, A, b, G, u, l, ub, lb)
        # infeasible variant returns (x, y, z, se, si) like the reference
        fn = functools.partial(
            _qp_layer_infeas_core, spec, base, backward_cfg)
        if batched:
            return jax.vmap(fn)(Q, p, A, b, G, u, l)
        return fn(Q, p, A, b, G, u, l)

    return layer
