"""PyTorch bridge for the differentiable QP layer.

Drop-in counterpart of the reference torch QPLayer
(/root/reference/bindings/python/proxsuite/torch/qplayer.py:12-253):
`QPFunction(...)` returns a callable taking torch tensors
(Q, p, A, b, G, l, u), solving the batch of QPs on the JAX/TPU backend,
and differentiating through torch autograd via the adjoint backward pass.

The reference fans the batch out with OpenMP threads; here the batch is a
single vmapped XLA program (parallel/batch.py rationale). Tensors cross
the torch<->JAX boundary through NumPy (CPU torch in this image; a
dlpack fast path can be added for device-resident tensors).
"""
from __future__ import annotations

import functools

import numpy as np

# torch is imported LAZILY (first QPFunction call), not at module import:
# torch's OpenMP runtime, allocator hooks, and signal handlers co-resident
# with XLA's compiler threads for a whole pytest session are a suspected
# source of rare in-process SIGSEGVs (pytest collection imports every test
# module -- an eager import here put torch in EVERY suite run's process).
torch = None


def _torch():
    global torch
    if torch is None:
        try:
            import torch as _t
        except ImportError:  # pragma: no cover - torch is optional
            raise ImportError(
                "proxsuite_tpu.torch.qplayer requires pytorch")
        torch = _t
    return torch


import jax
import jax.numpy as jnp

from ..api import build_scaled_qp, solve_scaled
from ..backward import compute_backward, compute_backward_infeasible
from ..types import ProblemSpec, Settings


def _to_np(t):
    return t.detach().cpu().numpy().astype(np.float64)


@functools.lru_cache(maxsize=64)
def _forward_fn(spec: ProblemSpec, settings: Settings):
    def one(H, g, A, b, C, u_, l_):
        qp = build_scaled_qp(
            spec, settings, H, g, A, b, C, u_, l_,
            jnp.zeros((0,), H.dtype), jnp.zeros((0,), H.dtype),
            execute_preconditioner=settings.compute_preconditioner)
        res = solve_scaled(spec, settings, qp)
        return qp, res.x, res.y, res.z, res.se, res.si
    return jax.jit(jax.vmap(one))


@functools.lru_cache(maxsize=64)
def _infeas_backward_fn(spec: ProblemSpec, rho_backward: float,
                        eps_active: float):
    def one(H, A, C, l_, u_, x, y, z, se, si, gx, gy, gz, gse, gsi):
        return compute_backward_infeasible(
            H, A, C, l_, u_, x, y, z, se, si, gx, gy, gz, gse, gsi,
            rho_backward=rho_backward, eps_active=eps_active)
    return jax.jit(jax.vmap(one))


@functools.lru_cache(maxsize=64)
def _backward_fn(spec: ProblemSpec, settings: Settings,
                 eps_backward: float, rho_backward: float,
                 mu_backward: float):
    def one(qp, x, y, z, gx, gy, gz):
        return compute_backward(
            spec, settings, qp, x, y, z, gx, gy, gz,
            eps=eps_backward, rho_backward=rho_backward,
            mu_backward=mu_backward)
    return jax.jit(jax.vmap(one))


def QPFunction(
    eps: float = 1e-9,
    maxIter: int = 1000,
    eps_backward: float = 1e-4,
    rho_backward: float = 1e-6,
    mu_backward: float = 1e-6,
    omp_parallel: bool = False,  # accepted for API parity; batching is vmap
    structural_feasibility: bool = True,
):
    """Reference-compatible factory (qplayer.py:12-89)."""
    torch = _torch()  # lazy: see module docstring

    settings = Settings(
        eps_abs=eps, max_iter=maxIter,
        primal_infeasibility_solving=not structural_feasibility)

    def _expand_params(Q, p, A, b, G, l, u):
        """Broadcast unbatched params over the batch (reference
        utils.py expandParam: any param may omit the batch axis)."""
        batched = max(Q.dim() - 1, p.dim(), A.dim() - 1, G.dim() - 1) == 2
        if not batched:
            return False, tuple(t.unsqueeze(0) for t in (Q, p, A, b, G, l, u))
        nB = max(t.shape[0] if t.dim() == d else 1 for t, d in
                 ((Q, 3), (p, 2), (A, 3), (b, 2), (G, 3), (l, 2), (u, 2)))

        def ex(t, d):
            if t.dim() == d - 1:
                t = t.unsqueeze(0)
            return t.expand(nB, *t.shape[1:]) if t.shape[0] == 1 and nB > 1 \
                else t
        return True, (ex(Q, 3), ex(p, 2), ex(A, 3), ex(b, 2),
                      ex(G, 3), ex(l, 2), ex(u, 2))

    def _run_forward(ctx, Q, p, A, b, G, l, u):
        batched, (Q, p, A, b, G, l, u) = _expand_params(Q, p, A, b, G, l, u)
        ctx.batched_inputs = (Q, A, G, l, u)
        nBatch, n = p.shape
        n_eq = A.shape[1] if A.numel() else 0
        n_in = G.shape[1] if G.numel() else 0
        spec = ProblemSpec(n=n, n_eq=n_eq, n_in=n_in)

        arrays = tuple(jnp.asarray(_to_np(t)) for t in (Q, p, A, b, G, u, l))
        qp_s, xs, ys, zs, ses, sis = _forward_fn(spec, settings)(*arrays)
        ctx.spec, ctx.settings = spec, settings
        ctx.qp_scaled = qp_s
        ctx.sol = (xs, ys, zs)
        ctx.batched = batched
        return xs, ys, zs, ses, sis

    def _run_backward(ctx, dl_dx, dl_dy, dl_dz):
        spec, settings = ctx.spec, ctx.settings
        xs, ys, zs = ctx.sol
        if not ctx.batched:
            dl_dx, dl_dy, dl_dz = (t.unsqueeze(0) for t in
                                   (dl_dx, dl_dy, dl_dz))
        gx = jnp.asarray(_to_np(dl_dx))
        gy = jnp.asarray(_to_np(dl_dy))
        gz = jnp.asarray(_to_np(dl_dz))

        bd = _backward_fn(spec, settings, eps_backward, rho_backward,
                          mu_backward)(ctx.qp_scaled, xs, ys, zs, gx, gy, gz)
        outs = (bd.dL_dH, bd.dL_dg, bd.dL_dA, bd.dL_db,
                bd.dL_dC, bd.dL_dl, bd.dL_du)
        outs = tuple(torch.from_numpy(np.asarray(o)) for o in outs)
        if not ctx.batched:
            outs = tuple(o.squeeze(0) for o in outs)
        return outs

    class QPFunctionFn(torch.autograd.Function):
        """Feasible path (reference qplayer.py:91-253)."""

        @staticmethod
        def forward(ctx, Q, p, A, b, G, l, u):
            xs, ys, zs, _, _ = _run_forward(ctx, Q, p, A, b, G, l, u)
            out = tuple(torch.from_numpy(np.asarray(v)) for v in (xs, ys, zs))
            if not ctx.batched:
                out = tuple(t.squeeze(0) for t in out)
            return out

        @staticmethod
        def backward(ctx, dl_dx, dl_dy, dl_dz):
            return _run_backward(ctx, dl_dx, dl_dy, dl_dz)

    class QPFunctionFn_infeas(torch.autograd.Function):
        """Closest-feasible path (reference qplayer.py:255-610,
        QPFunctionFn_infeas): the forward solve runs with
        primal_infeasibility_solving, returning also the optimal shifts
        (s_e, s_i) to the closest feasible problem. Gradients are the
        extended conservative-Jacobian adjoint of the shifted optimality
        system (backward.compute_backward_infeasible), NOT the standard
        KKT adjoint -- the solution does not satisfy the original KKT.
        """

        @staticmethod
        def forward(ctx, Q, p, A, b, G, l, u):
            xs, ys, zs, ses, sis = _run_forward(ctx, Q, p, A, b, G, l, u)
            ctx.sol_full = (xs, ys, zs, ses, sis)
            # always-batched raw-data copies (ADVICE r1: storing possibly
            # 2-D/1-D inputs crashed the batched backward)
            ctx.data = tuple(jnp.asarray(_to_np(t))
                             for t in ctx.batched_inputs)
            out = tuple(torch.from_numpy(np.asarray(v))
                        for v in (xs, ys, zs, ses, sis))
            if not ctx.batched:
                out = tuple(t.squeeze(0) for t in out)
            return out

        @staticmethod
        def backward(ctx, dl_dx, dl_dy, dl_dz, dl_dse, dl_dsi):
            Q_b, A_b, G_b, l_b, u_b = ctx.data
            xs, ys, zs, ses, sis = ctx.sol_full
            was_batched = ctx.batched
            if not was_batched:
                dl_dx, dl_dy, dl_dz, dl_dse, dl_dsi = (
                    t.unsqueeze(0) for t in
                    (dl_dx, dl_dy, dl_dz, dl_dse, dl_dsi))
            cots = tuple(jnp.asarray(_to_np(t)) for t in
                         (dl_dx, dl_dy, dl_dz, dl_dse, dl_dsi))
            spec = ctx.spec
            bd = _infeas_backward_fn(spec, rho_backward,
                                     max(10.0 * eps, 1e-9))(
                Q_b, A_b, G_b, l_b, u_b, xs, ys, zs, ses, sis, *cots)
            outs = [torch.from_numpy(np.asarray(o)) for o in
                    (bd.dL_dH, bd.dL_dg, bd.dL_dA, bd.dL_db,
                     bd.dL_dC, bd.dL_dl, bd.dL_du)]
            if not was_batched:
                outs = [o.squeeze(0) for o in outs]
            return tuple(outs)

    if structural_feasibility:
        return QPFunctionFn.apply
    return QPFunctionFn_infeas.apply
