"""Exact primal-dual linesearch, fully vectorized.

Re-implements the semantics of the reference exact linesearch
(/root/reference/include/proxsuite/proxqp/dense/linesearch.hpp:320-538):
the merit function phi(alpha) is piecewise-quadratic in alpha with
breakpoints where an inequality toggles activity; its derivative
phi'(alpha) = a(alpha) * alpha + b(alpha) is piecewise-affine and
monotonically non-decreasing, so the optimum is the unique zero crossing.

The reference collects the breakpoints in a dynamic vector, sorts them, and
walks them serially, evaluating the derivative O(active breakpoints) times.
That is unjittable -- and a sort is also TPU-hostile. Because phi' is
monotonically non-decreasing, no sort is needed at all: evaluate phi' at
ALL 2*n_c candidates at once (masked (K, n_c) reductions, MXU food), then
the bracket around the zero crossing is simply

    alpha_neg = max { alpha_k : phi'(alpha_k) <  0 }
    alpha_pos = min { alpha_k : phi'(alpha_k) >= 0 }

-- two masked reductions -- followed by the closed-form interpolation of
linesearch.hpp:527-537. (An earlier sort-based version measured 33 ms per
batched call on TPU v5e vs <1 ms for the whole rest of the Newton step.)
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..types import MeritFunctionType, Settings


class LinesearchOperand(NamedTuple):
    """Quantities fixed during one linesearch (all scaled space)."""

    x: jax.Array
    x_prev: jax.Array
    y: jax.Array
    z: jax.Array
    se: jax.Array      # Ax - b + mu_eq (y_prev - y), scaled
    ru: jax.Array      # C x - u + mu_in z_prev (+ GPDAL shift), scaled
    rl: jax.Array      # C x - l + mu_in z_prev (+ GPDAL shift), scaled
    g: jax.Array       # scaled gradient
    dx: jax.Array
    dy: jax.Array
    dz: jax.Array
    Hdx: jax.Array
    Adx: jax.Array
    Cdx: jax.Array     # includes the GPDAL (alpha_gpdal-1)*mu_in*dz correction
    rho: jax.Array
    mu_eq: jax.Array
    mu_in: jax.Array


def _derivative_coeffs(settings: Settings, o: LinesearchOperand, alphas: jax.Array):
    """phi'(alpha_k) = a_k * alpha_k + b_k for a batch of candidate alphas.

    PDAL coefficients: reference primal_dual_derivative_results
    (linesearch.hpp:178-311). GPDAL: gpdal_derivative_results
    (linesearch.hpp:49-167). nu == 1 always (results.hpp:128).
    Returns (a, b, grad) each of shape alphas.shape.
    """
    mu_eq_inv = 1.0 / o.mu_eq
    mu_in_inv = 1.0 / o.mu_in
    gpdal = settings.merit_function_type == MeritFunctionType.GPDAL
    alpha_g = settings.alpha_gpdal

    # ---- alpha-independent scalar pieces ----
    a0 = (o.dx @ o.Hdx) + mu_eq_inv * (o.Adx @ o.Adx) + o.rho * (o.dx @ o.dx)
    err_eq = o.Adx - o.mu_eq * o.dy
    a0 = a0 + mu_eq_inv * (err_eq @ err_eq)
    gx = o.rho * (o.x - o.x_prev) + o.g
    b0 = (o.x @ o.Hdx) + (gx @ o.dx) \
        + mu_eq_inv * (o.Adx @ (o.se + o.mu_eq * o.y)) \
        + mu_eq_inv * (err_eq @ o.se)
    if gpdal:
        a0 = a0 + o.mu_in * (1.0 - alpha_g) * (o.dz @ o.dz)
        b0 = b0 + o.mu_in * (1.0 - alpha_g) * (o.dz @ o.z)

    # ---- alpha-dependent inequality pieces, batched over candidates ----
    # up_k,i = ru_i + alpha_k Cdx_i > 0 ; low_k,i = rl_i + alpha_k Cdx_i < 0
    al = alphas[:, None]
    up = (o.ru[None, :] + al * o.Cdx[None, :]) > 0
    low = (o.rl[None, :] + al * o.Cdx[None, :]) < 0
    act = jnp.logical_or(up, low)
    Cdx_act = jnp.where(act, o.Cdx[None, :], 0.0)          # (K, n_c)
    act_part = jnp.where(up, o.ru[None, :], 0.0) + jnp.where(low, o.rl[None, :], 0.0)

    if gpdal:
        a_in = mu_in_inv / alpha_g * jnp.sum(Cdx_act * Cdx_act, axis=1)
        b_in = mu_in_inv / alpha_g * jnp.sum(act_part * Cdx_act, axis=1)
    else:
        a_in = mu_in_inv * jnp.sum(Cdx_act * Cdx_act, axis=1)
        b_in = mu_in_inv * jnp.sum(act_part * Cdx_act, axis=1)
        err_in = Cdx_act - o.mu_in * o.dz[None, :]
        act_shift = act_part - o.mu_in * o.z[None, :]
        a_in = a_in + mu_in_inv * jnp.sum(err_in * err_in, axis=1)
        b_in = b_in + mu_in_inv * jnp.sum(err_in * act_shift, axis=1)

    a = a0 + a_in
    b = b0 + b_in
    return a, b, a * alphas + b


def primal_dual_linesearch(settings: Settings, o: LinesearchOperand) -> jax.Array:
    """Exact step size alpha* (reference primal_dual_ls, linesearch.hpp:320-538)."""
    dtype = o.Cdx.dtype
    n_c = o.Cdx.shape[0]
    if n_c == 0:
        return jnp.asarray(1.0, dtype)
    eps_machine = jnp.finfo(dtype).eps
    inf = jnp.asarray(jnp.inf, dtype)

    # Step 1: candidate breakpoints -ru/Cdx and -rl/Cdx, kept if > eps
    # (linesearch.hpp:378-391). No sort: validity handled by masks.
    denom = o.Cdx + eps_machine
    cand = jnp.concatenate([-o.ru / denom, -o.rl / denom])
    valid = jnp.logical_and(jnp.tile(o.Cdx != 0, 2), cand > eps_machine)
    has_bp = jnp.any(valid)

    # Step 2.1: one batched derivative evaluation at [candidates..., 0].
    # The trailing 0 entry provides phi'(0) and the no-breakpoint quadratic
    # coefficients in the same call.
    K = cand.shape[0]
    eval_pts = jnp.concatenate(
        [jnp.where(valid, cand, 0.0), jnp.zeros((1,), dtype)])
    a_all, b_all, g_all = _derivative_coeffs(settings, o, eval_pts)
    grads = g_all[:K]
    g0, a_z, b_z = g_all[K], a_all[K], b_all[K]

    # Monotone phi' -> the crossing is bracketed by the largest candidate
    # with negative slope and the smallest with non-negative slope.
    neg_mask = jnp.logical_and(valid, grads < 0)
    pos_mask = jnp.logical_and(valid, grads >= 0)
    has_neg = jnp.any(neg_mask)
    alpha_neg = jnp.max(jnp.where(neg_mask, cand, -inf), initial=-inf)
    alpha_pos = jnp.min(jnp.where(pos_mask, cand, inf), initial=inf)
    grad_neg = jnp.max(jnp.where(neg_mask, grads, -inf), initial=-inf)
    grad_pos = jnp.min(jnp.where(pos_mask, grads, inf), initial=inf)
    # 2.2: anchor at 0 when no candidate has negative slope
    alpha_neg = jnp.where(has_neg, alpha_neg, 0.0)
    grad_neg = jnp.where(has_neg, grad_neg, g0)

    # 2.3 closed forms
    # (a) crossing bracketed: affine interpolation (linesearch.hpp:527-537)
    interp = jnp.abs(
        alpha_neg - grad_neg * (alpha_pos - alpha_neg) / (grad_pos - grad_neg))
    # (b) no positive grad among finite candidates: phi' affine beyond the
    #     last breakpoint; solve a*alpha+b = 0 there (linesearch.hpp:496-526)
    a_t, b_t, _ = _derivative_coeffs(
        settings, o, (2.0 * alpha_neg + 1.0)[None])
    beyond = -b_t[0] / a_t[0]
    # (c) no breakpoints at all: single quadratic, evaluate at 0
    no_bp = -b_z / a_z

    finite_pos = jnp.isfinite(alpha_pos)
    alpha = jnp.where(finite_pos, interp, beyond)
    alpha = jnp.where(has_bp, alpha, no_bp)
    # A degenerate direction (e.g. the zero direction a failed KKT solve
    # now returns, see ops/kkt.py solve_with_refinement) makes every
    # closed form 0/0 -> NaN; alpha = 0 keeps the iterate unchanged so
    # the inner stall break / backend fallback machinery engages with
    # finite state instead of poisoning x with NaN.
    return jnp.where(jnp.isfinite(alpha), alpha, jnp.zeros((), dtype))
