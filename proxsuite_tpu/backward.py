"""QP solution differentiation (extended-conservative-Jacobian adjoint).

Re-implements reference compute_backward / compute_backward_loss_ESG
(/root/reference/include/proxsuite/proxqp/dense/compute_ECJ.hpp:29-188):
rebuild the active-set KKT system at the solution with fresh small proximal
parameters (rho=mu=1e-6), solve one adjoint system with the incoming loss
derivatives as right-hand side, and form the parameter gradients as outer
products. On TPU this is one masked Schur factorization + solve
(see ops/kkt.py) and a handful of rank-1 outer products -- all batched
MXU work under vmap.

Box constraints are handled uniformly through the extended inequality rows;
the gradients for box rows surface as dL_du_box / dL_dl_box.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .ops import kkt
from .ops.kkt import KKTOperand
from .ops.residuals import ScaledQP, unscale_x, unscale_y, unscale_z
from .types import ProblemSpec, Settings


class BackwardData(NamedTuple):
    """Loss gradients wrt the QP data (reference backward_data.hpp:26-128).

    dL_dC/dL_du/dL_dl cover the extended inequality rows: the first n_in
    rows are the generic constraints, trailing n rows (when box) give
    dL_du_box/dL_dl_box (dL_dC box rows are diagonal and unused).
    """

    dL_dH: jax.Array
    dL_dg: jax.Array
    dL_dA: jax.Array
    dL_db: jax.Array
    dL_dC: jax.Array
    dL_du: jax.Array
    dL_dl: jax.Array


def compute_backward(
    spec: ProblemSpec,
    settings: Settings,
    qp: ScaledQP,
    x: jax.Array,           # unscaled solution
    y: jax.Array,
    z: jax.Array,
    dL_dx: jax.Array,
    dL_dy: jax.Array,
    dL_dz: jax.Array,
    eps: float = 1e-4,
    rho_backward: float = 1e-6,
    mu_backward: float = 1e-6,
) -> BackwardData:
    """One adjoint solve at the (unscaled) solution -> parameter gradients."""
    with jax.default_matmul_precision("highest"):  # see ops/chol.py
        return _compute_backward_hp(
            spec, settings, qp, x, y, z, dL_dx, dL_dy, dL_dz,
            eps, rho_backward, mu_backward)


def _compute_backward_hp(
    spec, settings, qp, x, y, z, dL_dx, dL_dy, dL_dz,
    eps, rho_backward, mu_backward,
) -> BackwardData:
    dtype = qp.H.dtype
    rho = jnp.asarray(rho_backward, dtype)
    mu = jnp.asarray(mu_backward, dtype)

    # active set at the solution, unscaled (compute_ECJ.hpp:51-58):
    # up_i : (C x + z - u)_i >= 0 ; low_i : (C x + z - l)_i <= 0
    C_un = qp.C / qp.delta_z[:, None] / qp.delta_x[None, :]
    Cxz = C_un @ x + z
    up = (Cxz - qp.u_orig) >= 0
    low = (Cxz - qp.l_orig) <= 0
    active = jnp.logical_or(up, low)

    # fresh factorization with backward proximal parameters
    # (compute_ECJ.hpp:63-88)
    op = KKTOperand(H=qp.H, A=qp.A, C=qp.C)
    factors = kkt.factorize(spec, op, rho)
    sys = kkt.build_newton_system(spec, factors, active, mu, mu)

    # scaled adjoint rhs (compute_ECJ.hpp:90-112)
    r1 = -dL_dx * (qp.delta_x * qp.c)
    r2 = -dL_dy * qp.delta_y
    r3 = jnp.where(active, -dL_dz * qp.delta_z, 0.0)
    kx, ky, kzJ, _ = kkt.solve_with_refinement(
        spec, settings, factors, op, sys, rho, r1, r2, r3,
        jnp.asarray(eps, dtype))
    # inactive adjoint z entries take the raw incoming derivative, then get
    # dual-unscaled like the rest (compute_ECJ.hpp:132-151, quirk preserved)
    kz = jnp.where(active, kzJ, dL_dz)

    kx_un = unscale_x(qp, kx)
    ky_un = unscale_y(qp, ky)
    kz_un = unscale_z(qp, kz)

    # outer-product gradients (compute_ECJ.hpp:153-188)
    dL_dC = jnp.outer(kz_un, x) + jnp.outer(z, kx_un)
    dL_du = jnp.where(up, -kz_un, 0.0)
    dL_dl = jnp.where(low, -kz_un, 0.0)
    dL_dA = jnp.outer(ky_un, x) + jnp.outer(y, kx_un)
    dL_db = -ky_un
    dL_dH = 0.5 * (jnp.outer(kx_un, x) + jnp.outer(x, kx_un))
    dL_dg = kx_un
    return BackwardData(dL_dH=dL_dH, dL_dg=dL_dg, dL_dA=dL_dA, dL_db=dL_db,
                        dL_dC=dL_dC, dL_du=dL_du, dL_dl=dL_dl)
