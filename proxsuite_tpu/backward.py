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
    kx, ky, kzJ, _, _ = kkt.solve_with_refinement(
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


def compute_backward_infeasible(
    H: jax.Array,
    A: jax.Array,
    C: jax.Array, l: jax.Array, u: jax.Array,
    x: jax.Array, y: jax.Array, z: jax.Array,
    se: jax.Array, si: jax.Array,
    dL_dx: jax.Array, dL_dy: jax.Array, dL_dnu: jax.Array,
    dL_dse: jax.Array, dL_dsi: jax.Array,
    rho_backward: float = 1e-6,
    eps_active: float = 1e-8,
) -> BackwardData:
    """Extended conservative-Jacobian adjoint at a closest-feasible solution.

    Counterpart of the reference QPFunctionFn_infeas.backward
    (/root/reference/bindings/python/proxsuite/torch/qplayer.py:371-610):
    the standard KKT adjoint (compute_backward above) does NOT apply when
    the forward solve ran with primal_infeasibility_solving -- the solution
    satisfies the *shifted* problem's optimality plus the shift-optimality
    relations, so the Jacobian system is a larger, asymmetric one. The
    reference assembles that system over the ONE-SIDED form (G~=[-C; C],
    h=[-l; u]) with nonsmooth-selection masks D1/D2 and solves it in the
    least-squares sense (it feeds it to sparse ProxQP as an infeasible
    equality-constrained QP); here the same system is assembled densely and
    solved via Tikhonov-regularized normal equations -- one fixed-shape
    SPD solve, vmappable.

    All inputs are UNSCALED. z and si are the native two-sided multiplier /
    shift; cotangents dL_dnu/dL_dsi are wrt those two-sided outputs.

    Deviation from the reference (deliberate): the reference maps the
    one-sided G-gradient back by keeping only the +G block
    (`dGs[n_in_sol:, :]`), dropping the -G block's contribution, which
    zeroes dL_dC rows whose LOWER side is active. The chain rule through
    G~ = [-C; C] is dL_dC = -dG~[:n_in] + dG~[n_in:]; that is what is
    returned here (finite-difference verified in
    tests/test_torch_qplayer.py).
    """
    dtype = x.dtype
    n = x.shape[0]
    n_eq = y.shape[0]
    n_in = z.shape[0]
    nin2 = 2 * n_in
    delta = jnp.asarray(rho_backward, dtype)

    # Robustness deviation from the reference: at a primal-infeasible
    # problem the AL multipliers diverge along the shift direction,
    # (y, z) = (y_bounded, z_bounded) + kappa (s_e, s_i) with kappa growing
    # with iteration count (observed kappa ~ 1e8 at eps=1e-10). The
    # reference feeds the diverging multipliers into the outer products and
    # relies on its least-squares adjoint returning dx EXACTLY in the
    # subspace that annihilates them; with a Tikhonov-regularized solve the
    # O(delta) component of dx would be amplified by kappa into garbage.
    # Projecting out the diverging component first gives the shifted
    # problem's bounded multipliers -- identical gradients where the
    # reference is exact, stable everywhere.
    # only engage the projection for macroscopic shifts: at a FEASIBLE
    # problem the shifts are solver noise (~eps_abs) and dividing by their
    # norm would manufacture a huge spurious kappa
    shift_norm = jnp.maximum(jnp.max(jnp.abs(se), initial=0.0),
                             jnp.max(jnp.abs(si), initial=0.0))
    shift_sq = se @ se + si @ si
    kappa = jnp.where(shift_norm > 1e3 * eps_active,
                      (y @ se + z @ si) / (shift_sq + 1e-300), 0.0)
    y_b = y - kappa * se      # bounded (shifted-problem) multipliers,
    z_b = z - kappa * si      # used in the gradient outer products only

    # one-sided quantities (reference forward :274-276, :349-366);
    # masks/active-set signs use the ORIGINAL multipliers (the divergent
    # component is what makes them decisive on violated rows)
    Gt = jnp.concatenate([-C, C], axis=0)              # (nin2, n)
    z_os = jnp.concatenate(
        [jnp.maximum(-z, 0.0), jnp.maximum(z, 0.0)])   # one-sided multiplier
    z_os_b = jnp.concatenate(
        [jnp.maximum(-z_b, 0.0), jnp.maximum(z_b, 0.0)])
    Cx = C @ x
    slack = jnp.concatenate([l - Cx, Cx - u])          # G~ x - h
    si_pos = jnp.maximum(slack, 0.0)                   # P_2_c_s_i

    # nonsmooth selection masks (reference :434-437,:455-460). The
    # reference compares the slack against exactly 0; an active row's slack
    # is only zero to solver accuracy (+-eps_abs), and a +1e-11 residue
    # flips P2 and corrupts the adjoint. eps_active (>= forward eps_abs)
    # absorbs that noise; genuinely violated rows at infeasible problems
    # have macroscopic slack.
    P1 = (jnp.minimum(slack, 0.0) + z_os) >= -eps_active
    P2 = slack <= eps_active
    d1 = P1.astype(dtype)       # diag(D_1)
    d1c = 1.0 - d1
    d2 = P2.astype(dtype)
    d2c = 1.0 - d2

    # two-sided -> one-sided cotangent placement (reference :478-502):
    # active_set = upper side active (two-sided z >= 0)
    act = (z >= 0.0)
    r3 = jnp.concatenate([jnp.where(act, 0.0, dL_dnu),
                          jnp.where(act, -dL_dnu, 0.0)])
    r5 = jnp.concatenate([jnp.where(act, 0.0, dL_dsi),
                          jnp.where(act, -dL_dsi, 0.0)])

    # unknowns w = [dx(n), dlam(n_eq), dnu(nin2), w4(nin2), b5(n?), b6(n)]
    has_eq = n_eq > 0
    nb5 = n if has_eq else 0
    n_col = n + n_eq + 2 * nin2 + nb5 + n
    n_row = n + 2 * n_eq + 2 * nin2
    Z = lambda r, c: jnp.zeros((r, c), dtype)
    I_eq = jnp.eye(n_eq, dtype=dtype)
    I_in = jnp.eye(nin2, dtype=dtype)

    # row blocks (reference kkt assembly :441-473)
    R1 = jnp.concatenate(
        [H, A.T, Gt.T, Z(n, nin2), Z(n, nb5), Z(n, n)], axis=1)
    R2 = jnp.concatenate(
        [A, Z(n_eq, n_eq), Z(n_eq, nin2), Z(n_eq, nin2), Z(n_eq, nb5),
         Z(n_eq, n)], axis=1)
    R3 = jnp.concatenate(
        [Gt, Z(nin2, n_eq), Z(nin2, nin2), d1c[:, None] * I_in, Z(nin2, nb5),
         Z(nin2, n)], axis=1)
    if has_eq:
        R4 = jnp.concatenate(
            [Z(n_eq, n), -I_eq, Z(n_eq, nin2), Z(n_eq, nin2), A,
             Z(n_eq, n)], axis=1)
    else:
        R4 = Z(0, n_col)
    R5 = jnp.concatenate(
        [Z(nin2, n), Z(nin2, n_eq), -I_in, -(d1 * d2)[:, None] * I_in,
         Z(nin2, nb5), d2c[:, None] * Gt], axis=1)
    K = jnp.concatenate([R1, R2, R3, R4, R5], axis=0)
    rhs = jnp.concatenate([-dL_dx, -dL_dy, r3, -dL_dse, r5])

    # least-squares adjoint solve (the reference solves K w = rhs with
    # ProxQP in primal_infeasibility_solving mode, i.e. min-norm
    # min ||K w - rhs||). K is wide and heavily rank-deficient (the b5/b6
    # blocks have large null spaces), so normal equations square an
    # unbounded condition number -- SVD-based min-norm LS is the correct
    # and stable solve. delta (rho_backward) sets the rank cutoff scale.
    w, _, _, _ = jnp.linalg.lstsq(K, rhs, rcond=delta)

    dx = w[:n]
    dlam = w[n:n + n_eq]
    dnu = w[n + n_eq:n + n_eq + nin2]
    off = n + n_eq + 2 * nin2
    b5 = w[off:off + nb5]
    b6 = w[off + nb5:]

    # gradient assembly (reference :548-600)
    dL_dH_ = 0.5 * (jnp.outer(dx, x) + jnp.outer(x, dx))
    dL_dg_ = dx
    if has_eq:
        dL_dA_ = jnp.outer(dlam, x) + jnp.outer(y_b, dx) + jnp.outer(se, b5)
    else:
        dL_dA_ = Z(0, n)
    dL_db_ = -dlam
    dG = (jnp.outer(dnu, x) + jnp.outer(z_os_b, dx) + jnp.outer(si_pos, b6))
    dL_dC_ = -dG[:n_in] + dG[n_in:]
    dL_dl_ = dnu[:n_in]
    dL_du_ = -dnu[n_in:]
    return BackwardData(dL_dH=dL_dH_, dL_dg=dL_dg_, dL_dA=dL_dA_,
                        dL_db=dL_db_, dL_dC=dL_dC_, dL_du=dL_du_,
                        dL_dl=dL_dl_)
