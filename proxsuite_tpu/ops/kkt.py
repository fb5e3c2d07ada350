"""KKT linear-system backend: masked Schur-complement Cholesky.

TPU-native replacement for the reference's LDLT-with-rank-updates machinery
(/root/reference/include/proxsuite/linalg/dense/ldlt.hpp:164-828 and
proxqp/dense/solver.hpp:40-232). The reference keeps an LDLT factor of the
quasi-definite KKT

    K = [ H + rho I   A^T        C_J^T     ]
        [ A          -mu_eq I    0         ]
        [ C_J         0         -mu_in I   ]

and mutates it on every active-set / mu change (insert/delete columns, rank
updates) -- serial, dynamically shaped, TPU-hostile. Here we exploit the
2x2 block structure instead:

    P  = H + rho I                        (SPD, factored ONCE per solve)
    S  = D_mu + W P^-1 W^T                (m x m SPD, W = [A; M C])

with M a 0/1 diagonal active-set mask. Because masking C rows is a row
scaling, W P^-1 W^T = [[Kaa, Kac M],[M Kca, M Kcc M]] where
Kaa = A P^-1 A^T, Kac = A P^-1 C^T, Kcc = C P^-1 C^T are Gram blocks
precomputed at factorization time. Per Newton step the only factorization
work is one Cholesky of S -- a dense MXU-friendly kernel -- and active-set
changes / mu updates cost *nothing* (they only re-mask S's assembly).

Solves are wrapped in iterative refinement against the full (masked) KKT
operator, mirroring reference iterative_solve_with_permut_fact
(dense/solver.hpp:406-541) including its 2-strike stagnation detection.
The reference's "refactorize on large residual" fallback (solver.hpp:474)
is unnecessary here: our factors never accumulate rank-update drift because
they are rebuilt fresh each step.

Fast paths (reference settings.hpp:40-46, benchmark/timings-lp.cpp,
timings-diagonal-hessian.cpp):
  * HessianType.Zero:      P = rho I      -> P^-1 is a scalar multiply.
  * HessianType.Diagonal:  P = diag(H)+rho -> P^-1 is a vector multiply.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..types import HessianType, ProblemSpec, Settings, infty_norm
from .chol import chol_and_inv

# Full-f32 MXU precision for every product on the KKT solve path: the
# explicit-inverse solves and the refinement residuals would otherwise run
# at bf16 operand precision on TPU (see ops/chol.py).
_PREC = lax.Precision.HIGHEST

# Factor-path precision (experiment knob, scripts/perf_sweep.py): the Gram
# blocks and the L^-1 preconditioner applications only steer iterative
# refinement -- refinement residuals against the EXACT operator (kkt_matvec
# / kkt_residual, pinned at _PREC) absorb any factor-side error, so these
# products are demotable to 3-pass bf16x3 without touching the convergence
# criterion. Default stays HIGHEST; see docs/4-performance.md for the
# measured trade.
import os as _os  # noqa: E402

_FACTOR_PREC_NAMES = {
    "highest": lax.Precision.HIGHEST,
    "high": lax.Precision.HIGH,
    "default": lax.Precision.DEFAULT,
}
_FACTOR_PREC_ENV = _os.environ.get("PROXSUITE_TPU_FACTOR_PREC", "highest")
if _FACTOR_PREC_ENV not in _FACTOR_PREC_NAMES:
    raise ValueError(
        f"PROXSUITE_TPU_FACTOR_PREC={_FACTOR_PREC_ENV!r} is not a valid "
        f"precision; allowed values: {sorted(_FACTOR_PREC_NAMES)}")
_PREC_FACTOR = _FACTOR_PREC_NAMES[_FACTOR_PREC_ENV]


def _mm(a, b):
    if not isinstance(a, jax.Array):
        # sparse operand (BCOO, matrix-free backend): dispatch to its own
        # matmul (gather + segment-sum, full precision by construction)
        return a @ b
    return jnp.matmul(a, b, precision=_PREC)


def _mm_factor(a, b):
    """Matmul on the refinement-absorbed factor path (see _PREC_FACTOR)."""
    if not isinstance(a, jax.Array):
        return a @ b
    return jnp.matmul(a, b, precision=_PREC_FACTOR)


class KKTFactors(NamedTuple):
    """Per-solve factorization state (constant while rho is constant).

    Stores the explicit INVERSE Cholesky factor of P, not the factor
    itself: triangular solves are XLA's slowest TPU primitive (~8.6 ms
    per batched call vs 0.02 ms for the same-shape matmul, see
    ops/chol.py), so all P-solves are two matvecs with L_P^-1.
    """

    Linv_P: jax.Array     # (n, n) inverse Cholesky factor of P (dummy for Zero/Diagonal)
    P_inv_diag: jax.Array  # (n,) 1/diag(P) for Zero/Diagonal paths (dummy otherwise)
    K_aa: jax.Array       # (n_eq, n_eq) = A P^-1 A^T
    K_ac: jax.Array       # (n_eq, n_c)  = A P^-1 C^T
    K_cc: jax.Array       # (n_c, n_c)   = C P^-1 C^T


class KKTOperand(NamedTuple):
    """Matrices defining the (scaled) KKT operator."""

    H: jax.Array
    A: jax.Array
    C: jax.Array  # extended: generic + box rows


def _p_solve(spec: ProblemSpec, f: KKTFactors, r: jax.Array) -> jax.Array:
    """x = P^-1 r = L^-T (L^-1 r), as two matvecs."""
    if spec.hessian_type == HessianType.Dense:
        return _mm_factor(f.Linv_P.T, _mm_factor(f.Linv_P, r))
    return f.P_inv_diag * r


def factorize(
    spec: ProblemSpec,
    op: KKTOperand,
    rho: jax.Array,
) -> KKTFactors:
    """Factor P = H + rho I and precompute the Gram blocks.

    Counterpart of reference setup_factorization (dense/helpers.hpp:239-285),
    but done once per solve: mu and the active set do not enter the factors.
    """
    n = spec.n
    dtype = op.H.dtype
    if spec.hessian_type == HessianType.Dense:
        P = op.H + rho * jnp.eye(n, dtype=dtype)
        _, Linv_P = chol_and_inv(P)
        # Y = L^-1 [A^T C^T]  ->  Gram blocks = Y^T Y split into quadrants.
        ACt = jnp.concatenate([op.A.T, op.C.T], axis=1)  # (n, m)
        Y = _mm_factor(Linv_P, ACt)
        G = _mm_factor(Y.T, Y)
        P_inv_diag = jnp.zeros((n,), dtype)
    else:
        if spec.hessian_type == HessianType.Zero:
            pdiag = jnp.full((n,), 1.0, dtype) * rho
        else:  # Diagonal
            pdiag = jnp.diagonal(op.H) + rho
        P_inv_diag = 1.0 / pdiag
        ACt = jnp.concatenate([op.A.T, op.C.T], axis=1)
        G = _mm(ACt.T, P_inv_diag[:, None] * ACt)
        Linv_P = jnp.zeros((n, n), dtype)
    n_eq = spec.n_eq
    return KKTFactors(
        Linv_P=Linv_P,
        P_inv_diag=P_inv_diag,
        K_aa=G[:n_eq, :n_eq],
        K_ac=G[:n_eq, n_eq:],
        K_cc=G[n_eq:, n_eq:],
    )


def kkt_matvec(
    spec: ProblemSpec,
    op: KKTOperand,
    rho: jax.Array,
    mask: jax.Array,
    mu_eq: jax.Array,
    mu_in: jax.Array,
    dx: jax.Array,
    dy: jax.Array,
    dz: jax.Array,
):
    """Apply the masked quasi-definite KKT operator (symmetric).

    Matrix-free counterpart of the reference AugmentedKkt expression
    (sparse/utils.hpp:288-330): inactive inequality rows act as the
    decoupled -mu_in diagonal.
    """
    if spec.hessian_type == HessianType.Zero:
        Hdx = jnp.zeros_like(dx)
    elif spec.hessian_type == HessianType.Diagonal:
        Hdx = jnp.diagonal(op.H) * dx
    else:
        Hdx = _mm(op.H, dx)
    o1 = Hdx + rho * dx + _mm(op.A.T, dy) + _mm(op.C.T, mask * dz)
    o2 = _mm(op.A, dx) - mu_eq * dy
    o3 = mask * _mm(op.C, dx) - mu_in * dz
    return o1, o2, o3


class NewtonSystem(NamedTuple):
    """Per-Newton-step factored system: masked Schur complement."""

    Linv_S: jax.Array   # (m, m) inverse Cholesky factor of S
    mask: jax.Array     # (n_c,) active-set mask as dtype 0/1
    mu_eq: jax.Array
    mu_in: jax.Array


def build_newton_system(
    spec: ProblemSpec,
    f: KKTFactors,
    mask: jax.Array,
    mu_eq: jax.Array,
    mu_in: jax.Array,
) -> NewtonSystem:
    """Assemble and factor S = D_mu + W P^-1 W^T with the active-set mask.

    Inactive rows reduce to the decoupled equation -mu_in dz_i = rhs_i,
    the same fixed-shape trick the reference sparse backend uses for its
    inactive rows (sparse/workspace.hpp:78-81) -- but here it is free.
    """
    dtype = f.K_cc.dtype
    m = spec.n_eq + spec.n_c
    mk = mask.astype(dtype)
    S_aa = f.K_aa + mu_eq * jnp.eye(spec.n_eq, dtype=dtype)
    S_ac = f.K_ac * mk[None, :]
    S_cc = mk[:, None] * f.K_cc * mk[None, :] + mu_in * jnp.eye(spec.n_c, dtype=dtype)
    S = jnp.block([[S_aa, S_ac], [S_ac.T, S_cc]]) if m > 0 else jnp.zeros((0, 0), dtype)
    _, Linv_S = chol_and_inv(S)
    return NewtonSystem(Linv_S=Linv_S, mask=mk, mu_eq=mu_eq, mu_in=mu_in)


def _s_solve(sys: NewtonSystem, r: jax.Array) -> jax.Array:
    return _mm_factor(sys.Linv_S.T, _mm_factor(sys.Linv_S, r))


def kkt_apply_inverse(
    spec: ProblemSpec,
    f: KKTFactors,
    op: KKTOperand,
    sys: NewtonSystem,
    r1: jax.Array,
    r2: jax.Array,
    r3: jax.Array,
):
    """Solve the masked KKT system via block elimination.

    [P    W^T ] [dx]   [r1]        S dw = W P^-1 r1 - [r2; r3]
    [W   -D_mu] [dw] = [r2;r3] ,   dx   = P^-1 (r1 - W^T dw)
    """
    p1 = _p_solve(spec, f, r1)
    t = jnp.concatenate([_mm(op.A, p1) - r2, sys.mask * _mm(op.C, p1) - r3])
    dw = _s_solve(sys, t)
    dy, dz = dw[: spec.n_eq], dw[spec.n_eq:]
    rhs_x = r1 - _mm(op.A.T, dy) - _mm(op.C.T, sys.mask * dz)
    dx = _p_solve(spec, f, rhs_x)
    return dx, dy, dz


def kkt_residual(
    spec: ProblemSpec,
    op: KKTOperand,
    sys: NewtonSystem,
    rho: jax.Array,
    dx: jax.Array,
    dy: jax.Array,
    dz: jax.Array,
    r1: jax.Array,
    r2: jax.Array,
    r3: jax.Array,
    high_accuracy: bool = False,
    dw_lo=None,
):
    """rhs - K_masked @ dw (reference iterative_residual, solver.hpp:243-318).

    high_accuracy: the residual is the cancellation of O(1) terms down to
    the refinement target, so the matvecs run exact (Ozaki split) and
    combine in double-float before collapsing (see ops/df.py) -- the f32
    equivalent of the reference's extra-precise refinement residual.

    dw_lo: optional (dx_lo, dy_lo, dz_lo) low words of a double-float
    direction (df-factor mode): their contributions are second-order, so
    plain f32 matvecs suffice and are folded into the df combination.
    """
    if high_accuracy:
        # exact_matvec covers dense AND BCOO operands (sparse operands go
        # through the compensated segment-sum kernel, sparse_ops.py)
        from .df import (df_add, df_add_f32, df_neg, df_to_f32, exact_matvec,
                         two_prod)
        if spec.hessian_type == HessianType.Zero:
            Hdx_df = (jnp.zeros_like(dx), jnp.zeros_like(dx))
        elif spec.hessian_type == HessianType.Diagonal:
            Hdx_df = two_prod(jnp.diagonal(op.H), dx)
        else:
            Hdx_df = exact_matvec(op.H, dx)
        s1 = df_add(df_add(df_add_f32(Hdx_df, rho * dx),
                           exact_matvec(op.A.T, dy)),
                    exact_matvec(op.C.T, sys.mask * dz))
        Adx_df = exact_matvec(op.A, dx)
        s2 = df_add_f32(Adx_df, -sys.mu_eq * dy)
        Cdx_df = exact_matvec(op.C, dx)
        Cdx_m = (sys.mask * Cdx_df[0], sys.mask * Cdx_df[1])
        s3 = df_add_f32(Cdx_m, -sys.mu_in * dz)
        if dw_lo is not None:
            dx_lo, dy_lo, dz_lo = dw_lo
            if spec.hessian_type == HessianType.Zero:
                Hdx_lo = jnp.zeros_like(dx_lo)
            elif spec.hessian_type == HessianType.Diagonal:
                Hdx_lo = jnp.diagonal(op.H) * dx_lo
            else:
                Hdx_lo = _mm(op.H, dx_lo)
            s1 = df_add_f32(s1, Hdx_lo + rho * dx_lo + _mm(op.A.T, dy_lo)
                            + _mm(op.C.T, sys.mask * dz_lo))
            s2 = df_add_f32(s2, _mm(op.A, dx_lo) - sys.mu_eq * dy_lo)
            s3 = df_add_f32(s3, sys.mask * _mm(op.C, dx_lo)
                            - sys.mu_in * dz_lo)
        err1 = df_to_f32(df_add_f32(df_neg(s1), r1))
        err2 = df_to_f32(df_add_f32(df_neg(s2), r2))
        err3 = df_to_f32(df_add_f32(df_neg(s3), r3))
        return err1, err2, err3
    if spec.hessian_type == HessianType.Zero:
        Hdx = jnp.zeros_like(dx)
    elif spec.hessian_type == HessianType.Diagonal:
        Hdx = jnp.diagonal(op.H) * dx
    else:
        Hdx = _mm(op.H, dx)
    err1 = r1 - Hdx - rho * dx - _mm(op.A.T, dy) - _mm(op.C.T, sys.mask * dz)
    err2 = r2 - (_mm(op.A, dx) - sys.mu_eq * dy)
    # active rows: r3 - (C dx - mu_in dz); inactive rows: r3 + mu_in dz
    err3 = r3 - (sys.mask * _mm(op.C, dx) - sys.mu_in * dz)
    return err1, err2, err3


def build_masked_system(
    spec: ProblemSpec,
    mask: jax.Array,
    mu_eq: jax.Array,
    mu_in: jax.Array,
    dtype,
) -> NewtonSystem:
    """NewtonSystem without a factorization (matrix-free backend)."""
    return NewtonSystem(
        Linv_S=jnp.zeros((0, 0), dtype), mask=mask.astype(dtype),
        mu_eq=mu_eq, mu_in=mu_in)


def primaldual_solve_fn(
    spec: ProblemSpec,
    op: KKTOperand,
    sys: NewtonSystem,
    rho: jax.Array,
):
    """Factor the FULL masked quasi-definite KKT and return a solve closure.

    The reference's default PrimalDualLDLT backend (dense/solver.hpp:40-115
    + linalg/dense/ldlt.hpp): factor
        K = [ H+rho I   A^T      (M C)^T ]
            [ A        -mu_eq I  0       ]
            [ M C       0       -mu_in I ]
    directly (signed blocked Cholesky, ops/chol.py ldl_signed_and_inv).
    Unlike the Schur backend, conditioning is NOT squared at small mu and
    the dual directions carry no spurious near-null components -- this is
    the robust backend for LPs (P = rho I) and high-accuracy corner cases;
    the Schur backend stays the throughput engine for batched QPs.
    Active-set changes remain free-form masking; the factorization is
    rebuilt per Newton step (refactorize-always, SURVEY section 7).
    """
    from .chol import ldl_signed_and_inv, ldl_solve_blocked

    n, n_eq = spec.n, spec.n_eq
    K = _assemble_primaldual_kkt(spec, op, sys, rho)
    # full_inverse=False + blocked substitution: at primaldual sizes
    # (n+m can be 1000+, dozens of 16-blocks) the explicit global Lt^-1
    # compounds f32 error geometrically across block columns -- measured
    # O(1) forward error on Maros-Meszaros CVXQP3_S, which stalled
    # refinement and diverged the outer loop. Substitution keeps the
    # error at backward-stable scale; the explicit inverse remains the
    # batched small-m Schur engine's fast path (_s_solve).
    fac = ldl_signed_and_inv(K, full_inverse=False)

    def solve_fn(r1, r2, r3):
        r = jnp.concatenate([r1, r2, r3])
        w = ldl_solve_blocked(fac, r)
        return w[:n], w[n:n + n_eq], w[n + n_eq:]

    return solve_fn


def _assemble_primaldual_kkt(spec, op, sys, rho):
    """Masked quasi-definite KKT matrix shared by the primaldual backends."""
    n, n_eq, n_c = spec.n, spec.n_eq, spec.n_c
    dtype = sys.mask.dtype
    mk = sys.mask
    if spec.hessian_type == HessianType.Zero:
        P = rho * jnp.eye(n, dtype=dtype)
    elif spec.hessian_type == HessianType.Diagonal:
        P = jnp.diagflat(jnp.diagonal(op.H) + rho)
    else:
        P = op.H + rho * jnp.eye(n, dtype=dtype)
    Cm = mk[:, None] * op.C
    Z = lambda r, c: jnp.zeros((r, c), dtype)
    return jnp.block([
        [P, op.A.T, Cm.T],
        [op.A, -sys.mu_eq * jnp.eye(n_eq, dtype=dtype), Z(n_eq, n_c)],
        [Cm, Z(n_c, n_eq), -sys.mu_in * jnp.eye(n_c, dtype=dtype)],
    ])


def primaldual_df_solve_fn(
    spec: ProblemSpec,
    op: KKTOperand,
    sys: NewtonSystem,
    rho: jax.Array,
):
    """Double-float variant of the primaldual backend: factor the masked
    quasi-definite KKT with the df signed Cholesky (ops/chol.py
    ldl_fulldf) and return df correction directions.

    This is the f32/TPU equivalent of the reference factoring in native
    f64 (linalg/dense/ldlt.hpp, T = double): the signed factor of
    [[H+rho I, W^T], [W, -D_mu]] has element growth ~ ||W||^2/(rho mu),
    which no f32-stored factor survives at rho = mu ~ 1e-6 (see
    FullDFLDL). With it, ill-conditioned f32 HA solves keep the
    reference's default rho = 1e-6 -- and its ~f64 iteration counts --
    instead of escalating rho through the retry ladder at ~15x the
    iterations. Selected by solver.resolve_factor_df.
    """
    from .chol import ldl_fulldf, ldl_solve_fulldf

    n, n_eq = spec.n, spec.n_eq
    K = _assemble_primaldual_kkt(spec, op, sys, rho)
    fac = ldl_fulldf(K)

    def solve_fn(r1, r2, r3, lows=None):
        r = jnp.concatenate([r1, r2, r3])
        r_lo = (jnp.concatenate(lows) if lows is not None
                else jnp.zeros_like(r))
        wh, wl = ldl_solve_fulldf(fac, (r, r_lo))
        return ((wh[:n], wl[:n]),
                (wh[n:n + n_eq], wl[n:n + n_eq]),
                (wh[n + n_eq:], wl[n + n_eq:]))

    return solve_fn


def minres_solve_fn(
    spec: ProblemSpec,
    settings: Settings,
    op: KKTOperand,
    sys: NewtonSystem,
    rho: jax.Array,
    tol: float = 1e-14,
):
    """MINRES closure over the masked KKT operator (matrix-free backend).

    Counterpart of the reference MatrixFree path: Eigen MINRES over
    AugmentedKkt (sparse/solver.hpp:39-84, sparse/workspace.hpp:94-103).

    Deliberately UNPRECONDITIONED. Round 3 shipped a symmetric Jacobi
    scaling D^-1/2 K D^-1/2 with D = |diag(K)|; a controlled experiment
    (fixed iteration budget, f64 residual oracle, mu in {1e-1..1e-8},
    Ruiz-equilibrated and deliberately mis-scaled H — see
    tests/test_sparse.py::test_minres_small_mu_accuracy) showed that on
    the already-Ruiz-equilibrated KKT every diagonal scaling tested
    (|diag K|, augmented/Schur-Jacobi, row-inf-norm) made the f32 solve
    error WORSE — catastrophically so at small mu (Jacobi 1.9e0 vs raw
    7.9e-6 at mu=1e-8): dividing the dual rows by sqrt(mu) inflates the
    off-diagonal blocks by 1/sqrt(mu) and destroys the saddle spectrum
    MINRES exploits. Ruiz equilibration of [H A C] at setup IS the
    preconditioner; K's remaining diagonal spread (rho, -mu) is exactly
    the quasi-definite structure MINRES handles well.
    The closure returns (dx, dy, dz, iterations) so the solver surfaces
    MINRES effort in Info (reference records sparse backend stats,
    results.hpp:44-52).
    """
    from .minres import minres

    n, n_eq, n_c = spec.n, spec.n_eq, spec.n_c
    max_iter = 2 * (n + n_eq + n_c)

    def matvec(w):
        dx, dy, dz = w[:n], w[n:n + n_eq], w[n + n_eq:]
        o1, o2, o3 = kkt_matvec(
            spec, op, rho, sys.mask, sys.mu_eq, sys.mu_in, dx, dy, dz)
        return jnp.concatenate([o1, o2, o3])

    def solve_fn(r1, r2, r3):
        b = jnp.concatenate([r1, r2, r3])
        w, _, it = minres(matvec, b, tol=tol, max_iter=max_iter)
        return w[:n], w[n:n + n_eq], w[n + n_eq:], it

    return solve_fn


def solve_with_refinement(
    spec: ProblemSpec,
    settings: Settings,
    f: "KKTFactors",
    op: KKTOperand,
    sys: NewtonSystem,
    rho: jax.Array,
    r1: jax.Array,
    r2: jax.Array,
    r3: jax.Array,
    eps: jax.Array,
    solve_fn=None,
    df_dw: bool = False,
):
    """Iterative refinement around the backend's approximate KKT solve.

    Mirrors reference iterative_solve_with_permut_fact (solver.hpp:406-541):
    refine while the KKT residual exceeds eps, up to nb_iterative_refinement
    corrections, with a two-strike stagnation break. No refactorization
    fallback (see module docstring). `solve_fn(r1, r2, r3) -> (dx, dy, dz)`
    defaults to the Schur backend; the matrix-free backend passes a MINRES
    closure (reference ldl_iter_solve_noalias wraps MINRES the same way,
    sparse/solver.hpp:86-174). Returns (dx, dy, dz, final_err).

    df_dw: the backend returns DOUBLE-FLOAT directions (pairs) and the
    refinement accumulates them in df (collapsing between steps would
    re-commit the eps_f32 * ||K^-1|| error the df factor avoids); the
    returned dx/dy/dz are then (hi, lo) pairs. Requires
    settings.high_accuracy (the df residual) and a pair-returning
    solve_fn (primaldual_df_solve_fn).
    """
    if df_dw:
        return _solve_with_refinement_df(
            spec, settings, op, sys, rho, r1, r2, r3, eps, solve_fn)
    if solve_fn is None:
        def solve_fn(a, b, c):
            return kkt_apply_inverse(spec, f, op, sys, a, b, c)

    def solve4(a, b, c):
        """Normalize backend closures to (dx, dy, dz, inner_iters)."""
        out = solve_fn(a, b, c)
        if len(out) == 3:
            return out + (jnp.asarray(0, jnp.int32),)
        return out

    ha = settings.high_accuracy

    dx, dy, dz, its = solve4(r1, r2, r3)
    e1, e2, e3 = kkt_residual(spec, op, sys, rho, dx, dy, dz, r1, r2, r3,
                              high_accuracy=ha)
    err = jnp.maximum(jnp.maximum(infty_norm(e1), infty_norm(e2)), infty_norm(e3))

    def cond(carry):
        dx, dy, dz, e1, e2, e3, err, preverr, it, strikes, its = carry
        return jnp.logical_and(
            err >= eps,
            jnp.logical_and(it < settings.nb_iterative_refinement, strikes < 2),
        )

    def body(carry):
        dx, dy, dz, e1, e2, e3, err, preverr, it, strikes, its = carry
        cx, cy, cz, cit = solve4(e1, e2, e3)
        dx, dy, dz = dx + cx, dy + cy, dz + cz
        e1, e2, e3 = kkt_residual(spec, op, sys, rho, dx, dy, dz, r1, r2, r3,
                                  high_accuracy=ha)
        new_err = jnp.maximum(
            jnp.maximum(infty_norm(e1), infty_norm(e2)), infty_norm(e3))
        # NaN-robust strike rule: only a strict improvement resets; a
        # non-finite new_err (NaN compares False both ways) counts as a
        # strike instead of resetting forever
        strikes = jnp.where(new_err < err, 0, strikes + 1)
        return dx, dy, dz, e1, e2, e3, new_err, err, it + 1, strikes, its + cit

    def body_best(carry):
        """body + best-iterate tracking: when the factor has lost all
        contraction (f32 on a numerically indefinite P, floored pivots)
        the correction AMPLIFIES the error; returning the diverged last
        iterate hands the Newton step a garbage direction that overflows
        the outer loop (observed NaN on Maros-Meszaros CVXQP1_S in f32).
        Keeping the best-so-far direction is the fixed-shape analogue of
        the reference's stagnation rollback (solver.hpp:506-524)."""
        inner, best = carry
        inner = body(inner)
        bdx, bdy, bdz, berr = best
        new_err = inner[6]
        better = jnp.logical_and(jnp.isfinite(new_err), new_err < berr)
        best = (jnp.where(better, inner[0], bdx),
                jnp.where(better, inner[1], bdy),
                jnp.where(better, inner[2], bdz),
                jnp.where(better, new_err, berr))
        return inner, best

    # a non-finite FIRST solve (overflowed factor application) would poison
    # every arithmetic after it; restart from the zero direction (whose
    # residual is exactly the rhs) so the inner stall break + backend
    # fallback machinery engage with finite state
    first_ok = jnp.isfinite(err)
    zz = jnp.zeros_like
    dx = jnp.where(first_ok, dx, zz(dx))
    dy = jnp.where(first_ok, dy, zz(dy))
    dz = jnp.where(first_ok, dz, zz(dz))
    e1 = jnp.where(first_ok, e1, r1)
    e2 = jnp.where(first_ok, e2, r2)
    e3 = jnp.where(first_ok, e3, r3)
    err = jnp.where(first_ok, err, jnp.maximum(
        jnp.maximum(infty_norm(r1), infty_norm(r2)), infty_norm(r3)))

    carry = ((dx, dy, dz, e1, e2, e3, err, err,
              jnp.asarray(1, jnp.int32), jnp.asarray(0, jnp.int32), its),
             (dx, dy, dz, err))
    inner, best = lax.while_loop(lambda c: cond(c[0]), body_best, carry)
    dx, dy, dz, err = best
    its = inner[10]
    return dx, dy, dz, err, its


def _solve_with_refinement_df(
    spec: ProblemSpec,
    settings: Settings,
    op: KKTOperand,
    sys: NewtonSystem,
    rho: jax.Array,
    r1: jax.Array,
    r2: jax.Array,
    r3: jax.Array,
    eps: jax.Array,
    solve_fn,
):
    """df-direction refinement (see solve_with_refinement df_dw)."""
    from .df import df_add

    assert settings.high_accuracy, "df-factor refinement requires HA residuals"

    def resid(dw):
        (dxh, dxl), (dyh, dyl), (dzh, dzl) = dw
        e1, e2, e3 = kkt_residual(
            spec, op, sys, rho, dxh, dyh, dzh, r1, r2, r3,
            high_accuracy=True, dw_lo=(dxl, dyl, dzl))
        err = jnp.maximum(jnp.maximum(infty_norm(e1), infty_norm(e2)),
                          infty_norm(e3))
        return e1, e2, e3, err

    dw = solve_fn(r1, r2, r3)
    e1, e2, e3, err = resid(dw)

    def cond(carry):
        dw, e1, e2, e3, err, it, strikes = carry
        return jnp.logical_and(
            err >= eps,
            jnp.logical_and(it < settings.nb_iterative_refinement,
                            strikes < 2))

    def body(carry):
        dw, e1, e2, e3, err, it, strikes = carry
        c = solve_fn(e1, e2, e3)
        dw = tuple(df_add(d, ci) for d, ci in zip(dw, c))
        e1, e2, e3, new_err = resid(dw)
        strikes = jnp.where(new_err < err, 0, strikes + 1)
        return dw, e1, e2, e3, new_err, it + 1, strikes

    def body_best(carry):
        inner, best = carry
        inner = body(inner)
        bdw, berr = best
        new_err = inner[4]
        better = jnp.logical_and(jnp.isfinite(new_err), new_err < berr)
        best = (jax.tree.map(
            lambda n, o: jnp.where(better, n, o), inner[0], bdw),
            jnp.where(better, new_err, berr))
        return inner, best

    # non-finite first solve: restart from zero (residual = rhs)
    first_ok = jnp.isfinite(err)
    dw = jax.tree.map(lambda a: jnp.where(first_ok, a, jnp.zeros_like(a)), dw)
    e1 = jnp.where(first_ok, e1, r1)
    e2 = jnp.where(first_ok, e2, r2)
    e3 = jnp.where(first_ok, e3, r3)
    err = jnp.where(first_ok, err, jnp.maximum(
        jnp.maximum(infty_norm(r1), infty_norm(r2)), infty_norm(r3)))

    carry = ((dw, e1, e2, e3, err,
              jnp.asarray(1, jnp.int32), jnp.asarray(0, jnp.int32)),
             (dw, err))
    inner, best = lax.while_loop(lambda c: cond(c[0]), body_best, carry)
    (dx, dy, dz), err = best
    return dx, dy, dz, err, jnp.asarray(0, jnp.int32)
