"""Batched Cholesky + triangular inverse built from matmuls only.

XLA's native `lax.linalg.cholesky` / `triangular_solve` lower to serial,
lane-starved loops on TPU (measured ~11.8 ms / ~8.6 ms per call for a
1024x104x104 f32 batch on v5e, vs 0.02 ms for a same-shape batched
matmul). The solver performs one factorization plus several triangular
solves per Newton step, so these two primitives ARE the solve time.

This module re-expresses the factorization as a blocked right-looking
Cholesky whose heavy work is batched matmuls (MXU) plus an unrolled
small-block recurrence (VPU), and simultaneously accumulates the explicit
inverse factor L^-1 in the same sweep -- so every downstream triangular
solve becomes a pair of matvecs (effectively free on the MXU).

Counterpart of the reference's dense factorization kernels
(/root/reference/include/proxsuite/linalg/dense/factorize.hpp:89-366,
blocked/recursive LDLT with SIMD inner kernels). The reference's
rank-update machinery (linalg/dense/update.hpp) has no equivalent here:
refactorization is a single fused MXU pass, cheaper than serial updates
(SURVEY.md section 7, "refactorize-always is likely optimal on TPU").

Numerical note: applying an explicit L^-1 commits an O(cond(L)*eps)
forward error instead of the backward-stable substitution error. The
solver always wraps these solves in iterative refinement against the
exact KKT operator (ops/kkt.py solve_with_refinement), which restores
the accuracy at the cost of matvecs only.
"""
from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

# TPU matmuls default to bf16 operand precision; the trailing updates of a
# Cholesky are catastrophically sensitive to that, so every product here
# pins full-f32 (6-pass) MXU precision by default. The factor produced
# here is only ever used as a refinement preconditioner (see module
# docstring), so 3-pass bf16x3 ("high") is a legitimate experiment point
# -- scripts/perf_sweep.py measures the trade.
_PREC = {
    "highest": lax.Precision.HIGHEST,
    "high": lax.Precision.HIGH,
}[os.environ.get("PROXSUITE_TPU_CHOL_PREC", "highest")]

# Experiment knobs (scripts/perf_sweep.py): diagonal-block size of the
# blocked factorization. 16 measured best on v5e (see docs/4-performance.md).
_BLOCK = int(os.environ.get("PROXSUITE_TPU_CHOL_BLOCK", "16"))


def _mm(a, b):
    return jnp.matmul(a, b, precision=_PREC)


def _mT(x):
    return jnp.swapaxes(x, -1, -2)


def chol_and_inv(S, block: int = _BLOCK):
    """Backend-dispatched (L, L^-1) of a batched SPD matrix.

    On CPU, XLA's cholesky/triangular_solve are LAPACK calls -- fast and
    backward stable -- so the inverse factor comes from one trsm. On TPU
    they lower to serial loops ~500x slower than matmuls, so the blocked
    matmul-only path below is used instead. Both paths return the same
    (L, Linv) contract consumed by ops/kkt.py.
    """
    if S.shape[-1] == 0:
        return S, S
    if jax.default_backend() == "cpu" and jnp.finfo(S.dtype).bits >= 64:
        # f32 deliberately does NOT take the LAPACK shortcut: a matrix
        # that is numerically indefinite at f32 (e.g. Maros-Meszaros
        # CVXQP1_S after Ruiz, H + 1e-6 I) makes LAPACK's chol return
        # NaN and poison the whole solve, while the blocked kernel's
        # relative pivot floor degrades gracefully (refinement absorbs
        # the floored subspace). Keeping f32 on the blocked path also
        # makes CPU tests bit-representative of the TPU kernel.
        L = lax.linalg.cholesky(S)
        eye = jnp.broadcast_to(jnp.eye(S.shape[-1], dtype=S.dtype), S.shape)
        Linv = lax.linalg.triangular_solve(
            L, eye, left_side=True, lower=True, transpose_a=False)
        return L, Linv
    return cholesky_inverse(S, block=block)


def _chol_block(D, eps_floor):
    """Unrolled Cholesky of a (..., bs, bs) SPD block.

    Returns (Ld, Ld_inv), both lower triangular. The diagonal is floored
    at eps_floor to keep rsqrt finite on (numerically) semidefinite
    blocks -- identity-padded rows and mu-regularized blocks keep the
    true factor well defined.
    """
    bs = D.shape[-1]
    dtype = D.dtype
    row_idx = np.arange(bs)
    A = D
    L = jnp.zeros_like(D)
    rs = []
    for j in range(bs):
        d = jnp.maximum(A[..., j, j], eps_floor)
        r = jax.lax.rsqrt(d)
        rs.append(r)
        col = A[..., :, j] * r[..., None]
        col = jnp.where(row_idx >= j, col, jnp.zeros((), dtype))
        L = L.at[..., :, j].set(col)
        if j + 1 < bs:
            A = A - col[..., :, None] * col[..., None, :]
    # forward substitution for Ld^-1, row by row (unrolled)
    X = jnp.zeros_like(D)
    for j in range(bs):
        e_j = jnp.zeros((bs,), dtype).at[j].set(1.0)
        if j > 0:
            lrow = L[..., j, :j]                      # (..., j)
            acc = jnp.einsum("...k,...kn->...n", lrow, X[..., :j, :], precision=_PREC)
            row = (e_j - acc) * rs[j][..., None]
        else:
            row = e_j * rs[j][..., None]
        X = X.at[..., j, :].set(row)
    return L, X


def _ldl_signed_block(D, eps_floor):
    """Unrolled signed Cholesky of a quasi-definite (..., bs, bs) block:
    D = Lt diag(s) Lt^T with s in {+1, -1}. Returns (Lt, s, Lt_inv)."""
    bs = D.shape[-1]
    dtype = D.dtype
    row_idx = np.arange(bs)
    A = D
    L = jnp.zeros_like(D)
    signs = []
    rs = []
    for j in range(bs):
        d = A[..., j, j]
        s = jnp.where(d < 0, -1.0, 1.0).astype(dtype)
        mag = jnp.maximum(jnp.abs(d), eps_floor)
        r = jax.lax.rsqrt(mag)
        signs.append(s)
        rs.append(r)
        # L[:, j] = A[:, j] * s / sqrt|d| so that (L diag(s) L^T)[i, j]
        # reproduces A[i, j]; the diagonal lands at sqrt|d|
        col = A[..., :, j] * (r * s)[..., None]
        col = jnp.where(row_idx >= j, col, jnp.zeros((), dtype))
        L = L.at[..., :, j].set(col)
        if j + 1 < bs:
            A = A - s[..., None, None] * (col[..., :, None] * col[..., None, :])
    sign_vec = jnp.stack(signs, axis=-1)
    X = jnp.zeros_like(D)
    for j in range(bs):
        e_j = jnp.zeros((bs,), dtype).at[j].set(1.0)
        if j > 0:
            lrow = L[..., j, :j]
            acc = jnp.einsum("...k,...kn->...n", lrow, X[..., :j, :],
                             precision=_PREC)
            row = (e_j - acc) * rs[j][..., None]
        else:
            row = e_j * rs[j][..., None]
        X = X.at[..., j, :].set(row)
    return L, sign_vec, X


def ldl_signed_and_inv(K, block: int = _BLOCK, eps_floor: float = 0.0,
                       full_inverse: bool = True):
    """Blocked signed Cholesky of a symmetric QUASI-DEFINITE matrix:
    K = Lt diag(s) Lt^T, s in {+-1}, plus the explicit inverse Lt^-1.

    Quasi-definite matrices (the regularized KKT [[P, W^T], [W, -D_mu]],
    P spd, D_mu spd) are strongly factorizable without pivoting
    (Vanderbei), which is what makes this fixed-shape and MXU-friendly --
    the reference's permuted LDLT (linalg/dense/ldlt.hpp:164-828) exists
    to handle indefinite pivoting that this structure never needs.
    Solve: K^-1 r = Lt^-T (s * (Lt^-1 r)).
    """
    m = K.shape[-1]
    dtype = K.dtype
    if m == 0:
        return K, jnp.zeros(K.shape[:-1], dtype), K
    if eps_floor == 0.0:
        # relative |pivot| floor -- same rationale as cholesky_inverse
        scale = jnp.max(jnp.abs(jnp.diagonal(K, axis1=-2, axis2=-1)),
                        axis=-1)
        eps_floor = 4 * jnp.finfo(dtype).eps * jnp.maximum(
            scale, jnp.asarray(jnp.finfo(dtype).tiny, dtype))
    mp = ((m + block - 1) // block) * block
    if mp != m:
        pad = mp - m
        K = jnp.concatenate(
            [jnp.concatenate([K, jnp.zeros(K.shape[:-2] + (m, pad), dtype)], -1),
             jnp.concatenate(
                 [jnp.zeros(K.shape[:-2] + (pad, m), dtype),
                  jnp.broadcast_to(jnp.eye(pad, dtype=dtype),
                                   K.shape[:-2] + (pad, pad))], -1)],
            -2)
    nb = mp // block
    A = K
    L = jnp.zeros_like(K)
    Linv = jnp.zeros_like(K)
    sgn = jnp.zeros(K.shape[:-1], dtype)
    for k in range(nb):
        kb = k * block
        ke = kb + block
        Ld, sd, Ldi = _ldl_signed_block(A[..., kb:ke, kb:ke], eps_floor)
        L = L.at[..., kb:ke, kb:ke].set(Ld)
        sgn = sgn.at[..., kb:ke].set(sd)
        if ke < mp:
            B = A[..., ke:, kb:ke]
            # K_panel = Lp diag(sd) Ld^T  ->  Lp = B Ld^-T diag(sd)
            Lp = _mm(B, _mT(Ldi)) * sd[..., None, :]
            L = L.at[..., ke:, kb:ke].set(Lp)
            A = A.at[..., ke:, ke:].add(
                -_mm(Lp * sd[..., None, :], _mT(Lp)))
        if kb > 0 and full_inverse:
            # NOTE: chains block products -- f32 forward error compounds
            # geometrically with nb; callers solving LARGE systems should
            # pass full_inverse=False and use ldl_solve_blocked instead
            R = L[..., kb:ke, :kb]
            right = -_mm(Ldi, _mm(R, Linv[..., :kb, :kb]))
            Linv = Linv.at[..., kb:ke, :kb].set(right)
        Linv = Linv.at[..., kb:ke, kb:ke].set(Ldi)
    if mp != m:
        if full_inverse:
            L = L[..., :m, :m]
            Linv = Linv[..., :m, :m]
            sgn = sgn[..., :m]
        # full padded factors are returned for the substitution path --
        # ldl_solve_blocked needs the identity-padded trailing blocks
    return L, sgn, Linv


def ldl_solve_blocked(L, sgn, Linv, r, block: int = _BLOCK):
    """K^-1 r by blocked substitution: L^-T (s * (L^-1 r)).

    Uses ONLY the diagonal blocks of `Linv` (which equal each Ld^-1
    exactly) plus the off-diagonal panels of L. Unlike a matvec with the
    explicit global L^-1, the error here is substitution-class
    (~ n * eps * cond), NOT compounded geometrically across block
    columns: the explicit triangular inverse of an (n+m)-dim LDL chains
    48+ block products at corpus sizes and its f32 forward error was
    measured at O(1) -- large enough that iterative refinement stopped
    contracting and the outer loop diverged (Maros-Meszaros CVXQP3_S).
    The explicit-inverse fast path remains the right trade for the
    BATCHED small-m Schur engine (ops/kkt.py _s_solve); this is the
    robust path for large single-QP factorizations.
    """
    m = r.shape[-1]
    if m == 0:
        return r
    mp = L.shape[-1]
    if mp != m:
        r = jnp.concatenate(
            [r, jnp.zeros(r.shape[:-1] + (mp - m,), r.dtype)], axis=-1)
    nb = mp // block
    # forward: L w = r
    w = jnp.zeros_like(r)
    for k in range(nb):
        kb, ke = k * block, (k + 1) * block
        acc = r[..., kb:ke]
        if k > 0:
            acc = acc - jnp.einsum("...ij,...j->...i", L[..., kb:ke, :kb],
                                   w[..., :kb], precision=_PREC)
        wk = jnp.einsum("...ij,...j->...i", Linv[..., kb:ke, kb:ke], acc,
                        precision=_PREC)
        w = w.at[..., kb:ke].set(wk)
    w = w * sgn
    # backward: L^T v = w
    v = jnp.zeros_like(w)
    for k in reversed(range(nb)):
        kb, ke = k * block, (k + 1) * block
        acc = w[..., kb:ke]
        if ke < mp:
            acc = acc - jnp.einsum("...ji,...j->...i", L[..., ke:, kb:ke],
                                   v[..., ke:], precision=_PREC)
        vk = jnp.einsum("...ji,...j->...i", Linv[..., kb:ke, kb:ke], acc,
                        precision=_PREC)
        v = v.at[..., kb:ke].set(vk)
    return v[..., :m]


def cholesky_inverse(S, block: int = _BLOCK, eps_floor: float = 0.0):
    """Batched lower Cholesky L of S plus its explicit inverse L^-1.

    S: (..., m, m) symmetric positive definite (leading dims = batch).
    Returns (L, Linv) with S = L @ L.T and Linv @ L = I. All heavy work
    is batched matmuls; the only sequential recurrences are over
    `block`-sized diagonal blocks.
    """
    m = S.shape[-1]
    dtype = S.dtype
    if m == 0:
        return S, S
    if eps_floor == 0.0:
        # RELATIVE pivot floor: a matrix numerically indefinite at working
        # precision (accumulated trailing-update error ~ n*eps*||S||) gets
        # its negative/vanishing pivots clamped at the round-off scale of
        # the matrix, keeping L and L^-1 bounded (~1/sqrt(eps)) instead of
        # overflowing to inf at a `tiny` floor (rsqrt(1e-38) ~ 1.7e19,
        # observed NaN-ing Maros-Meszaros CVXQP1_S in f32). The floored
        # subspace is exactly where the factor has no accuracy anyway;
        # iterative refinement against the exact operator absorbs it.
        scale = jnp.max(jnp.abs(jnp.diagonal(S, axis1=-2, axis2=-1)),
                        axis=-1)
        eps_floor = 4 * jnp.finfo(dtype).eps * jnp.maximum(
            scale, jnp.asarray(jnp.finfo(dtype).tiny, dtype))
    mp = ((m + block - 1) // block) * block
    if mp != m:
        pad = mp - m
        S = jnp.concatenate(
            [jnp.concatenate([S, jnp.zeros(S.shape[:-2] + (m, pad), dtype)], -1),
             jnp.concatenate(
                 [jnp.zeros(S.shape[:-2] + (pad, m), dtype),
                  jnp.broadcast_to(jnp.eye(pad, dtype=dtype),
                                   S.shape[:-2] + (pad, pad))], -1)],
            -2)
    nb = mp // block
    A = S
    L = jnp.zeros_like(S)
    Linv = jnp.zeros_like(S)
    for k in range(nb):
        kb = k * block
        ke = kb + block
        Ld, Ldi = _chol_block(A[..., kb:ke, kb:ke], eps_floor)
        L = L.at[..., kb:ke, kb:ke].set(Ld)
        if ke < mp:
            B = A[..., ke:, kb:ke]
            Lp = _mm(B, _mT(Ldi))
            L = L.at[..., ke:, kb:ke].set(Lp)
            A = A.at[..., ke:, ke:].add(-_mm(Lp, _mT(Lp)))
        if kb > 0:
            R = L[..., kb:ke, :kb]
            right = -_mm(Ldi, _mm(R, Linv[..., :kb, :kb]))
            Linv = Linv.at[..., kb:ke, :kb].set(right)
        Linv = Linv.at[..., kb:ke, kb:ke].set(Ldi)
    if mp != m:
        L = L[..., :m, :m]
        Linv = Linv[..., :m, :m]
    return L, Linv
