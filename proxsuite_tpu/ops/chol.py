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
from typing import NamedTuple

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
_PREC_NAMES = {
    "highest": lax.Precision.HIGHEST,
    "high": lax.Precision.HIGH,
}
_PREC_ENV = os.environ.get("PROXSUITE_TPU_CHOL_PREC", "highest")
if _PREC_ENV not in _PREC_NAMES:
    raise ValueError(
        f"PROXSUITE_TPU_CHOL_PREC={_PREC_ENV!r} is not a valid precision; "
        f"allowed values: {sorted(_PREC_NAMES)}")
_PREC = _PREC_NAMES[_PREC_ENV]

# Experiment knobs (scripts/perf_sweep.py): diagonal-block size of the
# blocked factorization. 16 measured best on v5e (see docs/4-performance.md).
_BLOCK = int(os.environ.get("PROXSUITE_TPU_CHOL_BLOCK", "16"))


def _mm(a, b):
    return jnp.matmul(a, b, precision=_PREC)


def _mT(x):
    return jnp.swapaxes(x, -1, -2)


def _dslice(x, starts, sizes):
    """dynamic_slice over the TRAILING dims (leading batch dims kept whole)."""
    lead = x.ndim - len(starts)
    return lax.dynamic_slice(
        x, (0,) * lead + tuple(starts), x.shape[:lead] + tuple(sizes))


def _dupdate(x, upd, starts):
    """dynamic_update_slice over the TRAILING dims (upd carries the same
    leading batch dims as x)."""
    lead = x.ndim - len(starts)
    if upd.ndim < x.ndim:
        upd = jnp.broadcast_to(
            upd, x.shape[:lead] + upd.shape[upd.ndim - len(starts):])
    return lax.dynamic_update_slice(x, upd, (0,) * lead + tuple(starts))


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


class SignedLDL(NamedTuple):
    """Signed-Cholesky factors + the block size they were built with.

    Carrying `block` prevents the silent-wrong-result hazard of solving
    with a different (coarser) block than the factorization used: with
    full_inverse=False only per-factor-block diagonal inverses of Linv
    are populated, so factor and solve MUST agree on the block size."""

    L: jax.Array
    sgn: jax.Array
    Linv: jax.Array
    block: int


def ldl_signed_and_inv(K, block: int = _BLOCK, eps_floor: float = 0.0,
                       full_inverse: bool = True) -> "SignedLDL":
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
    row_idx = jnp.arange(mp)

    # lax.fori_loop over block columns, NOT an unrolled python loop: at
    # primaldual sizes (mp up to ~3000, nb ~190) the unrolled graph has
    # tens of thousands of ops -- multi-minute XLA compiles and (observed
    # on this host) occasional compiler crashes on the largest programs.
    # The loop body compiles ONCE; panel products run full-height with
    # zero-masked processed rows (2-3x the flops of the shrinking
    # triangular update, but they are MXU matmuls -- the right trade).
    def body(k, carry):
        A, L, Linv, sgn = carry
        kb = k * block
        ke = kb + block
        D = _dslice(A, (kb, kb), (block, block))
        Ld, sd, Ldi = _ldl_signed_block(D, eps_floor)
        sgn = _dupdate(sgn, sd, (kb,))
        # full-height column block with processed rows (< ke) zeroed
        below = (row_idx >= ke).astype(dtype)[:, None]
        Acol = _dslice(A, (0, kb), (mp, block))
        B = Acol * below
        Lp = _mm(B, _mT(Ldi)) * sd[..., None, :]   # rows < ke are zero
        colL = Lp + _dupdate(jnp.zeros_like(Lp), Ld, (kb, 0))
        L = _dupdate(L, colL, (0, kb))
        A = A - _mm(Lp * sd[..., None, :], _mT(Lp))
        if full_inverse:
            # NOTE: chains block products -- f32 forward error compounds
            # geometrically with nb; callers solving LARGE systems should
            # pass full_inverse=False and use ldl_solve_blocked instead
            Lrows = _dslice(L, (kb, 0), (block, mp))
            leftc = (row_idx < kb).astype(dtype)[None, :]
            R = Lrows * leftc
            right = -_mm(Ldi, _mm(R, Linv))
            rowI = (right * leftc
                    + _dupdate(jnp.zeros_like(right), Ldi, (0, kb)))
            Linv = _dupdate(Linv, rowI, (kb, 0))
        else:
            Linv = _dupdate(Linv, Ldi, (kb, kb))
        return A, L, Linv, sgn

    init = (K, jnp.zeros_like(K), jnp.zeros_like(K),
            jnp.zeros(K.shape[:-1], dtype))
    _, L, Linv, sgn = lax.fori_loop(0, nb, body, init)
    if mp != m:
        if full_inverse:
            L = L[..., :m, :m]
            Linv = Linv[..., :m, :m]
            sgn = sgn[..., :m]
        # full padded factors are returned for the substitution path --
        # ldl_solve_blocked needs the identity-padded trailing blocks
    return SignedLDL(L=L, sgn=sgn, Linv=Linv, block=block)


def ldl_solve_blocked(fac: SignedLDL, r):
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
    L, sgn, Linv, block = fac
    m = r.shape[-1]
    if m == 0:
        return r
    mp = L.shape[-1]
    if mp != m:
        r = jnp.concatenate(
            [r, jnp.zeros(r.shape[:-1] + (mp - m,), r.dtype)], axis=-1)
    nb = mp // block

    # fori_loop (not unrolled) for the same compile-size reason as the
    # factorization. Row/column blocks run full-width: entries of w/v not
    # yet written are zero, so the masked-substitution algebra is exact.
    def fwd(k, w):
        kb = k * block
        r_blk = _dslice(r, (kb,), (block,))
        Lrows = _dslice(L, (kb, 0), (block, mp))
        acc = r_blk - jnp.einsum("...ij,...j->...i", Lrows, w,
                                 precision=_PREC)
        Ldi = _dslice(Linv, (kb, kb), (block, block))
        wk = jnp.einsum("...ij,...j->...i", Ldi, acc, precision=_PREC)
        return _dupdate(w, wk, (kb,))

    w = lax.fori_loop(0, nb, fwd, jnp.zeros_like(r))
    w = w * sgn

    def bwd(krev, v):
        kb = (nb - 1 - krev) * block
        w_blk = _dslice(w, (kb,), (block,))
        Lcols = _dslice(L, (0, kb), (mp, block))
        acc = w_blk - jnp.einsum("...ji,...j->...i", Lcols, v,
                                 precision=_PREC)
        Ldi = _dslice(Linv, (kb, kb), (block, block))
        vk = jnp.einsum("...ji,...j->...i", Ldi, acc, precision=_PREC)
        return _dupdate(v, vk, (kb,))

    v = lax.fori_loop(0, nb, bwd, jnp.zeros_like(w))
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


# --------------------------------------------------------------------------
# Double-float signed LDL: the TPU equivalent of the reference's f64 factor
# --------------------------------------------------------------------------

class FullDFLDL(NamedTuple):
    """Signed-Cholesky factors stored as double-float (hi, lo) pairs.

    Why this exists: the signed LDL of a quasi-definite KKT
    [[H+rho I, W^T], [W, -D_mu]] has intrinsic element growth
    ~ ||W||^2/(rho*mu) (Saunders/Vanderbei); at rho = mu = 1e-6 that is
    ~1e12, so ANY factor stored in f32 commits a backward error ~
    eps_f32 * growth * ||K|| that destroys iterative-refinement
    contraction (measured divergence rate ~5x/step on Maros-Meszaros
    CVXQP1_S even with exact trailing accumulation + df substitution,
    scripts/exp_df_factor.py). The reference handles the same growth
    with native f64 (linalg/dense/ldlt.hpp, T = double); TPU v5e has no
    f64, so the factor itself is double-float: every product Ozaki-split
    exact, every accumulation an error-free two_sum, L and the per-block
    inverses kept as (hi, lo) pairs. Measured on the same KKT: contracts
    ~0.15x/step at rho = mu = 1e-6, exact at mu = 1e-3.
    """

    L_hi: jax.Array
    L_lo: jax.Array
    sgn: jax.Array
    Linv_hi: jax.Array   # per-diagonal-block inverses only (like
    Linv_lo: jax.Array   # ldl_signed_and_inv(full_inverse=False))
    block: int


def _ldl_block_fulldf(Ahi, Alo, eps_floor):
    """Unrolled df signed Cholesky of one (bs, bs) diagonal block."""
    from .df import df_mul, df_rsqrt, df_scale, two_prod, two_sum

    bs = Ahi.shape[-1]
    dtype = Ahi.dtype
    row_idx = np.arange(bs)
    Lh = jnp.zeros_like(Ahi)
    Ll = jnp.zeros_like(Ahi)
    signs, rsh, rsl = [], [], []
    for j in range(bs):
        dh, dl = Ahi[..., j, j], Alo[..., j, j]
        s = jnp.where(dh < 0, -1.0, 1.0).astype(dtype)
        floored = jnp.abs(dh) <= eps_floor
        magh = jnp.maximum(jnp.abs(dh), eps_floor)
        magl = jnp.where(floored, 0.0, dl * s)
        rh, rl = df_rsqrt((magh, magl))
        signs.append(s)
        rsh.append(rh)
        rsl.append(rl)
        colh, coll = df_mul(
            (Ahi[..., :, j], Alo[..., :, j]),
            ((rh * s)[..., None], (rl * s)[..., None]))
        colh = jnp.where(row_idx >= j, colh, jnp.zeros((), dtype))
        coll = jnp.where(row_idx >= j, coll, jnp.zeros((), dtype))
        Lh = Lh.at[..., :, j].set(colh)
        Ll = Ll.at[..., :, j].set(coll)
        if j + 1 < bs:
            oh, ol = df_mul((colh[..., :, None], coll[..., :, None]),
                            (colh[..., None, :], coll[..., None, :]))
            oh, ol = oh * s[..., None, None], ol * s[..., None, None]
            h, e = two_sum(Ahi, -oh)
            Ahi, Alo = two_sum(h, e + (Alo - ol))
    sign_vec = jnp.stack(signs, axis=-1)
    # df forward substitution for the block inverse
    from .df import df_matmul
    Xh = jnp.zeros_like(Ahi)
    Xl = jnp.zeros_like(Ahi)
    for j in range(bs):
        e_j = jnp.zeros((bs,), dtype).at[j].set(1.0)
        acc_h = jnp.broadcast_to(e_j, Ahi.shape[:-2] + (bs,))
        acc_l = jnp.zeros_like(acc_h)
        if j > 0:
            ph, pl = df_matmul(
                (Lh[..., j:j + 1, :j], Ll[..., j:j + 1, :j]),
                (Xh[..., :j, :], Xl[..., :j, :]))
            acc_h, e = two_sum(acc_h, -ph[..., 0, :])
            acc_l = acc_l + e - pl[..., 0, :]
        vh, vl = df_mul((acc_h, acc_l),
                        (rsh[j][..., None], rsl[j][..., None]))
        Xh = Xh.at[..., j, :].set(vh)
        Xl = Xl.at[..., j, :].set(vl)
    return Lh, Ll, sign_vec, Xh, Xl


def ldl_fulldf(K, block: int = _BLOCK, eps_floor=None) -> "FullDFLDL":
    """Blocked signed Cholesky of a quasi-definite matrix, all double-float.

    Same structure as ldl_signed_and_inv(full_inverse=False) -- identity-
    padded to a block multiple, per-block inverses only -- but every
    panel product runs Ozaki-exact and every accumulation is error-free;
    L, the trailing matrix, and the block inverses are (hi, lo) pairs.
    ~4x the matmul count of the f32 factor; used only where the f32
    factor provably cannot contract (see FullDFLDL docstring and
    solver.resolve_factor_df).
    """
    from .df import df_matmul, df_scale, two_sum

    m = K.shape[-1]
    dtype = K.dtype
    if m == 0:
        z = jnp.zeros_like(K)
        return FullDFLDL(K, z, jnp.zeros(K.shape[:-1], dtype), K, z, block)
    if eps_floor is None:
        # df-precision relative pivot floor: the factor resolves pivots
        # down to ~eps_f32^2 of the matrix scale
        scale = jnp.max(jnp.abs(jnp.diagonal(K, axis1=-2, axis2=-1)),
                        axis=-1)
        eps = jnp.finfo(dtype).eps
        eps_floor = 4 * eps * eps * jnp.maximum(
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
    row_idx = jnp.arange(mp)

    # fori_loop over block columns (compile-size, see ldl_signed_and_inv);
    # full-height panels with processed rows zero-masked.
    def body(k, carry):
        Ahi, Alo, Lh, Ll, Ih, Il, sgn = carry
        kb = k * block
        ke = kb + block
        Dh = _dslice(Ahi, (kb, kb), (block, block))
        Dl = _dslice(Alo, (kb, kb), (block, block))
        ldh, ldl_, sd, xih, xil = _ldl_block_fulldf(Dh, Dl, eps_floor)
        Ih = _dupdate(Ih, xih, (kb, kb))
        Il = _dupdate(Il, xil, (kb, kb))
        sgn = _dupdate(sgn, sd, (kb,))
        below = (row_idx >= ke).astype(dtype)[:, None]
        Bh = _dslice(Ahi, (0, kb), (mp, block)) * below
        Bl = _dslice(Alo, (0, kb), (mp, block)) * below
        # panel: Lp = B Ld^-T diag(sd), all df (rows < ke are zero)
        ph, pl = df_matmul(
            (Bh, Bl),
            (jnp.swapaxes(xih, -1, -2), jnp.swapaxes(xil, -1, -2)))
        ph, pl = df_scale((ph, pl), sd[..., None, :])
        colLh = ph + _dupdate(jnp.zeros_like(ph), ldh, (kb, 0))
        colLl = pl + _dupdate(jnp.zeros_like(pl), ldl_, (kb, 0))
        Lh = _dupdate(Lh, colLh, (0, kb))
        Ll = _dupdate(Ll, colLl, (0, kb))
        # exact trailing downdate: A -= (Lp diag(sd)) Lp^T (confined to
        # the [ke:, ke:] region because Lp's processed rows are zero)
        uh, ul = df_matmul(
            (ph * sd[..., None, :], pl * sd[..., None, :]),
            (jnp.swapaxes(ph, -1, -2), jnp.swapaxes(pl, -1, -2)))
        h, e = two_sum(Ahi, -uh)
        Ahi, Alo = two_sum(h, e + (Alo - ul))
        return Ahi, Alo, Lh, Ll, Ih, Il, sgn

    z = jnp.zeros_like(K)
    init = (K, z, z, z, z, z, jnp.zeros(K.shape[:-1], dtype))
    _, _, Lh, Ll, Ih, Il, sgn = lax.fori_loop(0, nb, body, init)
    # keep padded factors (identity blocks) like the f32 substitution path
    return FullDFLDL(L_hi=Lh, L_lo=Ll, sgn=sgn, Linv_hi=Ih, Linv_lo=Il,
                     block=block)


def ldl_solve_fulldf(fac: FullDFLDL, r_df):
    """K^-1 r by df blocked substitution. r_df = (hi, lo); returns a pair.

    The correction directions this produces must be ACCUMULATED in df by
    the caller (ops/kkt.py solve_with_refinement carries lo words in df
    mode): collapsing to f32 between refinement steps re-commits the
    eps_f32 * ||K^-1|| error the df factor exists to avoid.
    """
    from .df import df_matmul, df_scale, two_sum

    rhi, rlo = r_df
    m = rhi.shape[-1]
    if m == 0:
        return rhi, rlo
    block = fac.block
    mp = fac.L_hi.shape[-1]
    if mp != m:
        z = jnp.zeros(rhi.shape[:-1] + (mp - m,), rhi.dtype)
        rhi = jnp.concatenate([rhi, z], axis=-1)
        rlo = jnp.concatenate([rlo, z], axis=-1)
    nb = mp // block
    Lh, Ll, Ih, Il = fac.L_hi, fac.L_lo, fac.Linv_hi, fac.Linv_lo

    def dfmv(Mh, Ml, vh, vl):
        ph, pl = df_matmul((Mh, Ml), (vh[..., :, None], vl[..., :, None]))
        return ph[..., 0], pl[..., 0]

    # fori_loop with full-width masked substitution (see ldl_solve_blocked)
    def fwd(k, w):
        wh, wl = w
        kb = k * block
        ah = _dslice(rhi, (kb,), (block,))
        al = _dslice(rlo, (kb,), (block,))
        ph, pl = dfmv(_dslice(Lh, (kb, 0), (block, mp)),
                      _dslice(Ll, (kb, 0), (block, mp)), wh, wl)
        h, e = two_sum(ah, -ph)
        ah, al = two_sum(h, e + al - pl)
        vh, vl = dfmv(_dslice(Ih, (kb, kb), (block, block)),
                      _dslice(Il, (kb, kb), (block, block)), ah, al)
        return _dupdate(wh, vh, (kb,)), _dupdate(wl, vl, (kb,))

    wh, wl = lax.fori_loop(0, nb, fwd,
                           (jnp.zeros_like(rhi), jnp.zeros_like(rhi)))
    wh, wl = df_scale((wh, wl), fac.sgn)

    def bwd(krev, v):
        vh_o, vl_o = v
        kb = (nb - 1 - krev) * block
        ah = _dslice(wh, (kb,), (block,))
        al = _dslice(wl, (kb,), (block,))
        ph, pl = dfmv(jnp.swapaxes(_dslice(Lh, (0, kb), (mp, block)), -1, -2),
                      jnp.swapaxes(_dslice(Ll, (0, kb), (mp, block)), -1, -2),
                      vh_o, vl_o)
        h, e = two_sum(ah, -ph)
        ah, al = two_sum(h, e + al - pl)
        ph, pl = dfmv(
            jnp.swapaxes(_dslice(Ih, (kb, kb), (block, block)), -1, -2),
            jnp.swapaxes(_dslice(Il, (kb, kb), (block, block)), -1, -2),
            ah, al)
        return _dupdate(vh_o, ph, (kb,)), _dupdate(vl_o, pl, (kb,))

    vh_o, vl_o = lax.fori_loop(0, nb, bwd,
                               (jnp.zeros_like(wh), jnp.zeros_like(wh)))
    return vh_o[..., :m], vl_o[..., :m]
