"""Double-float arithmetic + exact (Ozaki-split) matvecs for TPU.

High-accuracy support for the f32 TPU solve path (SURVEY.md section 7
"f32 factorization + f64/compensated residual-and-refinement"; reference
anchor: the iterative-refinement loop dense/solver.hpp:408-541 is the
load-bearing accuracy mechanism). TPU v5e has no native f64 (XLA's f64
emulation hangs on this platform), so residuals are computed to ~2^-45
effective precision with two tools:

1. **double-float (df) pairs** (hi, lo): value = hi + lo with
   |lo| <= ulp(hi)/2, combined via error-free two_sum transforms
   (Knuth/Neumaier) -- pure VPU elementwise work.

2. **exact matvecs via MXU-native Ozaki splitting**: each operand is
   split into K pieces of w <= 7 mantissa bits on power-of-two grids
   (per-row for the matrix, global for the vector). A 7-bit piece is
   exactly representable in bfloat16, so the MXU computes every
   piece-product matmul EXACTLY (bf16 x bf16 products are exact, the MXU
   accumulator is f32, and 2w + log2(n) <= 24 keeps the row sums exact).
   K^2 tiny bf16 matmuls + two residual-tail matmuls reconstruct the
   f32-data matvec to full accuracy, combined into a df pair.

The split grids require Ruiz-equilibrated data (element scales within a
row vary moderately); the tails are caught by plain-f32 remainder terms,
so mis-scaled rows degrade gracefully rather than wrongly.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Pair = Tuple[jax.Array, jax.Array]

# pieces of <= 7 mantissa bits are exact in bf16 and their length-n
# product sums stay exact in the f32 MXU accumulator for n <= 2^10
_PIECE_BITS = 7
_N_PIECES = 4          # 4 * 7 = 28 >= 24 mantissa bits of f32


def two_sum(a: jax.Array, b: jax.Array) -> Pair:
    """Error-free sum: a + b = s + e exactly (Knuth)."""
    s = a + b
    bv = s - a
    e = (a - (s - bv)) + (b - bv)
    return s, e


def df_add(x: Pair, y: Pair) -> Pair:
    """Double-float addition (normalizing)."""
    s, e = two_sum(x[0], y[0])
    e = e + (x[1] + y[1])
    return two_sum(s, e)


def df_add_f32(x: Pair, t: jax.Array) -> Pair:
    s, e = two_sum(x[0], t)
    return two_sum(s, e + x[1])


def df_neg(x: Pair) -> Pair:
    return -x[0], -x[1]

def df_sum_terms(terms) -> Pair:
    """Accumulate a list of f32 arrays into a df pair (Neumaier cascade)."""
    hi = terms[0]
    lo = jnp.zeros_like(hi)
    for t in terms[1:]:
        hi, e = two_sum(hi, t)
        lo = lo + e
    return two_sum(hi, lo)


def df_to_f32(x: Pair) -> jax.Array:
    return x[0] + x[1]


def df_abs_max(x: Pair) -> jax.Array:
    """infinity norm of a df vector (hi dominates at this precision)."""
    v = jnp.abs(x[0] + x[1])
    return jnp.max(v) if v.size else jnp.zeros((), x[0].dtype)


def _veltkamp(a: jax.Array) -> Pair:
    """Split a into 12-bit halves: a = a_hi + a_lo exactly.

    Implemented by MASKING the low 12 mantissa bits (bitcast + integer
    and), NOT the classic Dekker multiply trick (c = 4097*a;
    hi = c - (c - a)): inside large jitted bodies XLA:CPU contracts the
    multiply-subtract chains into FMAs, which silently BREAKS the Dekker
    split -- measured: a jitted _ldl_block_fulldf lost the entire df
    accuracy (4e-15 eager -> 3e-8 jitted) through exactly this. Bit
    masking is exact by construction and immune to any float rewrite.
    The split keeps 12 leading mantissa bits (incl. the implicit one),
    so hi*hi products are exact in f32 (24-bit significand), and
    |lo| <= ulp(hi)*2^11 as in the Dekker split."""
    ai = jax.lax.bitcast_convert_type(a, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(
        ai & jnp.uint32(0xFFFFF000), a.dtype)
    return hi, a - hi


def two_prod(a: jax.Array, b: jax.Array) -> Pair:
    """Error-free product: a * b = p + e exactly (split products; the
    component products and their combination with -p are all exactly
    representable, so FMA contraction cannot change the result)."""
    p = a * b
    a1, a2 = _veltkamp(a)
    b1, b2 = _veltkamp(b)
    e = ((a1 * b1 - p) + a1 * b2 + a2 * b1) + a2 * b2
    return p, e


def df_scale(x: Pair, d: jax.Array) -> Pair:
    """(hi, lo) * d elementwise, error-free on the hi word."""
    p, e = two_prod(x[0], d)
    return two_sum(p, e + x[1] * d)


def df_mul(x: Pair, y: Pair) -> Pair:
    """Double-float product (error-free on the leading term)."""
    p, e = two_prod(x[0], y[0])
    e = e + (x[0] * y[1] + x[1] * y[0])
    return two_sum(p, e)


def df_div(x: Pair, c: jax.Array) -> Pair:
    """(hi, lo) / c with one Newton correction on the quotient."""
    q = x[0] / c
    p, e = two_prod(q, c)
    r = ((x[0] - p) - e) + x[1]
    return two_sum(q, r / c)


def _pow2_grid(max_abs: jax.Array, dtype) -> jax.Array:
    """sigma = 2^ceil(log2(max_abs)), with 0 -> 1 to avoid log(0).

    Built with ldexp on an integer exponent: jnp.exp2 evaluates as
    exp(x*ln2) and returns e.g. 8192.0039 for 2^13 in f32 — an off-grid
    sigma silently breaks the exactness of every piece split.
    """
    safe = jnp.where(max_abs > 0, max_abs, 1.0)
    # clamp the exponent so piece grids (sigma * 2^-k*w) never underflow
    # to zero -- a denormal sigma makes round(M / grid) divide by zero
    e = jnp.clip(jnp.ceil(jnp.log2(safe)), -70, None).astype(jnp.int32)
    return jnp.ldexp(jnp.ones_like(safe), e).astype(dtype)


def _split_pieces(M: jax.Array, sigma: jax.Array, n_pieces: int):
    """Split M into n_pieces grid-aligned pieces + remainder.

    Piece p lives on grid sigma * 2^(-p*w); the quotients fit in w bits so
    every piece is exactly representable in bf16. Returns (pieces, rem).
    """
    pieces = []
    R = M
    for p in range(1, n_pieces + 1):
        grid = sigma * (2.0 ** (-p * _PIECE_BITS))
        q = jnp.round(R / grid)
        piece = q * grid
        pieces.append(piece)
        R = R - piece
    return pieces, R


def exact_matvec(A: jax.Array, x: jax.Array) -> Pair:
    """A @ x with f32 operands, exact to df precision, MXU-native.

    Per-row grids for A, global grid for x. Cost: n_pieces^2 bf16
    matmuls + 2 f32 remainder matmuls -- trivially small next to the
    factorizations they guard.
    """
    if not isinstance(A, jax.Array):
        from . import sparse_ops

        if isinstance(A, sparse_ops.BCOO):
            # compensated segment-sum matvec, exact to df precision
            return sparse_ops.exact_matvec_bcoo(A, x)
        # other structured operand: treat its matvec as a plain term
        r = A @ x
        return r, jnp.zeros_like(r)
    dtype = A.dtype
    if A.shape[0] == 0 or A.shape[1] == 0:
        z = jnp.zeros((A.shape[0],), dtype)
        return z, z
    m = A.shape[1]
    if m > 1024:
        # exactness needs 2w + log2(n_sum) <= 24: chunk the contraction
        out = exact_matvec(A[:, :1024], x[:1024])
        for lo_ in range(1024, m, 1024):
            out = df_add(out, exact_matvec(A[:, lo_:lo_ + 1024],
                                           x[lo_:lo_ + 1024]))
        return out

    row_max = jnp.max(jnp.abs(A), axis=1, keepdims=True)
    sig_A = _pow2_grid(row_max, dtype)
    sig_x = _pow2_grid(jnp.max(jnp.abs(x)), dtype)

    A_pieces, A_rem = _split_pieces(A, sig_A, _N_PIECES)
    x_pieces, x_rem = _split_pieces(x, sig_x, _N_PIECES)

    terms = []
    for p, Ap in enumerate(A_pieces):
        for q, xq in enumerate(x_pieces):
            # skip products below the df noise floor (~2^-52 relative)
            if (p + q + 2) * _PIECE_BITS > 52:
                continue
            terms.append(jnp.matmul(Ap, xq, precision=jax.lax.Precision.HIGHEST))
    # remainder tails (plain f32; their own rounding is 3rd order)
    terms.append(jnp.matmul(A_rem, x, precision=jax.lax.Precision.HIGHEST))
    terms.append(jnp.matmul(A - A_rem, x_rem,
                            precision=jax.lax.Precision.HIGHEST))
    return df_sum_terms(terms)


def exact_dot(a: jax.Array, b: jax.Array) -> Pair:
    """a . b to df precision (via the matvec splitter on a 1-row matrix)."""
    hi, lo = exact_matvec(a[None, :], b)
    return hi[0], lo[0]


def exact_matmul(A: jax.Array, B: jax.Array) -> Pair:
    """A @ B with f32 operands, exact to df precision, MXU-native.

    Matrix-matrix generalization of exact_matvec (per-row grids for A,
    per-column grids for B). Foundation of the double-float blocked LDL
    (ops/chol.py ldl_fulldf) -- the TPU equivalent of the reference's
    f64 factorization arithmetic (linalg/dense/factorize.hpp runs in T =
    double; TPU v5e has no native f64, so the factor-path products are
    Ozaki-split into exact bf16/f32 piece products instead)."""
    dtype = A.dtype
    if A.shape[-2] == 0 or A.shape[-1] == 0 or B.shape[-1] == 0:
        z = jnp.zeros(A.shape[:-1] + (B.shape[-1],), dtype)
        return z, z
    k = A.shape[-1]
    if k > 1024:
        out = exact_matmul(A[..., :1024], B[..., :1024, :])
        for lo_ in range(1024, k, 1024):
            out = df_add(out, exact_matmul(A[..., lo_:lo_ + 1024],
                                           B[..., lo_:lo_ + 1024, :]))
        return out
    hp = jax.lax.Precision.HIGHEST
    sig_A = _pow2_grid(jnp.max(jnp.abs(A), axis=-1, keepdims=True), dtype)
    sig_B = _pow2_grid(jnp.max(jnp.abs(B), axis=-2, keepdims=True), dtype)
    A_p, A_r = _split_pieces(A, sig_A, _N_PIECES)
    B_p, B_r = _split_pieces(B, sig_B, _N_PIECES)
    terms = []
    for p, Ap in enumerate(A_p):
        for q, Bq in enumerate(B_p):
            if (p + q + 2) * _PIECE_BITS > 52:
                continue
            terms.append(jnp.matmul(Ap, Bq, precision=hp))
    terms.append(jnp.matmul(A_r, B, precision=hp))
    terms.append(jnp.matmul(A - A_r, B_r, precision=hp))
    return df_sum_terms(terms)


def df_matmul(A: Pair, B: Pair) -> Pair:
    """(A_hi + A_lo) @ (B_hi + B_lo) to df precision.

    Leading product is exact (Ozaki); cross terms are second-order and
    run as plain f32 matmuls; the lo*lo term is below the noise floor."""
    hp = jax.lax.Precision.HIGHEST
    hi, lo = exact_matmul(A[0], B[0])
    cross = (jnp.matmul(A[0], B[1], precision=hp)
             + jnp.matmul(A[1], B[0], precision=hp))
    return two_sum(hi, lo + cross)


def df_rsqrt(x: Pair) -> Pair:
    """rsqrt of a positive df value to df precision via Newton steps in
    DELTA form: delta = 1 - x r^2,  r' = r + r*(delta/2 + 3 delta^2/8).

    Why the delta form and two steps (hard-won, round 5):
    * The textbook form r' = r (3 - x r^2) / 2 needs an error-free
      two_sum against the CONSTANT 3.0 -- and inside fused jitted bodies
      XLA:CPU simplifies that two_sum's error term to zero (measured:
      t0[1] == 0 under jit, correct eagerly), silently collapsing the
      whole df factorization to f32 accuracy. In the delta form the
      cancelling subtraction 1 - x r^2 is EXACT by Sterbenz (x r^2 in
      [0.5, 2]), so no constant-operand EFT exists to be broken.
    * Two steps, not one: fused XLA:CPU codegen lowers rsqrt to the raw
      hardware approximation (~2^-12 relative; the eager op-by-op kernel
      refines to ~eps_f32). From 2^-12, one step reaches ~1e-7; two
      reach ~1e-14 from either start. The 3 delta^2/8 term matters on
      the first step for the same reason.
    """
    r = jax.lax.rsqrt(x[0])
    r_df = (r, jnp.zeros_like(r))
    for _ in range(2):
        r2 = df_mul(r_df, r_df)
        xr2 = df_mul(x, r2)
        # delta = 1 - x r^2: the hi subtraction is exact (Sterbenz)
        delta = (1.0 - xr2[0], -xr2[1])
        # corr = delta/2 + 3 delta^2/8 (second order keeps step-1 df-clean)
        d2 = df_mul(delta, delta)
        corr = df_add(df_scale(delta, jnp.full_like(r, 0.5)),
                      df_scale(d2, jnp.full_like(r, 0.375)))
        # r' = r + r * corr
        r_corr = df_mul(r_df, corr)
        r_df = df_add(r_df, r_corr)
    return r_df


def exact_matvec_d(A, A_lo, x, x_lo=None) -> Pair:
    """(A + A_lo) @ (x + x_lo) to df precision.

    A_lo/x_lo are double-float low words of the DATA (from f64 ingestion);
    their products are ~eps relative, so plain f32 matmuls suffice for the
    cross terms and the lo*lo term is below the df noise floor.
    """
    out = exact_matvec(A, x)
    hp = jax.lax.Precision.HIGHEST
    if A_lo is not None:
        out = df_add_f32(out, jnp.matmul(A_lo, x, precision=hp)
                         if isinstance(A_lo, jax.Array) else A_lo @ x)
    if x_lo is not None:
        out = df_add(out, exact_matvec(A, x_lo))
        if A_lo is not None:
            out = df_add_f32(out, jnp.matmul(A_lo, x_lo, precision=hp)
                             if isinstance(A_lo, jax.Array) else A_lo @ x_lo)
    return out
