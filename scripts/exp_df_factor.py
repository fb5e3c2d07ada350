"""Experiment: which precision upgrades restore iterative-refinement
contraction for the f32 signed-LDL KKT solve at rho=1e-6?

Regime: CVXQP1_S Ruiz-scaled KKT, mu at the f32 floor (1e-6), rho=1e-6
(the reference's default, where the f64 path needs ~17 total iterations).
The round-4 f32 path fails here (factorization error ~ n*eps ~ 2e-5
exceeds rho; refinement amplifies) and the rho-retry ladder brute-forces
rho=1e-4 at ~230 iterations.

Variants:
  base    : f32 factor + f32 substitution solve (current primaldual path)
  dfsolve : f32 factor + double-float substitution solve
  dffac   : df-trailing factorization + f32 substitution solve
  both    : df-trailing factorization + df substitution solve

Measured: refinement error trajectory ||K dw - r||_inf / ||r||_inf over
8 refinement steps with the HA (exact-matvec) residual.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_COMPILATION_CACHE", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from proxsuite_tpu.ops.df import (df_add, df_add_f32, df_neg, df_scale,
                                  df_to_f32, exact_matvec, two_prod,
                                  df_sum_terms, two_sum)
from proxsuite_tpu.ops.chol import (_ldl_signed_block, ldl_signed_and_inv,
                                    ldl_solve_blocked)

BLOCK = 16
F32 = jnp.float32


# ------------------------------------------------------------------ df ops
def exact_matmul(A, B):
    """A @ B exact to df precision via Ozaki splitting (both operands).

    Contractions here are <= 1024 long; pieces of 7 mantissa bits keep
    every piece-product matmul exact (see ops/df.py exact_matvec)."""
    from proxsuite_tpu.ops.df import _split_pieces, _pow2_grid, _N_PIECES, _PIECE_BITS
    dtype = A.dtype
    sig_A = _pow2_grid(jnp.max(jnp.abs(A), axis=1, keepdims=True), dtype)
    sig_B = _pow2_grid(jnp.max(jnp.abs(B), axis=0, keepdims=True), dtype)
    A_p, A_r = _split_pieces(A, sig_A, _N_PIECES)
    B_p, B_r = _split_pieces(B, sig_B, _N_PIECES)
    hp = jax.lax.Precision.HIGHEST
    terms = []
    for p, Ap in enumerate(A_p):
        for q, Bq in enumerate(B_p):
            if (p + q + 2) * _PIECE_BITS > 52:
                continue
            terms.append(jnp.matmul(Ap, Bq, precision=hp))
    terms.append(jnp.matmul(A_r, B, precision=hp))
    terms.append(jnp.matmul(A - A_r, B_r, precision=hp))
    return df_sum_terms(terms)


def _ldl_signed_block_df(Ahi, Alo, eps_floor):
    """Unrolled signed Cholesky of a df (hi, lo) block; L committed f32."""
    bs = Ahi.shape[-1]
    dtype = Ahi.dtype
    row_idx = np.arange(bs)
    L = jnp.zeros_like(Ahi)
    signs, rs = [], []
    for j in range(bs):
        d = Ahi[..., j, j] + Alo[..., j, j]
        s = jnp.where(d < 0, -1.0, 1.0).astype(dtype)
        mag = jnp.maximum(jnp.abs(d), eps_floor)
        r = jax.lax.rsqrt(mag)
        # one Newton step: r <- r*(1.5 - 0.5*mag*r^2) for extra bits
        r = r * (1.5 - 0.5 * mag * r * r)
        signs.append(s)
        rs.append(r)
        col = (Ahi[..., :, j] + Alo[..., :, j]) * (r * s)[..., None]
        col = jnp.where(row_idx >= j, col, jnp.zeros((), dtype))
        L = L.at[..., :, j].set(col)
        if j + 1 < bs:
            # exact rank-1 downdate in df
            p, e = two_prod(col[..., :, None], col[..., None, :])
            upd_hi, upd_lo = p * s[..., None, None], e * s[..., None, None]
            hi, err = two_sum(Ahi, -upd_hi)
            Ahi, Alo = two_sum(hi, err + (Alo - upd_lo))
    sign_vec = jnp.stack(signs, axis=-1)
    # block inverse from the committed f32 L (storage-rounded anyway)
    X = jnp.zeros_like(Ahi)
    hp = jax.lax.Precision.HIGHEST
    for j in range(bs):
        e_j = jnp.zeros((bs,), dtype).at[j].set(1.0)
        if j > 0:
            lrow = L[..., j, :j]
            acc = jnp.einsum("...k,...kn->...n", lrow, X[..., :j, :], precision=hp)
            row = (e_j - acc) * rs[j][..., None]
        else:
            row = e_j * rs[j][..., None]
        X = X.at[..., j, :].set(row)
    return L, sign_vec, X


def ldl_signed_df(K, block=BLOCK, eps_floor=None):
    """Blocked signed Cholesky with df trailing accumulation.

    L committed in f32; trailing matrix kept as a df pair with exact
    panel products. Returns (L, sgn, Linv_diagblocks) compatible with
    ldl_solve_blocked."""
    m = K.shape[-1]
    dtype = K.dtype
    if eps_floor is None:
        scale = jnp.max(jnp.abs(jnp.diagonal(K)))
        eps_floor = 4 * jnp.finfo(dtype).eps * scale
    mp = ((m + block - 1) // block) * block
    assert mp == m, "pad outside for the experiment"
    nb = mp // block
    Ahi, Alo = K, jnp.zeros_like(K)
    L = jnp.zeros_like(K)
    Linv = jnp.zeros_like(K)
    sgn = jnp.zeros(K.shape[:-1], dtype)
    for k in range(nb):
        kb, ke = k * block, (k + 1) * block
        Ld, sd, Ldi = _ldl_signed_block_df(
            Ahi[..., kb:ke, kb:ke], Alo[..., kb:ke, kb:ke], eps_floor)
        L = L.at[..., kb:ke, kb:ke].set(Ld)
        Linv = Linv.at[..., kb:ke, kb:ke].set(Ldi)
        sgn = sgn.at[..., kb:ke].set(sd)
        if ke < mp:
            Bhi = Ahi[..., ke:, kb:ke]
            Blo = Alo[..., ke:, kb:ke]
            # Lp = (B_df) Ld^-T diag(sd): f32 commit, df-informed operand
            Lp = (jnp.matmul(Bhi, Ldi.T, precision=jax.lax.Precision.HIGHEST)
                  + jnp.matmul(Blo, Ldi.T,
                               precision=jax.lax.Precision.HIGHEST)) * sd[None, :]
            L = L.at[..., ke:, kb:ke].set(Lp)
            # exact trailing downdate: A -= (Lp*sd) Lp^T in df
            Up_hi, Up_lo = exact_matmul(Lp * sd[None, :], Lp.T)
            hi, err = two_sum(Ahi[..., ke:, ke:], -Up_hi)
            nhi, nlo = two_sum(hi, err + (Alo[..., ke:, ke:] - Up_lo))
            Ahi = Ahi.at[..., ke:, ke:].set(nhi)
            Alo = Alo.at[..., ke:, ke:].set(nlo)
    return L, sgn, Linv


def ldl_solve_blocked_df(L, sgn, Linv, r_df, block=BLOCK):
    """df substitution solve: K^-1 r with df accumulation throughout."""
    rhi, rlo = r_df
    m = rhi.shape[-1]
    nb = m // block
    whi = jnp.zeros_like(rhi)
    wlo = jnp.zeros_like(rhi)
    for k in range(nb):
        kb, ke = k * block, (k + 1) * block
        acc = (rhi[kb:ke], rlo[kb:ke])
        if k > 0:
            phi, plo = exact_matmul(L[kb:ke, :kb], whi[:kb, None])
            acc = df_add(acc, (-phi[:, 0], -plo[:, 0]))
            acc = df_add_f32(acc, -jnp.matmul(
                L[kb:ke, :kb], wlo[:kb], precision=jax.lax.Precision.HIGHEST))
        vhi, vlo = exact_matmul(Linv[kb:ke, kb:ke], acc[0][:, None])
        v = df_add((vhi[:, 0], vlo[:, 0]),
                   (jnp.matmul(Linv[kb:ke, kb:ke], acc[1],
                               precision=jax.lax.Precision.HIGHEST),
                    jnp.zeros_like(acc[1])))
        whi = whi.at[kb:ke].set(v[0])
        wlo = wlo.at[kb:ke].set(v[1])
    whi, wlo = df_scale((whi, wlo), sgn)
    vhi_out = jnp.zeros_like(whi)
    vlo_out = jnp.zeros_like(whi)
    for k in reversed(range(nb)):
        kb, ke = k * block, (k + 1) * block
        acc = (whi[kb:ke], wlo[kb:ke])
        if ke < m:
            phi, plo = exact_matmul(L[ke:, kb:ke].T, vhi_out[ke:, None])
            acc = df_add(acc, (-phi[:, 0], -plo[:, 0]))
            acc = df_add_f32(acc, -jnp.matmul(
                L[ke:, kb:ke].T, vlo_out[ke:],
                precision=jax.lax.Precision.HIGHEST))
        phi, plo = exact_matmul(Linv[kb:ke, kb:ke].T, acc[0][:, None])
        v = df_add((phi[:, 0], plo[:, 0]),
                   (jnp.matmul(Linv[kb:ke, kb:ke].T, acc[1],
                               precision=jax.lax.Precision.HIGHEST),
                    jnp.zeros_like(acc[1])))
        vhi_out = vhi_out.at[kb:ke].set(v[0])
        vlo_out = vlo_out.at[kb:ke].set(v[1])
    return vhi_out, vlo_out


# ------------------------------------------------------------- experiment
def build_kkt():
    import proxsuite_tpu as pt
    from proxsuite_tpu.utils.maros_meszaros import load_preprocessed
    from proxsuite_tpu.api import build_scaled_qp_ha, split_df_host

    orig, padded, dims = load_preprocessed("CVXQP1_S", buckets=(128, 512, 1024))
    settings = pt.Settings(eps_abs=1e-6, high_accuracy=True)
    from proxsuite_tpu.types import ProblemSpec
    spec = ProblemSpec(n=padded.H.shape[0], n_eq=padded.A.shape[0],
                       n_in=padded.C.shape[0])
    parts = []
    for k in ("H", "g", "A", "b", "C", "u", "l"):
        hi, lo = split_df_host(np.asarray(getattr(padded, k), np.float64))
        parts.extend([jnp.asarray(hi, F32), jnp.asarray(lo, F32)])
    # no box arrays
    z = lambda *s: jnp.zeros(s, F32)
    parts.extend([z(0), z(0), z(0), z(0)])
    qp = build_scaled_qp_ha(spec, settings, *parts)
    return spec, qp


def main():
    spec, qp = build_kkt()
    n, n_eq, n_c = spec.n, spec.n_eq, spec.n_c
    rho, mu_eq, mu_in = 1e-6, 1e-6, 1e-6
    rng = np.random.default_rng(0)
    mask = jnp.asarray(rng.random(n_c) < 0.5, F32)  # random active set
    H, A, C = qp.H, qp.A, qp.C
    Cm = mask[:, None] * C
    K = jnp.block([
        [H + rho * jnp.eye(n, dtype=F32), A.T, Cm.T],
        [A, -mu_eq * jnp.eye(n_eq, dtype=F32), jnp.zeros((n_eq, n_c), F32)],
        [Cm, jnp.zeros((n_c, n_eq), F32), -mu_in * jnp.eye(n_c, dtype=F32)],
    ])
    m = K.shape[0]
    print("KKT dim", m, " cond estimate (f64):",
          "%.2e" % np.linalg.cond(np.asarray(K, np.float64)))
    r = jnp.asarray(rng.standard_normal(m), F32)
    r = r / jnp.max(jnp.abs(r))

    K64 = np.asarray(K, np.float64)
    r64 = np.asarray(r, np.float64)

    def resid(w64):
        return np.max(np.abs(K64 @ w64 - r64))

    def run(label, factor_fn, solve_fn, steps=8):
        fac = factor_fn(K)
        w64 = np.zeros(m)
        errs = []
        res_hi = jnp.asarray(r64 - K64 @ w64, F32)
        res_lo = jnp.asarray((r64 - K64 @ w64) - np.asarray(res_hi, np.float64), F32)
        for i in range(steps):
            c = solve_fn(fac, (res_hi, res_lo))
            c64 = (np.asarray(c[0], np.float64) + np.asarray(c[1], np.float64)
                   if isinstance(c, tuple) else np.asarray(c, np.float64))
            w64 = w64 + c64
            e = resid(w64)
            errs.append(e)
            res = r64 - K64 @ w64
            res_hi = jnp.asarray(res, F32)
            res_lo = jnp.asarray(res - np.asarray(res_hi, np.float64), F32)
        print(f"{label:8s}: " + " ".join("%.1e" % e for e in errs))

    # base: current library path
    def fac_base(K):
        return ldl_signed_and_inv(K, full_inverse=False)

    def solve_base(fac, r_df):
        return ldl_solve_blocked(*fac, r_df[0] + r_df[1])

    def fac_df(K):
        return ldl_signed_df(K)

    def solve_df(fac, r_df):
        return ldl_solve_blocked_df(*fac, r_df)

    run("base", fac_base, solve_base)
    run("dfsolve", fac_base, solve_df)
    run("dffac", fac_df, solve_base)
    run("both", fac_df, solve_df)


if __name__ == "__main__":
    main()


# ---------------------------------------------------------- full-df LDL
def _dfm(Ahi, Alo, Bhi, Blo):
    """df matmul: (A_hi+A_lo)(B_hi+B_lo) to df precision."""
    hp = jax.lax.Precision.HIGHEST
    hi, lo = exact_matmul(Ahi, Bhi)
    cross = (jnp.matmul(Ahi, Blo, precision=hp)
             + jnp.matmul(Alo, Bhi, precision=hp))
    return two_sum(hi, lo + cross)


def _df_rsqrt(dhi, dlo):
    """rsqrt of a df scalar/vector to df precision (Newton in df)."""
    r = jax.lax.rsqrt(dhi)
    # newton: r' = r*(3 - d*r^2)/2 in df
    r2h, r2l = two_prod(r, r)
    dh, dl = df_mul_pair((dhi, dlo), (r2h, r2l))
    th, tl = two_sum(jnp.full_like(dh, 3.0), -dh)
    tl = tl - dl
    h1, l1 = df_scale_pair((th, tl), r)
    return df_scale_pair((h1, l1), jnp.full_like(r, 0.5))


def df_mul_pair(x, y):
    p, e = two_prod(x[0], y[0])
    e = e + (x[0] * y[1] + x[1] * y[0])
    return two_sum(p, e)


def df_scale_pair(x, d):
    p, e = two_prod(x[0], d)
    return two_sum(p, e + x[1] * d)


def _ldl_block_fulldf(Ahi, Alo, eps_floor):
    bs = Ahi.shape[-1]
    dtype = Ahi.dtype
    row_idx = np.arange(bs)
    Lh = jnp.zeros_like(Ahi)
    Ll = jnp.zeros_like(Ahi)
    signs, rsh, rsl = [], [], []
    for j in range(bs):
        dh, dl = Ahi[..., j, j], Alo[..., j, j]
        s = jnp.where(dh < 0, -1.0, 1.0).astype(dtype)
        magh = jnp.maximum(jnp.abs(dh), eps_floor)
        magl = jnp.where(jnp.abs(dh) > eps_floor, dl * s, 0.0)
        rh, rl = _df_rsqrt(magh, magl)
        signs.append(s); rsh.append(rh); rsl.append(rl)
        colh, coll = df_mul_pair((Ahi[..., :, j], Alo[..., :, j]),
                                 (rh[..., None] * s[..., None],
                                  rl[..., None] * s[..., None]))
        colh = jnp.where(row_idx >= j, colh, 0.0)
        coll = jnp.where(row_idx >= j, coll, 0.0)
        Lh = Lh.at[..., :, j].set(colh)
        Ll = Ll.at[..., :, j].set(coll)
        if j + 1 < bs:
            oh, ol = df_mul_pair((colh[..., :, None], coll[..., :, None]),
                                 (colh[..., None, :], coll[..., None, :]))
            oh, ol = oh * s, ol * s
            h, e = two_sum(Ahi, -oh)
            Ahi, Alo = two_sum(h, e + (Alo - ol))
    sign_vec = jnp.stack(signs, axis=-1)
    # df block inverse by forward substitution
    Xh = jnp.zeros_like(Ahi); Xl = jnp.zeros_like(Ahi)
    for j in range(bs):
        e_j = jnp.zeros((bs,), dtype).at[j].set(1.0)
        acc_h, acc_l = e_j, jnp.zeros_like(e_j)
        if j > 0:
            ph, pl = _dfm(Lh[j:j+1, :j], Ll[j:j+1, :j], Xh[:j, :], Xl[:j, :])
            acc_h, acc_l = two_sum(acc_h, -ph[0])
            acc_l = acc_l - pl[0]
        rh_b = rsh[j][..., None]; rl_b = rsl[j][..., None]
        vh, vl = df_mul_pair((acc_h, acc_l), (rh_b, rl_b))
        Xh = Xh.at[j, :].set(vh); Xl = Xl.at[j, :].set(vl)
    return Lh, Ll, sign_vec, Xh, Xl


def ldl_fulldf(K, block=BLOCK, eps_floor=None):
    m = K.shape[-1]
    dtype = K.dtype
    if eps_floor is None:
        scale = jnp.max(jnp.abs(jnp.diagonal(K)))
        eps_floor = 4 * jnp.finfo(dtype).eps * scale
    nb = m // block
    Ahi, Alo = K, jnp.zeros_like(K)
    Lh = jnp.zeros_like(K); Ll = jnp.zeros_like(K)
    Ih = jnp.zeros_like(K); Il = jnp.zeros_like(K)
    sgn = jnp.zeros((m,), dtype)
    for k in range(nb):
        kb, ke = k * block, (k + 1) * block
        ldh, ldl_, sd, xih, xil = _ldl_block_fulldf(
            Ahi[kb:ke, kb:ke], Alo[kb:ke, kb:ke], eps_floor)
        Lh = Lh.at[kb:ke, kb:ke].set(ldh); Ll = Ll.at[kb:ke, kb:ke].set(ldl_)
        Ih = Ih.at[kb:ke, kb:ke].set(xih); Il = Il.at[kb:ke, kb:ke].set(xil)
        sgn = sgn.at[kb:ke].set(sd)
        if ke < m:
            ph, pl = _dfm(Ahi[ke:, kb:ke], Alo[ke:, kb:ke], xih.T, xil.T)
            ph, pl = df_scale_pair((ph, pl), sd[None, :])
            Lh = Lh.at[ke:, kb:ke].set(ph); Ll = Ll.at[ke:, kb:ke].set(pl)
            uh, ul = _dfm(ph * sd[None, :], pl * sd[None, :], ph.T, pl.T)
            h, e = two_sum(Ahi[ke:, ke:], -uh)
            nh, nl = two_sum(h, e + (Alo[ke:, ke:] - ul))
            Ahi = Ahi.at[ke:, ke:].set(nh)
            Alo = Alo.at[ke:, ke:].set(nl)
    return Lh, Ll, sgn, Ih, Il


def ldl_solve_fulldf(fac, r_df, block=BLOCK):
    Lh, Ll, sgn, Ih, Il = fac
    rhi, rlo = r_df
    m = rhi.shape[-1]
    nb = m // block
    wh = jnp.zeros_like(rhi); wl = jnp.zeros_like(rhi)
    for k in range(nb):
        kb, ke = k * block, (k + 1) * block
        ah, al = rhi[kb:ke], rlo[kb:ke]
        if k > 0:
            ph, pl = _dfm(Lh[kb:ke, :kb], Ll[kb:ke, :kb],
                          wh[:kb, None], wl[:kb, None])
            h, e = two_sum(ah, -ph[:, 0]); ah, al = two_sum(h, e + al - pl[:, 0])
        vh, vl = _dfm(Ih[kb:ke, kb:ke], Il[kb:ke, kb:ke],
                      ah[:, None], al[:, None])
        wh = wh.at[kb:ke].set(vh[:, 0]); wl = wl.at[kb:ke].set(vl[:, 0])
    wh, wl = df_scale_pair((wh, wl), sgn)
    vh_o = jnp.zeros_like(wh); vl_o = jnp.zeros_like(wh)
    for k in reversed(range(nb)):
        kb, ke = k * block, (k + 1) * block
        ah, al = wh[kb:ke], wl[kb:ke]
        if ke < m:
            ph, pl = _dfm(Lh[ke:, kb:ke].T, Ll[ke:, kb:ke].T,
                          vh_o[ke:, None], vl_o[ke:, None])
            h, e = two_sum(ah, -ph[:, 0]); ah, al = two_sum(h, e + al - pl[:, 0])
        ph, pl = _dfm(Ih[kb:ke, kb:ke].T, Il[kb:ke, kb:ke].T,
                      ah[:, None], al[:, None])
        vh_o = vh_o.at[kb:ke].set(ph[:, 0]); vl_o = vl_o.at[kb:ke].set(pl[:, 0])
    return vh_o, vl_o


def main2():
    spec, qp = build_kkt()
    n, n_eq, n_c = spec.n, spec.n_eq, spec.n_c
    rng = np.random.default_rng(0)
    mask = jnp.asarray(rng.random(n_c) < 0.5, F32)
    for rho, mu in ((1e-6, 1e-6), (1e-6, 1e-3)):
        H, A, C = qp.H, qp.A, qp.C
        Cm = mask[:, None] * C
        K = jnp.block([
            [H + rho * jnp.eye(n, dtype=F32), A.T, Cm.T],
            [A, -mu * jnp.eye(n_eq, dtype=F32), jnp.zeros((n_eq, n_c), F32)],
            [Cm, jnp.zeros((n_c, n_eq), F32), -mu * jnp.eye(n_c, dtype=F32)],
        ])
        m = K.shape[0]
        K64 = np.asarray(K, np.float64)
        r = jnp.asarray(rng.standard_normal(m), F32)
        r = r / jnp.max(jnp.abs(r))
        r64 = np.asarray(r, np.float64)
        fac = ldl_fulldf(K)
        w64 = np.zeros(m)
        errs = []
        for i in range(6):
            res = r64 - K64 @ w64
            rhi = jnp.asarray(res, F32)
            rlo = jnp.asarray(res - np.asarray(rhi, np.float64), F32)
            ch, cl = ldl_solve_fulldf(fac, (rhi, rlo))
            w64 = w64 + np.asarray(ch, np.float64) + np.asarray(cl, np.float64)
            errs.append(np.max(np.abs(K64 @ w64 - r64)))
        print(f"fulldf rho={rho:g} mu={mu:g}: "
              + " ".join("%.1e" % e for e in errs))


if __name__ == "__main__" and "--fulldf" in sys.argv:
    main2()
