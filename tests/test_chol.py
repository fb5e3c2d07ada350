"""ops/chol.py: matmul-only blocked Cholesky + inverse factor.

Oracle style follows the reference factorization tests
(test/src/sparse_factorization.cpp "factorize compressed": factor, then
compare the reconstruction against the input).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from proxsuite_tpu.ops.chol import cholesky_inverse


@pytest.mark.parametrize("m", [1, 3, 8, 16, 17, 33, 104])
def test_matches_numpy_cholesky(m):
    rng = np.random.default_rng(42 + m)
    X = rng.standard_normal((5, m, m))
    S = X @ np.swapaxes(X, -1, -2) + m * np.eye(m)
    L, Linv = jax.jit(cholesky_inverse)(jnp.asarray(S))
    L_ref = np.linalg.cholesky(S)
    assert np.max(np.abs(np.asarray(L) - L_ref)) < 1e-9
    assert np.max(np.abs(np.asarray(Linv) @ L_ref - np.eye(m))) < 1e-9


def test_blocked_vs_unblocked_agree():
    rng = np.random.default_rng(0)
    X = rng.standard_normal((2, 40, 40))
    S = X @ np.swapaxes(X, -1, -2) + 40 * np.eye(40)
    L8, _ = cholesky_inverse(jnp.asarray(S), block=8)
    L16, _ = cholesky_inverse(jnp.asarray(S), block=16)
    assert np.allclose(np.asarray(L8), np.asarray(L16), atol=1e-10)


def test_ill_conditioned_with_refinement_quality():
    # mu-regularized Schur complements reach cond ~ 1e8; the inverse factor
    # must stay finite and reconstruct to O(cond * eps)
    rng = np.random.default_rng(3)
    m = 64
    X = rng.standard_normal((m, m))
    S = X @ X.T + 1e-8 * np.eye(m)
    L, Linv = cholesky_inverse(jnp.asarray(S))
    assert np.all(np.isfinite(np.asarray(L)))
    assert np.all(np.isfinite(np.asarray(Linv)))
    rec = np.asarray(L) @ np.asarray(L).T
    assert np.max(np.abs(rec - S)) / np.max(np.abs(S)) < 1e-12


def test_vmap_composes():
    rng = np.random.default_rng(7)
    X = rng.standard_normal((4, 24, 24))
    S = X @ np.swapaxes(X, -1, -2) + 24 * np.eye(24)
    L_b, _ = jax.vmap(lambda s: cholesky_inverse(s))(jnp.asarray(S))
    L_ref = np.linalg.cholesky(S)
    assert np.max(np.abs(np.asarray(L_b) - L_ref)) < 1e-9


def _quasi_definite(m, seed=0):
    """Random quasi-definite saddle matrix [[P, W^T], [W, -D]]."""
    rng = np.random.default_rng(seed)
    n1 = m // 2
    W = rng.standard_normal((m - n1, n1))
    P = rng.standard_normal((n1, n1))
    P = P @ P.T + 0.5 * np.eye(n1)
    D = np.diag(0.1 + rng.random(m - n1))
    return np.block([[P, W.T], [W, -D]])


@pytest.mark.parametrize("m", [23, 37, 48])
def test_signed_ldl_solve_and_reconstruction(m):
    """fori_loop blocked signed LDL: reconstruction, inverse, solve."""
    from proxsuite_tpu.ops.chol import ldl_signed_and_inv, ldl_solve_blocked

    K = _quasi_definite(m, seed=m)
    rng = np.random.default_rng(m + 1)
    r = rng.standard_normal(m)
    fac = ldl_signed_and_inv(jnp.asarray(K), full_inverse=False)
    assert fac.block > 0  # factors carry their block size
    w = np.asarray(ldl_solve_blocked(fac, jnp.asarray(r)))
    assert np.max(np.abs(K @ w - r)) < 1e-11

    fac2 = ldl_signed_and_inv(jnp.asarray(K), full_inverse=True)
    L, s, Li = (np.asarray(fac2.L), np.asarray(fac2.sgn),
                np.asarray(fac2.Linv))
    assert np.max(np.abs(np.einsum("ik,k,jk->ij", L, s, L) - K)) < 1e-12
    assert np.max(np.abs(Li @ L - np.eye(m))) < 1e-12


def test_signed_ldl_batched():
    """Leading batch dims through the fori_loop path."""
    from proxsuite_tpu.ops.chol import ldl_signed_and_inv, ldl_solve_blocked

    K = np.stack([_quasi_definite(20, seed=s) for s in range(3)])
    r = np.random.default_rng(9).standard_normal((3, 20))
    fac = ldl_signed_and_inv(jnp.asarray(K), full_inverse=False)
    w = np.asarray(ldl_solve_blocked(fac, jnp.asarray(r)))
    err = np.max(np.abs(np.einsum("bij,bj->bi", K, w) - r))
    assert err < 1e-11


def test_fulldf_contracts_where_f32_cannot():
    """Double-float signed LDL: refinement contracts on a quasi-definite
    system whose f32 factor growth (~||W||^2/(rho*mu)) defeats the
    f32-stored factor (the CVXQP1_S failure class, ops/chol.py
    FullDFLDL docstring)."""
    from proxsuite_tpu.ops.chol import ldl_fulldf, ldl_solve_fulldf

    m, n1 = 64, 32
    rng = np.random.default_rng(5)
    W = rng.standard_normal((m - n1, n1))
    P = rng.standard_normal((n1, n1))
    P = P @ P.T
    P = P / np.linalg.norm(P, 2)           # ||P|| = 1, eigenvalues >= 0
    rho = mu = 1e-6
    K = np.block([[P + rho * np.eye(n1), W.T],
                  [W, -mu * np.eye(m - n1)]])
    K32 = jnp.asarray(K, jnp.float32)
    r = rng.standard_normal(m)
    fac = ldl_fulldf(K32)
    w64 = np.zeros(m)
    K64 = np.asarray(K32, np.float64)  # the f32-rounded operator
    for _ in range(6):
        res = r - K64 @ w64
        rhi = jnp.asarray(res, jnp.float32)
        rlo = jnp.asarray(res - np.asarray(rhi, np.float64), jnp.float32)
        ch, cl = ldl_solve_fulldf(fac, (rhi, rlo))
        w64 = w64 + np.asarray(ch, np.float64) + np.asarray(cl, np.float64)
    assert np.max(np.abs(K64 @ w64 - r)) < 1e-6 * np.max(np.abs(r))


def test_rho_retry_ladder_flag():
    """rho_retry_ladder=False: MAX_ITER results are returned as-is,
    with no escalated re-solves (Settings docstring contract)."""
    import proxsuite_tpu as pt
    from proxsuite_tpu.utils.random_qp import dense_strongly_convex_qp

    d = dense_strongly_convex_qp(12, 4, 6, seed=3)
    st = pt.Settings(eps_abs=1e-9, max_iter=1, max_iter_in=1,
                     kkt_backend="primaldual", rho_retry_ladder=False)
    qp = pt.QP(12, 4, 6, settings=st, dtype=np.float32)
    qp.init(H=d.H, g=d.g, A=d.A, b=d.b, C=d.C, l=d.l, u=d.u)
    res = qp.solve()
    assert int(res.info.status) == int(
        pt.QPSolverOutput.PROXQP_MAX_ITER_REACHED)
    assert float(res.info.rho) == pytest.approx(1e-6)  # never escalated


def test_fulldf_jit_matches_eager():
    """Regression for the round-5 jit-EFT hazard: fused XLA:CPU codegen
    broke df_rsqrt (constant-operand two_sum simplified away + raw
    hardware rsqrt), collapsing the jitted df factorization to f32
    accuracy while eager runs stayed df-accurate. Assert the JITTED
    factor reconstructs K to df-level relative error on a trailing-style
    block with 1e6 magnitudes."""
    from proxsuite_tpu.ops.chol import _ldl_block_fulldf

    rng = np.random.default_rng(0)
    bs, mu = 16, 1e-3
    G = rng.standard_normal((bs, bs))
    G = (G @ G.T) * 1e6
    T64 = -(mu * np.eye(bs) + G)
    Th = np.asarray(T64, np.float32)
    Tl = np.asarray(T64 - np.asarray(Th, np.float64), np.float32)
    eps_floor = jnp.asarray(1e-10, jnp.float32)
    for fn in (_ldl_block_fulldf, jax.jit(_ldl_block_fulldf)):
        Lh, Ll, sd, _, _ = fn(jnp.asarray(Th), jnp.asarray(Tl), eps_floor)
        L = np.asarray(Lh, np.float64) + np.asarray(Ll, np.float64)
        s = np.asarray(sd, np.float64)
        rel = np.abs((L * s[None, :]) @ L.T - T64).max() / np.abs(T64).max()
        assert rel < 1e-12, rel
