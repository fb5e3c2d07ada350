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
