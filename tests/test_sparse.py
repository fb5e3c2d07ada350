"""Sparse API + matrix-free MINRES backend tests
(reference test/src/sparse_qp_wrapper.cpp / sparse_qp_solve.cpp)."""
import numpy as np
import pytest
import scipy.sparse as spa

import proxsuite_tpu as pt
from proxsuite_tpu import sparse
from proxsuite_tpu.utils.random_qp import dense_strongly_convex_qp, kkt_residuals

EPS = 1e-9


@pytest.fixture(scope="module")
def qp_data():
    return dense_strongly_convex_qp(25, 8, 12, seed=17)


def test_sparse_solve_matches_dense(qp_data):
    res = sparse.solve(
        H=spa.csc_matrix(qp_data.H), g=qp_data.g,
        A=spa.csc_matrix(qp_data.A), b=qp_data.b,
        C=spa.csc_matrix(qp_data.C), l=qp_data.l, u=qp_data.u,
        eps_abs=EPS)
    assert int(res.info.status) == int(pt.QPSolverOutput.PROXQP_SOLVED)
    pri, dua = kkt_residuals(qp_data, res.x, res.y, res.z)
    assert max(pri, dua) <= 2 * EPS


def test_matrixfree_backend(qp_data):
    res = sparse.solve(
        H=spa.csc_matrix(qp_data.H), g=qp_data.g,
        A=spa.csc_matrix(qp_data.A), b=qp_data.b,
        C=spa.csc_matrix(qp_data.C), l=qp_data.l, u=qp_data.u,
        eps_abs=EPS, sparse_backend=pt.SparseBackend.MatrixFree)
    assert int(res.info.status) == int(pt.QPSolverOutput.PROXQP_SOLVED)
    pri, dua = kkt_residuals(qp_data, res.x, res.y, res.z)
    assert max(pri, dua) <= 2 * EPS


def test_sparse_qp_object(qp_data):
    qp = sparse.QP(25, 8, 12, settings=pt.Settings(eps_abs=EPS))
    qp.init(H=spa.csc_matrix(qp_data.H), g=qp_data.g,
            A=spa.csc_matrix(qp_data.A), b=qp_data.b,
            C=spa.csc_matrix(qp_data.C), l=qp_data.l, u=qp_data.u)
    res = qp.solve()
    assert int(res.info.status) == int(pt.QPSolverOutput.PROXQP_SOLVED)
    pri, dua = kkt_residuals(qp_data, res.x, res.y, res.z)
    assert max(pri, dua) <= 2 * EPS


def test_minres_standalone():
    import jax.numpy as jnp
    from proxsuite_tpu.ops.minres import minres
    rng = np.random.default_rng(3)
    n = 40
    M = rng.standard_normal((n, n))
    A = 0.5 * (M + M.T)  # indefinite
    b = rng.standard_normal(n)
    x, res_est, it = minres(lambda v: jnp.asarray(A) @ v, jnp.asarray(b),
                            tol=1e-13, max_iter=400)
    assert np.linalg.norm(A @ np.asarray(x) - b) < 1e-10


def _sparse_random_qp(n, n_eq, n_in, density, seed):
    """Sparse strongly-convex QP (reference
    utils::sparse_strongly_convex_qp, random_qp_problems.hpp:229-360)."""
    rng = np.random.default_rng(seed)
    # H = Hs Hs' has density ~ n * d_f^2; pick the factor density so the
    # assembled H hits the requested density
    d_f = min(density, np.sqrt(density / max(n, 1)))
    Hs = spa.random(n, n, density=d_f, random_state=rng,
                    format="csc", dtype=np.float64)
    H = Hs @ Hs.T + 0.1 * spa.eye(n)
    A = spa.random(n_eq, n, density=density, random_state=rng, format="csc")
    C = spa.random(n_in, n, density=density, random_state=rng, format="csc")
    x_sol = rng.standard_normal(n)
    g = rng.standard_normal(n)
    b = np.asarray(A @ x_sol).ravel()
    Cx = np.asarray(C @ x_sol).ravel()
    u = Cx + np.abs(rng.standard_normal(n_in)) + 0.1
    l = Cx - np.abs(rng.standard_normal(n_in)) - 0.1
    from proxsuite_tpu.utils.random_qp import DenseQPData
    return H.tocsc(), g, A, b, C, u, l


def test_true_sparse_path_stays_sparse():
    """The matrixfree backend must keep BCOO operands end-to-end (no
    densification) -- the round-1 'sparse' facade called .todense()."""
    from proxsuite_tpu.ops.sparse_ops import BCOO
    H, g, A, b, C, u, l = _sparse_random_qp(60, 15, 20, 0.1, seed=5)
    qp = sparse.QP(60, 15, 20, settings=pt.Settings(
        eps_abs=EPS, sparse_backend=pt.SparseBackend.MatrixFree))
    qp.init(H=H, g=g, A=A, b=b, C=C, l=l, u=u)
    assert isinstance(qp._scaled.H, BCOO)
    assert isinstance(qp._scaled.A, BCOO)
    assert isinstance(qp._scaled.C, BCOO)
    res = qp.solve()
    assert int(res.info.status) == int(pt.QPSolverOutput.PROXQP_SOLVED)
    x, y, z = np.asarray(res.x), np.asarray(res.y), np.asarray(res.z)
    pri = max(np.abs(A @ x - b).max(),
              np.maximum(C @ x - u, 0).max() + np.maximum(l - C @ x, 0).max())
    dua = np.abs(H @ x + g + A.T @ y + C.T @ z).max()
    assert max(pri, dua) <= 2 * EPS


def test_sparse_10k_dim():
    """VERDICT r1 item 3 'done' criterion: a >=10,000-dim, <1% dense QP
    solves through the sparse path, KKT-verified. The dense path would
    need a 10k x 10k materialized Schur factor; here memory stays O(nnz).
    Reference anchor: sparse/utils.hpp:288-330 (matrix-free operator),
    sparse/workspace.hpp:318 (auto fallback rule)."""
    n, n_eq, n_in = 10000, 2000, 2000
    eps = 1e-6
    H, g, A, b, C, u, l = _sparse_random_qp(n, n_eq, n_in, 0.001, seed=11)
    assert H.nnz / (n * n) < 0.01
    qp = sparse.QP(n, n_eq, n_in, settings=pt.Settings(eps_abs=eps))
    qp.init(H=H, g=g, A=A, b=b, C=C, l=l, u=u)
    # Automatic policy must have picked the matrix-free backend
    assert qp.settings.kkt_backend == "matrixfree"
    res = qp.solve()
    assert int(res.info.status) == int(pt.QPSolverOutput.PROXQP_SOLVED)
    x, y, z = np.asarray(res.x), np.asarray(res.y), np.asarray(res.z)
    pri = max(np.abs(A @ x - b).max() if n_eq else 0.0,
              np.maximum(C @ x - u, 0).max() + np.maximum(l - C @ x, 0).max())
    dua = np.abs(H @ x + g + A.T @ y + C.T @ z).max()
    assert max(pri, dua) <= 2 * eps, (pri, dua)
