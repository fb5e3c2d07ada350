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
