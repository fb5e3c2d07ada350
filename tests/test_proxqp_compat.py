"""Reference-bindings compatibility layer (proxsuite_tpu.proxqp).

Mirrors the usage patterns of the reference Python test suite
(test/src/dense_qp_wrapper.py, dense_qp_solve.py): the module layout,
mutable settings attributes, init/solve/update lifecycle, results views.
"""
import numpy as np
import pytest

import proxsuite_tpu as proxsuite
from proxsuite_tpu.utils.random_qp import (
    dense_strongly_convex_qp,
    kkt_residuals,
)


def test_module_layout():
    assert hasattr(proxsuite.proxqp, "dense")
    assert hasattr(proxsuite.proxqp, "sparse")
    assert hasattr(proxsuite.proxqp.dense, "QP")
    assert hasattr(proxsuite.proxqp.dense, "solve")
    assert hasattr(proxsuite.proxqp.dense, "BatchQP")
    assert hasattr(proxsuite.proxqp.dense, "solve_in_parallel")
    assert hasattr(proxsuite.proxqp.dense,
                   "estimate_minimal_eigen_value_of_symmetric_matrix")
    assert hasattr(proxsuite.proxqp, "InitialGuess")
    assert hasattr(proxsuite.proxqp, "QPSolverOutput")


def test_qp_object_lifecycle():
    qp_data = dense_strongly_convex_qp(20, 5, 8, seed=11)
    qp = proxsuite.proxqp.dense.QP(20, 5, 8)
    qp.settings.eps_abs = 1e-9
    qp.init(qp_data.H, qp_data.g, qp_data.A, qp_data.b,
            qp_data.C, qp_data.l, qp_data.u)
    qp.solve()
    assert qp.results.info.status == proxsuite.proxqp.QPSolverOutput.PROXQP_SOLVED
    pri, dua = kkt_residuals(qp_data, qp.results.x, qp.results.y, qp.results.z)
    assert pri < 1e-9 and dua < 1e-9
    assert qp.results.info.iter > 0
    assert np.isfinite(qp.results.info.objValue)

    # update g and re-solve with warm start
    g2 = qp_data.g + 0.05
    qp.settings.initial_guess = (
        proxsuite.proxqp.InitialGuess.WARM_START_WITH_PREVIOUS_RESULT)
    qp.update(g=g2)
    qp.solve()
    pri, dua = kkt_residuals(qp_data._replace(g=g2),
                             qp.results.x, qp.results.y, qp.results.z)
    assert pri < 1e-9 and dua < 1e-9


def test_settings_unknown_attribute_raises():
    qp = proxsuite.proxqp.dense.QP(3, 0, 0)
    with pytest.raises(AttributeError):
        qp.settings.not_a_real_knob = 1.0


def test_stateless_solve():
    d = dense_strongly_convex_qp(12, 3, 5, seed=5)
    res = proxsuite.proxqp.dense.solve(
        H=d.H, g=d.g, A=d.A, b=d.b, C=d.C, l=d.l, u=d.u, eps_abs=1e-9)
    pri, dua = kkt_residuals(d, res.x, res.y, res.z)
    assert pri < 1e-9 and dua < 1e-9


def test_batchqp_solve_in_parallel():
    B = 6
    qps = proxsuite.proxqp.dense.BatchQP()
    datas = []
    for i in range(B):
        d = dense_strongly_convex_qp(10, 2, 4, seed=100 + i)
        datas.append(d)
        qp = qps.init_qp_in_place(10, 2, 4)
        qp.settings.eps_abs = 1e-9
        qp.init(d.H, d.g, d.A, d.b, d.C, d.l, d.u)
    proxsuite.proxqp.dense.solve_in_parallel(qps)
    for d, i in zip(datas, range(B)):
        r = qps[i].results
        pri, dua = kkt_residuals(d, r.x, r.y, r.z)
        assert pri < 1e-9 and dua < 1e-9


def test_compute_backward_into_model():
    d = dense_strongly_convex_qp(8, 2, 3, seed=3)
    qp = proxsuite.proxqp.dense.QP(8, 2, 3)
    qp.settings.eps_abs = 1e-9
    qp.init(d.H, d.g, d.A, d.b, d.C, d.l, d.u)
    qp.solve()
    ld = np.concatenate([np.ones(8), np.zeros(2 + 3)])
    proxsuite.proxqp.dense.compute_backward(qp, ld)
    bd = qp.model.backward_data
    assert bd.dL_dg.shape == (8,)
    assert bd.dL_dH.shape == (8, 8)
    # finite-difference check on dL_dg (loss = sum(x))
    eps = 1e-6
    def obj(g):
        r = proxsuite.proxqp.dense.solve(
            H=d.H, g=g, A=d.A, b=d.b, C=d.C, l=d.l, u=d.u, eps_abs=1e-10)
        return float(np.sum(r.x))
    fd = np.zeros(8)
    for j in range(8):
        gp = d.g.copy(); gp[j] += eps
        gm = d.g.copy(); gm[j] -= eps
        fd[j] = (obj(gp) - obj(gm)) / (2 * eps)
    assert np.max(np.abs(fd - bd.dL_dg)) < 1e-3


def test_sparse_qp_compat():
    import scipy.sparse as sp
    d = dense_strongly_convex_qp(15, 4, 6, seed=9)
    qp = proxsuite.proxqp.sparse.QP(15, 4, 6)
    qp.settings.eps_abs = 1e-9
    qp.init(sp.csc_matrix(d.H), d.g, sp.csc_matrix(d.A), d.b,
            sp.csc_matrix(d.C), d.l, d.u)
    qp.solve()
    pri, dua = kkt_residuals(d, qp.results.x, qp.results.y, qp.results.z)
    assert pri < 1e-9 and dua < 1e-9


def test_inverse_mirror_settings_map():
    """The reference's inverse-representation knobs (settings.hpp:150-171)
    map onto the canonical fields; dead reference knobs are accepted."""
    import proxsuite_tpu.proxqp as proxqp
    qp = proxqp.dense.QP(4, 0, 2)
    qp.settings.mu_max_eq_inv = 1e6          # -> mu_min_eq = 1e-6
    qp.settings.mu_update_inv_factor = 5.0   # -> mu_update_factor = 0.2
    qp.settings.refactor_rho_threshold = 1e-7  # dead in reference too
    frozen = qp.settings.freeze()
    assert frozen.mu_min_eq == 1e-6
    assert abs(frozen.mu_update_factor - 0.2) < 1e-15
    assert qp.settings.mu_max_eq_inv == 1e6
    import pytest as _pytest
    with _pytest.raises(AttributeError):
        qp.settings.not_a_real_setting = 1.0
