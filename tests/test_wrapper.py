"""Stateful QP object lifecycle (reference test/src/dense_qp_wrapper.cpp).

Covers: init/solve, warm start with previous result (0-iteration resolve),
partial update with preconditioner reuse, proximal parameter overrides,
nonconvex rho augmentation, cleanup.
"""
import numpy as np
import pytest

import proxsuite_tpu as pt
from proxsuite_tpu.types import InitialGuess
from proxsuite_tpu.utils.random_qp import dense_strongly_convex_qp, kkt_residuals
from proxsuite_tpu.wrapper import estimate_nonconvex_rho

EPS = 1e-9
DIMS = (20, 8, 10)


@pytest.fixture(scope="module")
def qp_data():
    return dense_strongly_convex_qp(*DIMS, seed=21)


def make_qp(settings=None):
    return pt.QP(*DIMS, settings=settings or pt.Settings(eps_abs=EPS))


def test_init_solve(qp_data):
    qp = make_qp()
    qp.init(H=qp_data.H, g=qp_data.g, A=qp_data.A, b=qp_data.b,
            C=qp_data.C, l=qp_data.l, u=qp_data.u)
    res = qp.solve()
    assert int(res.info.status) == int(pt.QPSolverOutput.PROXQP_SOLVED)
    pri, dua = kkt_residuals(qp_data, res.x, res.y, res.z)
    assert max(pri, dua) <= 2 * EPS


def test_warm_start_with_previous_result(qp_data):
    qp = make_qp()
    qp.init(H=qp_data.H, g=qp_data.g, A=qp_data.A, b=qp_data.b,
            C=qp_data.C, l=qp_data.l, u=qp_data.u)
    qp.solve()
    qp.settings = qp.settings.replace(
        initial_guess=InitialGuess.WARM_START_WITH_PREVIOUS_RESULT)
    res2 = qp.solve()
    # reference invariant: re-solve from the solution takes 0 iterations
    # (test/src/dense_maros_meszaros.cpp:160-162)
    assert int(res2.info.iter) == 0
    assert int(res2.info.status) == int(pt.QPSolverOutput.PROXQP_SOLVED)


def test_update_g_reuses_preconditioner(qp_data):
    qp = make_qp()
    qp.init(H=qp_data.H, g=qp_data.g, A=qp_data.A, b=qp_data.b,
            C=qp_data.C, l=qp_data.l, u=qp_data.u)
    qp.solve()
    g2 = qp_data.g + 0.1
    qp.update(g=g2)
    res = qp.solve()
    qp2_data = qp_data._replace(g=g2)
    pri, dua = kkt_residuals(qp2_data, res.x, res.y, res.z)
    assert max(pri, dua) <= 2 * EPS


def test_explicit_warm_start(qp_data):
    qp = make_qp()
    qp.init(H=qp_data.H, g=qp_data.g, A=qp_data.A, b=qp_data.b,
            C=qp_data.C, l=qp_data.l, u=qp_data.u)
    res = qp.solve()
    qp.cleanup()
    res2 = qp.solve(x=res.x, y=res.y, z=res.z)
    assert int(res2.info.iter) == 0


def test_nonconvex_rho_estimate():
    # estimation accuracy on a fully indefinite matrix (the reference's
    # nonconvex tests assert only the estimate, dense_qp_wrapper.py:4824-4900)
    rng = np.random.default_rng(0)
    M = rng.standard_normal((10, 10))
    H_ind = 0.5 * (M + M.T)
    rho = estimate_nonconvex_rho(H_ind, pt.Settings())
    min_eig = np.linalg.eigvalsh(H_ind).min()
    assert rho >= abs(min_eig) * 0.99  # power-iteration accuracy

    # solve a mildly nonconvex QP (reference uses a -0.01 eigenvalue shift,
    # generate_mixed_qp(n, i, -0.01)) to a stationary point
    qp_data = dense_strongly_convex_qp(10, 3, 5, seed=33)
    w, V = np.linalg.eigh(qp_data.H)
    H = (V * (w - w.min() - 0.01)) @ V.T  # minimal eigenvalue = -0.01
    min_eig2 = np.linalg.eigvalsh(H).min()
    qp = pt.QP(10, 3, 5, settings=pt.Settings(eps_abs=1e-7))
    qp.init(H=H, g=qp_data.g, A=qp_data.A, b=qp_data.b,
            C=qp_data.C, l=qp_data.l, u=qp_data.u,
            manual_minimal_H_eigenvalue=min_eig2)
    res = qp.solve()
    assert int(res.info.status) == int(pt.QPSolverOutput.PROXQP_SOLVED)
    qpn = qp_data._replace(H=H)
    pri, dua = kkt_residuals(qpn, res.x, res.y, res.z)
    assert max(pri, dua) <= 1e-6


def test_compute_backward(qp_data):
    qp = make_qp()
    qp.init(H=qp_data.H, g=qp_data.g, A=qp_data.A, b=qp_data.b,
            C=qp_data.C, l=qp_data.l, u=qp_data.u)
    qp.solve()
    n, n_eq, n_in = DIMS
    loss_derivative = np.zeros(n + n_eq + n_in)
    loss_derivative[:n] = 1.0  # dL/dx = 1
    bd = qp.compute_backward(loss_derivative)
    assert bd.dL_dg.shape == (n,)
    assert np.all(np.isfinite(np.asarray(bd.dL_dH)))
    # dL/dg finite-difference check on sum(x)
    h = 1e-6
    fd = np.zeros(n)
    for i in range(3):  # spot-check first 3 coords
        e = np.zeros(n)
        e[i] = h
        rp = pt.solve(H=qp_data.H, g=qp_data.g + e, A=qp_data.A, b=qp_data.b,
                      C=qp_data.C, l=qp_data.l, u=qp_data.u, eps_abs=EPS)
        rm = pt.solve(H=qp_data.H, g=qp_data.g - e, A=qp_data.A, b=qp_data.b,
                      C=qp_data.C, l=qp_data.l, u=qp_data.u, eps_abs=EPS)
        fd[i] = (float(np.sum(rp.x)) - float(np.sum(rm.x))) / (2 * h)
    np.testing.assert_allclose(np.asarray(bd.dL_dg)[:3], fd[:3],
                               atol=1e-4, rtol=1e-3)


def test_serialization_roundtrip(qp_data):
    from proxsuite_tpu import serialization as ser
    s = pt.Settings(eps_abs=1e-7, max_iter=123,
                    merit_function_type=pt.MeritFunctionType.PDAL)
    s2 = ser.load_settings_from_string(ser.save_settings_to_string(s))
    assert s == s2

    qp = make_qp()
    qp.init(H=qp_data.H, g=qp_data.g, A=qp_data.A, b=qp_data.b,
            C=qp_data.C, l=qp_data.l, u=qp_data.u)
    res = qp.solve()
    res2 = ser.load_results_from_string(ser.save_results_to_string(res))
    np.testing.assert_allclose(np.asarray(res.x), res2.x)
    assert int(res.info.status) == int(res2.info.status)

    blob = ser.save_model_to_bytes(H=qp_data.H, g=qp_data.g, A=qp_data.A,
                                   b=qp_data.b, C=qp_data.C, u=qp_data.u,
                                   l=qp_data.l)
    m = ser.load_model_from_bytes(blob)
    np.testing.assert_allclose(m["H"], qp_data.H)
