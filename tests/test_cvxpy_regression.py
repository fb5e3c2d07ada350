"""CVXPY regression cases (reference test/src/cvxpy.cpp:22-161)."""
import numpy as np

import proxsuite_tpu as pt


def test_3dim_cvxpy_case():
    H = np.array([[13.0, 12.0, -2.0], [12.0, 17.0, 6.0], [-2.0, 6.0, 12.0]])
    g = np.array([-22.0, -14.5, 13.0])
    C = np.eye(3)
    l = -np.ones(3)
    u = np.ones(3)
    res = pt.solve(H=H, g=g, C=C, l=l, u=u, eps_abs=1e-9)
    x, z = np.asarray(res.x), np.asarray(res.z)
    pri = np.abs(np.maximum(C @ x - u, 0) + np.minimum(C @ x - l, 0)).max()
    dua = np.abs(H @ x + g + C.T @ z).max()
    assert pri <= 1e-9 and dua <= 1e-9


def test_1dim_cvxpy_case():
    H = np.array([[20.0]])
    g = np.array([-10.0])
    C = np.array([[1.0]])
    res = pt.solve(H=H, g=g, C=C, l=np.array([0.0]), u=np.array([1.0]),
                   eps_abs=1e-8)
    assert abs(float(res.x[0]) - 0.5) <= 1e-8


def test_1dim_warm_start_at_solution_stays():
    H = np.array([[20.0]])
    g = np.array([-10.0])
    C = np.array([[1.0]])
    res = pt.solve(H=H, g=g, C=C, l=np.array([0.0]), u=np.array([1.0]),
                   eps_abs=1e-4, x=np.array([0.5]), z=np.array([0.0]),
                   initial_guess=pt.InitialGuess.WARM_START)
    assert int(res.info.iter) == 0
    assert abs(float(res.x[0]) - 0.5) <= 1e-4
