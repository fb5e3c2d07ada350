"""Infeasibility detection (reference test/src/dense_qp_eq.cpp:217-256)."""
import numpy as np

import proxsuite_tpu as pt


def test_primal_infeasible_qp():
    # (x1-9)^2 + (x2-6)^2 s.t. x1 <= 10, x2 <= 10, x1 >= 20
    H = 2 * np.eye(2)
    g = np.array([-18.0, -12.0])
    C = np.array([[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]])
    u = np.array([10.0, 10.0, -20.0])
    l = np.full(3, -np.inf)
    res = pt.solve(H=H, g=g, C=C, l=l, u=u, eps_abs=1e-9)
    assert int(res.info.status) == int(
        pt.QPSolverOutput.PROXQP_PRIMAL_INFEASIBLE)


def test_primal_infeasibility_solving_closest_feasible():
    # same infeasible QP, but ask for the closest-feasible solution
    # (reference settings.primal_infeasibility_solving,
    # solver.hpp:1581-1595; status SOLVED_CLOSEST_PRIMAL_FEASIBLE)
    H = 2 * np.eye(2)
    g = np.array([-18.0, -12.0])
    C = np.array([[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]])
    u = np.array([10.0, 10.0, -20.0])
    l = np.full(3, -np.inf)
    res = pt.solve(H=H, g=g, C=C, l=l, u=u, eps_abs=1e-7,
                   primal_infeasibility_solving=True)
    status = int(res.info.status)
    assert status == int(
        pt.QPSolverOutput.PROXQP_SOLVED_CLOSEST_PRIMAL_FEASIBLE), (
        pt.QPSolverOutput(status).name)
    # the closest-feasible split of x1<=10 vs x1>=20 is x1=15:
    # si shifts absorb the contradiction symmetrically
    x = np.asarray(res.x)
    assert abs(x[0] - 15.0) < 1e-3
    # shifts reported: Cx - u residuals land in si
    si = np.asarray(res.si)
    assert np.abs(si).max() > 1.0  # nonzero shift on the contradictory rows


def test_feasible_nearby_qp_still_solves():
    # same problem with the contradictory bound removed
    H = 2 * np.eye(2)
    g = np.array([-18.0, -12.0])
    C = np.array([[1.0, 0.0], [0.0, 1.0]])
    u = np.array([10.0, 10.0])
    l = np.full(2, -np.inf)
    res = pt.solve(H=H, g=g, C=C, l=l, u=u, eps_abs=1e-9)
    assert int(res.info.status) == int(pt.QPSolverOutput.PROXQP_SOLVED)
    np.testing.assert_allclose(np.asarray(res.x), [9.0, 6.0], atol=1e-7)
