"""Dense QP solver correctness: random problems at tight accuracy.

Mirrors the reference test strategy (test/src/dense_qp_with_eq_and_in.cpp,
dense_qp_eq.cpp, dense_unconstrained_qp.cpp): seeded random QPs solved at
eps_abs=1e-9, KKT residuals verified with an independent NumPy oracle.
"""
import numpy as np
import pytest

import proxsuite_tpu as pt
from proxsuite_tpu.utils.random_qp import (
    dense_box_constrained_qp,
    dense_lp,
    dense_strongly_convex_qp,
    kkt_residuals,
)

EPS = 1e-9


def assert_solved(qp, res, eps=EPS):
    assert int(res.info.status) == int(pt.QPSolverOutput.PROXQP_SOLVED), (
        f"status={pt.QPSolverOutput(int(res.info.status)).name} "
        f"pri={float(res.info.pri_res):.2e} dua={float(res.info.dua_res):.2e} "
        f"iter={int(res.info.iter)}")
    pri, dua = kkt_residuals(qp, res.x, res.y, res.z)
    assert pri <= 2 * eps, f"primal residual {pri:.3e}"
    assert dua <= 2 * eps, f"dual residual {dua:.3e}"


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("dims", [(10, 4, 6), (30, 10, 15), (50, 25, 25)])
def test_qp_eq_and_in(dims, seed):
    n, n_eq, n_in = dims
    qp = dense_strongly_convex_qp(n, n_eq, n_in, seed=seed)
    res = pt.solve(H=qp.H, g=qp.g, A=qp.A, b=qp.b, C=qp.C, l=qp.l, u=qp.u,
                   eps_abs=EPS)
    assert_solved(qp, res)


@pytest.mark.parametrize("seed", range(3))
def test_qp_eq_only(seed):
    n, n_eq = 20, 10
    qp = dense_strongly_convex_qp(n, n_eq, 0, seed=seed)
    res = pt.solve(H=qp.H, g=qp.g, A=qp.A, b=qp.b, C=qp.C, l=qp.l, u=qp.u,
                   eps_abs=EPS)
    assert_solved(qp, res)


@pytest.mark.parametrize("seed", range(3))
def test_qp_in_only(seed):
    n, n_in = 20, 12
    qp = dense_strongly_convex_qp(n, 0, n_in, seed=seed)
    res = pt.solve(H=qp.H, g=qp.g, A=qp.A, b=qp.b, C=qp.C, l=qp.l, u=qp.u,
                   eps_abs=EPS)
    assert_solved(qp, res)


def test_unconstrained_qp():
    qp = dense_strongly_convex_qp(25, 0, 0, seed=3)
    res = pt.solve(H=qp.H, g=qp.g, eps_abs=EPS)
    # closed form: x = -H^{-1} g
    x_star = np.linalg.solve(qp.H, -qp.g)
    np.testing.assert_allclose(np.asarray(res.x), x_star, atol=1e-7)
    assert_solved(qp, res)


def test_merit_function_pdal():
    qp = dense_strongly_convex_qp(30, 10, 15, seed=11)
    res = pt.solve(H=qp.H, g=qp.g, A=qp.A, b=qp.b, C=qp.C, l=qp.l, u=qp.u,
                   eps_abs=EPS,
                   merit_function_type=pt.MeritFunctionType.PDAL)
    assert_solved(qp, res)


def test_no_initial_guess_mode():
    qp = dense_strongly_convex_qp(20, 8, 10, seed=4)
    res = pt.solve(H=qp.H, g=qp.g, A=qp.A, b=qp.b, C=qp.C, l=qp.l, u=qp.u,
                   eps_abs=EPS,
                   initial_guess=pt.InitialGuess.NO_INITIAL_GUESS)
    assert_solved(qp, res)


def test_one_sided_bounds():
    qp = dense_strongly_convex_qp(20, 5, 10, seed=8)
    u = qp.u.copy()
    l = qp.l.copy()
    u[::2] = np.inf
    l[1::2] = -np.inf
    qp2 = qp._replace(u=u, l=l)
    res = pt.solve(H=qp2.H, g=qp2.g, A=qp2.A, b=qp2.b, C=qp2.C, l=qp2.l,
                   u=qp2.u, eps_abs=EPS)
    assert_solved(qp2, res)


def test_box_constraints():
    qp = dense_box_constrained_qp(20, 5, 10, seed=2)
    res = pt.solve(H=qp.H, g=qp.g, A=qp.A, b=qp.b, C=qp.C, l=qp.l, u=qp.u,
                   l_box=qp.l_box, u_box=qp.u_box, eps_abs=EPS)
    assert_solved(qp, res)


def test_lp_fast_path():
    qp = dense_lp(15, 5, 8, seed=6)
    res = pt.solve(H=None, g=qp.g, A=qp.A, b=qp.b, C=qp.C, l=qp.l, u=qp.u,
                   eps_abs=EPS, hessian_type=pt.HessianType.Zero)
    assert_solved(qp, res)


def test_diagonal_hessian_fast_path():
    rng = np.random.default_rng(7)
    n, n_eq, n_in = 20, 6, 10
    qp = dense_strongly_convex_qp(n, n_eq, n_in, seed=7)
    d = rng.random(n) + 0.5
    qp = qp._replace(H=np.diag(d))
    res = pt.solve(H=qp.H, g=qp.g, A=qp.A, b=qp.b, C=qp.C, l=qp.l, u=qp.u,
                   eps_abs=EPS, hessian_type=pt.HessianType.Diagonal)
    assert_solved(qp, res)


def test_warm_start_at_solution_converges_immediately():
    qp = dense_strongly_convex_qp(25, 8, 12, seed=9)
    res = pt.solve(H=qp.H, g=qp.g, A=qp.A, b=qp.b, C=qp.C, l=qp.l, u=qp.u,
                   eps_abs=EPS)
    res2 = pt.solve(H=qp.H, g=qp.g, A=qp.A, b=qp.b, C=qp.C, l=qp.l, u=qp.u,
                    eps_abs=EPS, x=res.x, y=res.y, z=res.z,
                    initial_guess=pt.InitialGuess.WARM_START)
    assert int(res2.info.iter) == 0
    assert_solved(qp, res2)


def test_duality_gap_stopping():
    qp = dense_strongly_convex_qp(20, 6, 10, seed=12)
    res = pt.solve(H=qp.H, g=qp.g, A=qp.A, b=qp.b, C=qp.C, l=qp.l, u=qp.u,
                   eps_abs=1e-7, check_duality_gap=True,
                   eps_duality_gap_abs=1e-7)
    assert int(res.info.status) == int(pt.QPSolverOutput.PROXQP_SOLVED)
    assert abs(float(res.info.duality_gap)) <= 1e-6
