"""Maros-Meszaros real-world corpus (reference
test/src/dense_maros_meszaros.cpp:60-168).

Small subset (n, m <= 200) runs in the default suite at eps_abs=2e-8 with
the reference's assertions: KKT residuals < 2*eps and a warm-started
resolve taking 0 iterations. The <=1000 subset runs under -m slow.
Problems are padded into shape buckets so the whole subset reuses a
handful of compiled executables (see utils/maros_meszaros.py).
"""
import numpy as np
import pytest

import proxsuite_tpu as pt
from proxsuite_tpu.types import InitialGuess
from proxsuite_tpu.utils.maros_meszaros import (
    load_preprocessed,
    problems_within,
)
from proxsuite_tpu.utils.random_qp import kkt_residuals

EPS = 2e-8
SETTINGS = pt.Settings(eps_abs=EPS, eps_rel=0.0,
                       eps_primal_inf=1e-12, eps_dual_inf=1e-12)

SMALL = problems_within(200, 200)


def _solve_padded(name):
    orig, padded, dims = load_preprocessed(name)
    n, n_eq, n_in = dims
    qp = pt.QP(padded.H.shape[0], padded.A.shape[0], padded.C.shape[0],
               settings=SETTINGS)
    qp.init(H=padded.H, g=padded.g, A=padded.A, b=padded.b,
            C=padded.C, l=padded.l, u=padded.u)
    res = qp.solve()
    return orig, dims, qp, res


@pytest.mark.parametrize("name", SMALL)
def test_maros_meszaros_small(name):
    orig, (n, n_eq, n_in), qp, res = _solve_padded(name)
    status = int(res.info.status)
    assert status == int(pt.QPSolverOutput.PROXQP_SOLVED), (
        f"{name}: status={pt.QPSolverOutput(status).name} "
        f"pri={float(res.info.pri_res):.2e} dua={float(res.info.dua_res):.2e}")
    x = np.asarray(res.x)[:n]
    y = np.asarray(res.y)[:n_eq]
    z = np.asarray(res.z)[:n_in]
    pri, dua = kkt_residuals(orig, x, y, z)
    assert dua < 2 * EPS, f"{name}: dual residual {dua:.3e}"
    assert pri < 2 * EPS, f"{name}: primal residual {pri:.3e}"

    # warm-start resolve must take 0 iterations
    # (dense_maros_meszaros.cpp:160-162)
    qp.settings = qp.settings.replace(
        initial_guess=InitialGuess.WARM_START_WITH_PREVIOUS_RESULT)
    res2 = qp.solve()
    assert int(res2.info.iter) == 0, f"{name}: warm resolve iter != 0"


@pytest.mark.slow
@pytest.mark.parametrize("name",
                         [p for p in problems_within(1000, 1000)
                          if p not in SMALL])
def test_maros_meszaros_mid(name):
    orig, (n, n_eq, n_in), qp, res = _solve_padded(name)
    status = int(res.info.status)
    assert status == int(pt.QPSolverOutput.PROXQP_SOLVED), f"{name}"
    x = np.asarray(res.x)[:n]
    y = np.asarray(res.y)[:n_eq]
    z = np.asarray(res.z)[:n_in]
    pri, dua = kkt_residuals(orig, x, y, z)
    assert dua < 2 * EPS and pri < 2 * EPS, f"{name}: {pri:.2e}/{dua:.2e}"


def test_cvxqp1_f32_high_accuracy_robustness():
    """f32 HA regression for the round-4 NaN class (CVXQP1_S).

    The Ruiz-scaled CVXQP Hessians are numerically indefinite AT f32 with
    rho = 1e-6: before the round-4 fixes the first Cholesky overflowed
    (tiny pivot floor -> rsqrt(1e-38)), the exact linesearch divided 0/0,
    and the solve returned NaN residuals. With relative pivot floors,
    best-iterate refinement, the substitution LDL solve, and the
    rho-retry ladder, the automatic chain must SOLVE it and certify the
    reference-grade criterion against the f64 oracle.
    """
    # coarse buckets = the TPU corpus-run configuration this guards
    orig, padded, dims = load_preprocessed("CVXQP1_S",
                                           buckets=(128, 512, 1024))
    n, n_eq, n_in = dims
    eps = 1e-6
    settings = pt.Settings(eps_abs=eps, eps_rel=0.0, max_iter=1000,
                           high_accuracy=True, inner_stall_iters=50,
                           kkt_backend="primaldual",
                           eps_primal_inf=1e-12, eps_dual_inf=1e-12)
    qp = pt.QP(padded.H.shape[0], padded.A.shape[0], padded.C.shape[0],
               settings=settings, dtype=np.float32)
    qp.init(H=padded.H, g=padded.g, A=padded.A, b=padded.b,
            C=padded.C, l=padded.l, u=padded.u)
    res = qp.solve()
    assert int(res.info.status) == int(pt.QPSolverOutput.PROXQP_SOLVED)
    x = np.asarray(res.x, np.float64)[:n]
    y = np.asarray(res.y, np.float64)[:n_eq]
    z = np.asarray(res.z, np.float64)[:n_in]
    pri, dua = kkt_residuals(orig, x, y, z)
    assert pri < 2 * eps and dua < 2 * eps, f"{pri:.2e}/{dua:.2e}"
    assert np.isfinite(pri) and np.isfinite(dua)
