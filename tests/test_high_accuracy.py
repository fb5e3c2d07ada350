"""High-accuracy f32 mode: double-float residuals/iterates + exact
Ozaki-split matvecs reach reference-grade accuracy without f64 hardware
(SURVEY.md section 7 "f32 factorization + compensated residual/refinement";
reference anchor dense/solver.hpp:408-541). These tests run the WHOLE
pipeline in f32 (as on TPU) and measure KKT residuals against the f64 data
with the independent NumPy oracle.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import proxsuite_tpu as pt
from proxsuite_tpu.utils.random_qp import dense_strongly_convex_qp, kkt_residuals


def test_exact_matvec_df_accuracy():
    from proxsuite_tpu.ops.df import exact_matvec
    rng = np.random.default_rng(0)
    for (r, c) in ((100, 100), (768, 512), (300, 2500)):
        A32 = rng.standard_normal((r, c)).astype(np.float32)
        x32 = rng.standard_normal(c).astype(np.float32)
        truth = A32.astype(np.float64) @ x32.astype(np.float64)
        hi, lo = jax.jit(exact_matvec)(jnp.asarray(A32), jnp.asarray(x32))
        got = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
        scale = np.abs(truth).max()
        assert np.abs(got - truth).max() / scale < 1e-11


def test_two_prod_and_df_scale():
    from proxsuite_tpu.ops.df import df_scale, two_prod
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal(1000).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(1000).astype(np.float32))
    p, e = jax.jit(two_prod)(a, b)
    truth = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    assert np.abs(got - truth).max() <= 1e-14 * np.abs(truth).max()


@pytest.mark.parametrize("eps", [1e-6, 1e-8])
def test_high_accuracy_f32_solve(eps):
    """f32 end-to-end (data ingested f64, split into df words) must reach
    true-f64-measured KKT residuals at the requested eps."""
    worst = 0.0
    for seed in range(4):
        d = dense_strongly_convex_qp(60, 20, 30, seed=seed)
        qp = pt.QP(60, 20, 30, settings=pt.Settings(
            eps_abs=eps, high_accuracy=True, max_iter=300),
            dtype=jnp.float32)
        qp.init(H=d.H, g=d.g, A=d.A, b=d.b, C=d.C, l=d.l, u=d.u)
        res = qp.solve()
        assert int(res.info.status) == int(pt.QPSolverOutput.PROXQP_SOLVED)
        pri, dua = kkt_residuals(d, res.x_full(), res.y_full(),
                                 res.z_full())
        worst = max(worst, pri, dua)
    assert worst < 2 * eps, f"true KKT {worst:.3e} vs eps {eps:g}"


def test_high_accuracy_off_by_default_unchanged():
    """The HA machinery must not change default-path results (lo fields
    stay zero; same trajectory)."""
    d = dense_strongly_convex_qp(30, 10, 15, seed=3)
    r1 = pt.solve(H=d.H, g=d.g, A=d.A, b=d.b, C=d.C, l=d.l, u=d.u,
                  eps_abs=1e-9)
    assert r1.x_lo is None
    pri, dua = kkt_residuals(d, r1.x, r1.y, r1.z)
    assert max(pri, dua) < 2e-9


@pytest.mark.parametrize("kind", ["box", "zero_box", "diag"])
def test_high_accuracy_box_and_hessian_types(kind):
    """HA mode covers box constraints and Zero/Diagonal Hessians
    (reference f64 accuracy applies to every problem class:
    dense/wrapper.hpp:520 box init, HessianType dispatch solver.hpp:88).
    External f64 oracle on the double-float (hi+lo) solution."""
    from proxsuite_tpu.types import HessianType
    from proxsuite_tpu.utils.random_qp import dense_box_constrained_qp

    eps = 1e-8
    st = pt.Settings(eps_abs=eps, eps_rel=0.0, high_accuracy=True,
                     max_iter=300, eps_primal_inf=1e-12, eps_dual_inf=1e-12)
    d = dense_box_constrained_qp(20, 5, 8, seed=2)
    if kind == "box":
        qp = pt.QP(20, 5, 8, box_constraints=True, settings=st,
                   dtype=jnp.float32)
        qp.init(H=d.H, g=d.g, A=d.A, b=d.b, C=d.C, l=d.l, u=d.u,
                l_box=d.l_box, u_box=d.u_box)
        H = d.H
    elif kind == "zero_box":
        qp = pt.QP(20, 5, 8, box_constraints=True,
                   hessian_type=HessianType.Zero, settings=st,
                   dtype=jnp.float32)
        qp.init(H=None, g=d.g, A=d.A, b=d.b, C=d.C, l=d.l, u=d.u,
                l_box=d.l_box - 10.0, u_box=d.u_box + 10.0)
        d = d._replace(l_box=d.l_box - 10.0, u_box=d.u_box + 10.0)
        H = np.zeros((20, 20))
    else:
        H = np.diag(np.linspace(1.0, 3.0, 20))
        qp = pt.QP(20, 5, 8, box_constraints=True,
                   hessian_type=HessianType.Diagonal, settings=st,
                   dtype=jnp.float32)
        qp.init(H=H, g=d.g, A=d.A, b=d.b, C=d.C, l=d.l, u=d.u,
                l_box=d.l_box, u_box=d.u_box)
    res = qp.solve()
    assert int(res.info.status) == int(pt.QPSolverOutput.PROXQP_SOLVED)
    x, y, z = res.x_full(), res.y_full(), res.z_full()
    Ce = np.vstack([d.C, np.eye(20)])
    ue = np.concatenate([d.u, d.u_box])
    le = np.concatenate([d.l, d.l_box])
    pri = max(np.abs(d.A @ x - d.b).max(),
              np.maximum(Ce @ x - ue, 0).max(),
              np.maximum(le - Ce @ x, 0).max())
    dua = np.abs(H @ x + d.g + d.A.T @ y + Ce.T @ z).max()
    assert max(pri, dua) < 2 * eps, f"{kind}: KKT {max(pri, dua):.3e}"


def test_high_accuracy_batched():
    """vmapped HA pipeline: a batch of QPs reaches the same double-float
    accuracy as single solves (counterpart of parallel/qp_solve.hpp over
    the HA regime)."""
    from proxsuite_tpu.parallel.batch import solve_in_parallel

    B, eps = 8, 1e-8
    qs = [dense_strongly_convex_qp(30, 10, 15, seed=s) for s in range(B)]
    st = pt.Settings(eps_abs=eps, eps_rel=0.0, high_accuracy=True)
    res = solve_in_parallel(
        H=np.stack([q.H for q in qs]), g=np.stack([q.g for q in qs]),
        A=np.stack([q.A for q in qs]), b=np.stack([q.b for q in qs]),
        C=np.stack([q.C for q in qs]), u=np.stack([q.u for q in qs]),
        l=np.stack([q.l for q in qs]), settings=st)
    xs, ys, zs = res.x_full(), res.y_full(), res.z_full()
    for i, q in enumerate(qs):
        assert int(res.info.status[i]) == int(
            pt.QPSolverOutput.PROXQP_SOLVED)
        pri, dua = kkt_residuals(q, xs[i], ys[i], zs[i])
        assert max(pri, dua) < 2 * eps, f"lane {i}: {max(pri, dua):.3e}"
