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
