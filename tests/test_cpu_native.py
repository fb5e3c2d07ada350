"""Native C++ CPU backend: correctness vs the JAX path
(native/proxqp_cpu.cpp via proxsuite_tpu.cpu)."""
import numpy as np
import pytest

import proxsuite_tpu as pt
from proxsuite_tpu import cpu
from proxsuite_tpu.utils.random_qp import dense_strongly_convex_qp, kkt_residuals

pytestmark = pytest.mark.skipif(not cpu.available(),
                                reason="native lib not built")


def _batch(B, n, ne, ni, seed0=0):
    qps = [dense_strongly_convex_qp(n, ne, ni, seed=seed0 + s)
           for s in range(B)]
    st = lambda f: np.stack([np.asarray(f(q)) for q in qps])
    return qps, (st(lambda q: q.H), st(lambda q: q.g), st(lambda q: q.A),
                 st(lambda q: q.b), st(lambda q: q.C), st(lambda q: q.u),
                 st(lambda q: q.l))


def test_cpu_batch_solves_to_high_accuracy():
    qps, (H, g, A, b, C, u, l) = _batch(12, 30, 10, 15)
    r = cpu.solve_batch_cpu(H, g, A, b, C, u, l, eps_abs=1e-9)
    assert int((r.status == 0).sum()) == 12
    worst = max(max(kkt_residuals(qps[i], r.x[i], r.y[i], r.z[i]))
                for i in range(12))
    assert worst <= 2e-9


def test_cpu_matches_jax_solution():
    # same (shape, settings) as test_dense_qp::test_one_sided_bounds so the
    # compiled executable is reused from the cache
    qps, (H, g, A, b, C, u, l) = _batch(3, 20, 5, 10, seed0=40)
    r = cpu.solve_batch_cpu(H, g, A, b, C, u, l, eps_abs=1e-9)
    for i in range(3):
        res = pt.solve(H=H[i], g=g[i], A=A[i], b=b[i], C=C[i], l=l[i],
                       u=u[i], eps_abs=1e-9)
        np.testing.assert_allclose(r.x[i], np.asarray(res.x), atol=1e-6)


def test_cpu_multithreaded_matches_serial():
    qps, (H, g, A, b, C, u, l) = _batch(8, 16, 4, 8, seed0=90)
    r1 = cpu.solve_batch_cpu(H, g, A, b, C, u, l, eps_abs=1e-9, n_threads=1)
    r2 = cpu.solve_batch_cpu(H, g, A, b, C, u, l, eps_abs=1e-9, n_threads=2)
    np.testing.assert_allclose(r1.x, r2.x, atol=0)  # bitwise identical


def test_cpu_inequality_only():
    qps, (H, g, A, b, C, u, l) = _batch(4, 15, 0, 8, seed0=60)
    r = cpu.solve_batch_cpu(H, g, None, None, C, u, l, eps_abs=1e-9)
    assert int((r.status == 0).sum()) == 4
