"""Multi-device batch solving: sharded == unsharded (reference
test/src/parallel_qp_solve.cpp:19-196 asserts serial == OpenMP-parallel;
the TPU analogue is one mesh-sharded batch vs the single-device batch).
Runs on the 8 virtual CPU devices set up by conftest.py.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import proxsuite_tpu as pt
from proxsuite_tpu.parallel.batch import (solve_backward_in_parallel,
                                          solve_in_parallel)
from proxsuite_tpu.utils.random_qp import dense_strongly_convex_qp


@pytest.fixture(scope="module")
def batch_data():
    B, n, n_eq, n_in = 16, 12, 4, 6
    qps = [dense_strongly_convex_qp(n, n_eq, n_in, seed=100 + i)
           for i in range(B)]
    st = lambda f: jnp.stack([jnp.asarray(f(q)) for q in qps])
    return (st(lambda q: q.H), st(lambda q: q.g), st(lambda q: q.A),
            st(lambda q: q.b), st(lambda q: q.C), st(lambda q: q.u),
            st(lambda q: q.l))


def _mesh():
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs multiple devices (conftest provides 8 virtual)")
    return Mesh(np.array(devs), ("batch",))


def test_sharded_forward_matches_unsharded(batch_data):
    H, g, A, b, C, u, l = batch_data
    settings = pt.Settings(eps_abs=1e-9)
    ref = solve_in_parallel(H, g, A, b, C, u, l, settings=settings)
    res = solve_in_parallel(H, g, A, b, C, u, l, settings=settings,
                            mesh=_mesh())
    # 8-way sharded lanes are numerically identical programs
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res.y), np.asarray(ref.y),
                               rtol=0, atol=1e-12)
    assert int(jnp.sum(res.info.status == 0)) == H.shape[0]


def test_sharded_backward_matches_unsharded(batch_data):
    H, g, A, b, C, u, l = batch_data
    settings = pt.Settings(eps_abs=1e-9)
    B, n = g.shape
    gx = jnp.ones((B, n)) / n
    gy = jnp.zeros((B, A.shape[1]))
    gz = jnp.zeros((B, C.shape[1]))
    ref_res, ref_bd = solve_backward_in_parallel(
        H, g, A, b, C, u, l, gx, gy, gz, settings=settings)

    mesh = _mesh()
    from jax.sharding import NamedSharding, PartitionSpec as P
    sh = NamedSharding(mesh, P("batch"))
    put = lambda a: jax.device_put(a, sh)
    res, bd = solve_backward_in_parallel(
        put(H), put(g), put(A), put(b), put(C), put(u), put(l),
        put(gx), put(gy), put(gz), settings=settings)
    np.testing.assert_allclose(np.asarray(bd.dL_dg),
                               np.asarray(ref_bd.dL_dg),
                               rtol=0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(bd.dL_dH),
                               np.asarray(ref_bd.dL_dH),
                               rtol=0, atol=1e-10)


def test_sharded_lanes_actually_distributed(batch_data):
    """The sharded result must really live on multiple devices."""
    H, g, A, b, C, u, l = batch_data
    mesh = _mesh()
    res = solve_in_parallel(H, g, A, b, C, u, l,
                            settings=pt.Settings(eps_abs=1e-7), mesh=mesh)
    n_dev = len(res.x.sharding.device_set)
    assert n_dev == len(jax.devices())
