"""Differentiation tests: finite-difference checks of the QP layer.

Mirrors reference test/src/dense_backward.cpp:16-148 (finite-difference
checks of dL/dg and dL/db on feasible QPs).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import proxsuite_tpu as pt
from proxsuite_tpu.qplayer import QPFunction
from proxsuite_tpu.utils.random_qp import dense_strongly_convex_qp

EPS = 1e-9


@pytest.fixture(scope="module")
def layer_and_qp():
    qp = dense_strongly_convex_qp(8, 3, 5, seed=5)
    layer = QPFunction(eps=EPS)

    # jit once: eager layer calls would re-trace the solver per call
    @jax.jit
    def loss(g, b):
        x, y, z = layer(jnp.asarray(qp.H), g, jnp.asarray(qp.A), b,
                        jnp.asarray(qp.C), jnp.asarray(qp.l),
                        jnp.asarray(qp.u))
        return 0.5 * jnp.sum(x ** 2) + jnp.sum(x)

    grad_fn = jax.jit(jax.grad(loss, argnums=(0, 1)))
    return loss, grad_fn, qp


def test_dL_dg_finite_difference(layer_and_qp):
    loss, grad_fn, qp = layer_and_qp
    g0 = jnp.asarray(qp.g)
    b0 = jnp.asarray(qp.b)
    grad_g, _ = grad_fn(g0, b0)
    fd = np.zeros_like(qp.g)
    h = 1e-6
    for i in range(len(qp.g)):
        e = np.zeros_like(qp.g)
        e[i] = h
        fd[i] = (float(loss(g0 + e, b0)) - float(loss(g0 - e, b0))) / (2 * h)
    np.testing.assert_allclose(np.asarray(grad_g), fd, atol=1e-4, rtol=1e-3)


def test_dL_db_finite_difference(layer_and_qp):
    loss, grad_fn, qp = layer_and_qp
    g0 = jnp.asarray(qp.g)
    b0 = jnp.asarray(qp.b)
    _, grad_b = grad_fn(g0, b0)
    fd = np.zeros_like(qp.b)
    h = 1e-6
    for i in range(len(qp.b)):
        e = np.zeros_like(qp.b)
        e[i] = h
        fd[i] = (float(loss(g0, b0 + e)) - float(loss(g0, b0 - e))) / (2 * h)
    np.testing.assert_allclose(np.asarray(grad_b), fd, atol=1e-4, rtol=1e-3)


def test_batched_layer_grad_runs():
    B = 4
    qps = [dense_strongly_convex_qp(6, 2, 4, seed=s) for s in range(B)]
    layer = QPFunction(eps=1e-9)
    H = jnp.stack([jnp.asarray(q.H) for q in qps])
    g = jnp.stack([jnp.asarray(q.g) for q in qps])
    A = jnp.stack([jnp.asarray(q.A) for q in qps])
    b = jnp.stack([jnp.asarray(q.b) for q in qps])
    C = jnp.stack([jnp.asarray(q.C) for q in qps])
    l = jnp.stack([jnp.asarray(q.l) for q in qps])
    u = jnp.stack([jnp.asarray(q.u) for q in qps])

    def loss(g):
        x, y, z = layer(H, g, A, b, C, l, u)
        return jnp.sum(x ** 2)

    gr = jax.grad(loss)(g)
    assert gr.shape == g.shape
    assert np.all(np.isfinite(np.asarray(gr)))


def test_jax_qplayer_infeasible_variant():
    """JAX-native infeasible variant returns shifts and yields finite,
    descent-direction gradients through the extended adjoint
    (reference QPFunctionFn_infeas semantics)."""
    import jax
    import jax.numpy as jnp
    from proxsuite_tpu.qplayer import QPFunction

    H = jnp.eye(2)
    g = jnp.array([0.0, 0.3])
    A = jnp.array([[1.0, 0.2]])
    b = jnp.array([1.0])
    C = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    u = jnp.array([-1.0, 5.0])
    l = jnp.array([-9.0, -5.0])
    layer = QPFunction(eps=1e-10, maxIter=1000,
                       structural_feasibility=False)

    def loss(Av, Gv):
        x, y, z, se, si = layer(H, g, Av, b, Gv, l, u)
        return (se ** 2).sum() + (si ** 2).sum()

    l0, grads = jax.value_and_grad(loss, argnums=(0, 1))(A, C)
    assert float(l0) > 1e-2
    gA, gG = grads
    assert jnp.isfinite(gA).all() and jnp.isfinite(gG).all()
    assert float(jnp.abs(gA).max()) < 1e3
    step = 1e-4
    l1 = loss(A - step * gA, C - step * gG)
    assert float(l1) < float(l0)
