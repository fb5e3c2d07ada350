"""Learning through a differentiable QP layer (reference
examples/python/qplayer_sudoku.py, simplified): learn the linear cost g so
the QP solution matches a target, by gradient descent through the solver.
"""
import _common  # noqa: F401  (path + platform setup)
import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
import optax

import proxsuite_tpu as pt
from proxsuite_tpu.qplayer import QPFunction
from proxsuite_tpu.utils.random_qp import dense_strongly_convex_qp


def main():
    qp = dense_strongly_convex_qp(6, 2, 4, seed=0)
    target = jnp.asarray(np.random.default_rng(1).standard_normal(6) * 0.1)
    layer = QPFunction(eps=1e-9)

    H = jnp.asarray(qp.H)
    A = jnp.asarray(qp.A)
    b = jnp.asarray(qp.b)
    C = jnp.asarray(qp.C)
    l = jnp.asarray(qp.l)
    u = jnp.asarray(qp.u)

    @jax.jit
    def loss_fn(g):
        x, _, _ = layer(H, g, A, b, C, l, u)
        return jnp.sum((x - target) ** 2)

    g = jnp.asarray(qp.g)
    opt = optax.adam(1e-1)
    state = opt.init(g)
    grad_fn = jax.jit(jax.grad(loss_fn))
    for step in range(100):
        grads = grad_fn(g)
        updates, state = opt.update(grads, state)
        g = optax.apply_updates(g, updates)
        if step % 20 == 0:
            print(f"step {step:3d}  loss {float(loss_fn(g)):.6f}")
    print("final loss:", float(loss_fn(g)))


if __name__ == "__main__":
    main()
