"""Batched QP solving vmapped on one chip and sharded over a device mesh
(TPU-native counterpart of reference benchmark/timings-parallel.cpp and
examples using solve_in_parallel).

Run on CPU with a virtual mesh:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/batched_solve_sharded.py
"""
import _common  # noqa: F401  (path + platform setup)
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from proxsuite_tpu.parallel.batch import solve_in_parallel
from proxsuite_tpu.utils.random_qp import dense_strongly_convex_qp


def main():
    B, n, n_eq, n_in = 64, 16, 4, 8
    qps = [dense_strongly_convex_qp(n, n_eq, n_in, seed=s) for s in range(B)]
    stack = lambda f: jnp.asarray(np.stack([np.asarray(f(q)) for q in qps]),
                                  jnp.float32)
    H, g = stack(lambda q: q.H), stack(lambda q: q.g)
    A, b = stack(lambda q: q.A), stack(lambda q: q.b)
    C, u, l = stack(lambda q: q.C), stack(lambda q: q.u), stack(lambda q: q.l)

    devices = jax.devices()
    mesh = Mesh(np.array(devices), axis_names=("batch",)) \
        if B % len(devices) == 0 else None
    res = solve_in_parallel(H, g, A, b, C, u, l, eps_abs=1e-4, mesh=mesh)
    solved = int(jnp.sum(res.info.status == 0))
    print(f"solved {solved}/{B} across {len(devices)} device(s)")
    print("mean iterations:", float(jnp.mean(res.info.iter)))


if __name__ == "__main__":
    main()
