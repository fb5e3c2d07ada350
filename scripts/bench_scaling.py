"""Multi-device scaling benchmark: QPs/sec at 1..N devices.

Measures the BASELINE.md north star's scaling axis (iterations/s at 1
chip / 1 host / N hosts). Problems are independent, so scaling is data
parallelism over the batch axis of a Mesh (SURVEY.md section 5); the
efficiency loss to look for is batch-lane divergence (stragglers) and
dispatch overhead.

Usage:
    python scripts/bench_scaling.py                     # real devices
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        JAX_PLATFORMS=cpu python scripts/bench_scaling.py   # virtual mesh
"""
import json
import sys
import time
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def main(B=256, n=32, n_eq=8, n_in=16, eps=1e-4):
    from proxsuite_tpu.parallel.batch import _solve_batch_jit
    from proxsuite_tpu.types import ProblemSpec, Settings
    from proxsuite_tpu.utils.random_qp import dense_strongly_convex_qp

    dtype = jnp.float32
    spec = ProblemSpec(n=n, n_eq=n_eq, n_in=n_in)
    settings = Settings(eps_abs=eps)
    qps = [dense_strongly_convex_qp(n, n_eq, n_in, seed=s) for s in range(B)]
    st = lambda f: jnp.asarray(np.stack([np.asarray(f(q)) for q in qps]), dtype)
    arrays = (st(lambda q: q.H), st(lambda q: q.g), st(lambda q: q.A),
              st(lambda q: q.b), st(lambda q: q.C), st(lambda q: q.u),
              st(lambda q: q.l), jnp.zeros((B, 0), dtype),
              jnp.zeros((B, 0), dtype))

    devices = jax.devices()
    results = {}
    for nd in [d for d in (1, 2, 4, 8, 16) if d <= len(devices)]:
        mesh = Mesh(np.array(devices[:nd]), axis_names=("batch",))
        sharding = NamedSharding(mesh, P("batch"))
        sharded = tuple(jax.device_put(a, sharding) for a in arrays)
        res = _solve_batch_jit(spec, settings, *sharded)
        jax.block_until_ready(res)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = _solve_batch_jit(spec, settings, *sharded)
            jax.block_until_ready(res)
            times.append(time.perf_counter() - t0)
        t = min(times)
        results[nd] = B / t
        print(f"{nd} device(s): {B / t:,.0f} QPs/sec "
              f"(efficiency {(B / t) / (nd * results[1]) * 100:.0f}%)")
    print(json.dumps({"scaling_qps_per_sec": results}))


if __name__ == "__main__":
    main()
