"""Benchmark: batched dense QP throughput on one TPU chip.

Workload mirrors the reference batch benchmark
(/root/reference/benchmark/timings-parallel.cpp:19-35): dense QPs with
n=100, n_eq=n_in=50, sparsity 0.15. The reference solves 1024 such QPs at
eps_abs=1e-9 in f64 on CPU threads; here the batch is vmapped onto the
TPU's MXU.

Precision note: TPU v5e has no native f64; f64 runs are slow emulation.
The headline metric is f32 at eps_abs=1e-4 (achievable in single
precision after Ruiz equilibration); an f64-on-TPU number is also printed
for the reference-accuracy configuration when feasible.

Baseline: the reference publishes no absolute numbers in-tree
(BASELINE.md) and cannot be built here (no Eigen in the image). We use
the documented external proxqp_benchmark scale for dense n=100 QPs on one
modern CPU core at high accuracy: ~1.5e-4 s/QP (README.md:131-147 chart
scale). vs_baseline = baseline_per_qp / our_per_qp (>1 means faster than
one ProxQP CPU core per chip).
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_PER_QP_S = 1.5e-4  # ProxQP dense n=100 on 1 CPU core (estimate)


def build_batch(B, n, n_eq, n_in, dtype, seed=0):
    from proxsuite_tpu.utils.random_qp import dense_strongly_convex_qp
    qps = [dense_strongly_convex_qp(n, n_eq, n_in, seed=seed + i,
                                    sparsity=0.15, dtype=np.float64)
           for i in range(B)]
    st = lambda f: jnp.asarray(np.stack([np.asarray(f(q)) for q in qps]), dtype)
    return qps, (st(lambda q: q.H), st(lambda q: q.g), st(lambda q: q.A),
                 st(lambda q: q.b), st(lambda q: q.C), st(lambda q: q.u),
                 st(lambda q: q.l))


def run(B=1024, n=100, n_eq=50, n_in=50, dtype=jnp.float32, eps=1e-4,
        iters=3):
    from proxsuite_tpu.parallel.batch import _solve_batch_jit
    from proxsuite_tpu.types import ProblemSpec, Settings

    spec = ProblemSpec(n=n, n_eq=n_eq, n_in=n_in)
    settings = Settings(eps_abs=eps)
    qps, (H, g, A, b, C, u, l) = build_batch(B, n, n_eq, n_in, dtype)
    zb = jnp.zeros((B, 0), dtype)

    args = (H, g, A, b, C, u, l, zb, zb)
    res = _solve_batch_jit(spec, settings, *args)  # compile + warm
    jax.block_until_ready(res)
    solved = int(jnp.sum(res.info.status == 0))

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        res = _solve_batch_jit(spec, settings, *args)
        jax.block_until_ready(res)
        times.append(time.perf_counter() - t0)
    t = min(times)
    return t, solved, res


def main():
    t, solved, res = run()
    B = 1024
    qps_per_sec = B / t
    per_qp = t / B
    out = {
        "metric": "batched dense QP (n=100,n_eq=n_in=50,f32,eps=1e-4) QPs/sec/chip",
        "value": round(qps_per_sec, 1),
        "unit": "QPs/sec",
        "vs_baseline": round((BASELINE_PER_QP_S / per_qp), 3),
        "solved": solved,
        "batch": B,
        "sec_per_batch": round(t, 4),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
