"""Fast-path benchmarks: LP vs dense-Hessian, diagonal vs dense, box vs
C-encoded box — counterparts of the reference benchmark programs
(benchmark/timings-lp.cpp, timings-diagonal-hessian.cpp,
timings-box-constraints.cpp).

Run on TPU (default) or CPU (JAX_PLATFORMS=cpu). Prints one JSON line per
comparison with the speedup of the specialized path.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args, reps=3):
    out = fn(*args)
    best = float("inf")
    for k in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = int(jnp.sum(out.info.iter))  # host read = sync
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    from proxsuite_tpu.parallel.batch import _solve_batch_jit
    from proxsuite_tpu.types import HessianType, ProblemSpec, Settings
    from proxsuite_tpu.utils.random_qp import (
        dense_box_constrained_qp,
        dense_lp,
        dense_strongly_convex_qp,
    )

    dtype = jnp.float32
    B = 256
    eps = 1e-4
    results = {}

    def batchify(qps, box=False):
        st = lambda f: jnp.asarray(
            np.stack([np.asarray(f(q)) for q in qps]), dtype)
        out = [st(lambda q: q.H), st(lambda q: q.g), st(lambda q: q.A),
               st(lambda q: q.b), st(lambda q: q.C), st(lambda q: q.u),
               st(lambda q: q.l)]
        if box:
            out += [st(lambda q: q.u_box), st(lambda q: q.l_box)]
        else:
            out += [jnp.zeros((B, 0), dtype), jnp.zeros((B, 0), dtype)]
        return tuple(out)

    # --- LP fast path (timings-lp.cpp) ---
    n, n_eq, n_in = 64, 16, 96
    lps = [dense_lp(n, n_eq, n_in - n, seed=s) for s in range(B)]
    args = batchify(lps)
    st = Settings(eps_abs=eps, max_iter=200, max_iter_in=200)
    spec_zero = ProblemSpec(n=n, n_eq=n_eq, n_in=args[4].shape[1],
                            hessian_type=HessianType.Zero)
    spec_dense = ProblemSpec(n=n, n_eq=n_eq, n_in=args[4].shape[1])
    t_zero, r0 = timed(lambda *a: _solve_batch_jit(spec_zero, st, *a), *args)
    t_dense, r1 = timed(lambda *a: _solve_batch_jit(spec_dense, st, *a), *args)
    results["lp_zero_vs_dense_speedup"] = round(t_dense / t_zero, 2)
    results["lp_solved"] = int(jnp.sum(r0.info.status == 0))

    # --- diagonal Hessian fast path (timings-diagonal-hessian.cpp) ---
    qps = [dense_strongly_convex_qp(n, n_eq, 32, seed=s) for s in range(B)]
    rng = np.random.default_rng(0)
    qps = [q._replace(H=np.diag(rng.random(n) + 0.5)) for q in qps]
    args = batchify(qps)
    spec_diag = ProblemSpec(n=n, n_eq=n_eq, n_in=32,
                            hessian_type=HessianType.Diagonal)
    spec_d = ProblemSpec(n=n, n_eq=n_eq, n_in=32)
    t_diag, rd = timed(lambda *a: _solve_batch_jit(spec_diag, st, *a), *args)
    t_full, _ = timed(lambda *a: _solve_batch_jit(spec_d, st, *a), *args)
    results["diag_vs_dense_speedup"] = round(t_full / t_diag, 2)
    results["diag_solved"] = int(jnp.sum(rd.info.status == 0))

    # --- box fast path vs box encoded in C (timings-box-constraints.cpp) ---
    bqs = [dense_box_constrained_qp(n, n_eq, 32, seed=s) for s in range(B)]
    args_box = batchify(bqs, box=True)
    spec_box = ProblemSpec(n=n, n_eq=n_eq, n_in=32, box_constraints=True)
    enc = [q._replace(C=np.vstack([q.C, np.eye(n)]),
                      u=np.concatenate([q.u, q.u_box]),
                      l=np.concatenate([q.l, q.l_box]),
                      u_box=None, l_box=None) for q in bqs]
    args_enc = batchify(enc)
    spec_enc = ProblemSpec(n=n, n_eq=n_eq, n_in=32 + n)
    t_box, rb = timed(lambda *a: _solve_batch_jit(spec_box, st, *a), *args_box)
    t_enc, _ = timed(lambda *a: _solve_batch_jit(spec_enc, st, *a), *args_enc)
    results["box_api_vs_encoded_speedup"] = round(t_enc / t_box, 2)
    results["box_solved"] = int(jnp.sum(rb.info.status == 0))

    results["device"] = str(jax.devices()[0])
    print(json.dumps(results))


if __name__ == "__main__":
    main()
