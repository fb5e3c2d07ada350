"""Run the <=1000 Maros-Meszaros subset end-to-end, one line per problem.

The reference correctness contract (test/src/dense_maros_meszaros.cpp:
107-168): every problem with n, n_eq+n_in <= 1000 solves at eps_abs=2e-8
with KKT residuals < 2*eps (checked in f64 on host with the independent
oracle), then warm-resolves in 0 iterations.

Modes:
  default   : CPU, f64, eps=2e-8  (the reference contract)
  --tpu     : real TPU chip, f32 + high_accuracy (double-float pipeline),
              eps=1e-6 (BASELINE.md north star accuracy on TPU)
  --sparse  : CPU, f64, eps=2e-8 through the SPARSE API (matrix-free
              MINRES backend, problems stay scipy CSC/BCOO end-to-end;
              reference counterpart test/src/sparse_maros_meszaros.cpp)
Writes a JSON artifact (--out) consumed as a bench artifact.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--sparse", action="store_true",
                    help="run through the sparse API (matrix-free backend)")
    ap.add_argument("--eps", type=float, default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--max", type=int, default=None, help="limit #problems")
    ap.add_argument("--start", type=int, default=0)
    args = ap.parse_args()

    import jax
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from proxsuite_tpu.utils.compile_cache import enable_compile_cache
    if not args.tpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        # CPU AOT caches are machine-keyed (see utils/compile_cache.py)
        enable_compile_cache(os.path.join(repo, ".jax_compile_cache"),
                             per_machine=True)
    else:
        enable_compile_cache(os.path.join(repo, ".jax_compile_cache_tpu"))

    import numpy as np
    import proxsuite_tpu as pt
    from proxsuite_tpu.types import InitialGuess, SparseBackend
    from proxsuite_tpu.utils.maros_meszaros import (load_preprocessed,
                                                    load_sparse,
                                                    pad_sparse_qp,
                                                    problems_within)
    from proxsuite_tpu.utils.random_qp import kkt_residuals

    eps = args.eps or (1e-6 if args.tpu else 2e-8)
    # inner_stall_iters: a stalled inner Newton loop (e.g. the Schur
    # backend on vanishing-H-diagonal problems) breaks after 50
    # non-improving iterations instead of burning max_iter_in=1500, so
    # the wrapper's primaldual fallback engages in minutes, not hours
    if args.tpu:
        # kkt_backend pinned to primaldual: the reference's own default
        # dense backend (dense_backend_choice -> PrimalDualLDLT,
        # dense/wrapper.hpp:82-113) and the conditioning-robust choice for
        # single hard corpus QPs; it also keeps the run to ONE compiled
        # program per shape (the automatic schur->primaldual->rho-retry
        # chain would jit up to 3). The batched throughput path keeps the
        # masked-Schur backend.
        settings = pt.Settings(eps_abs=eps, eps_rel=0.0, max_iter=1000,
                               high_accuracy=True, inner_stall_iters=50,
                               kkt_backend="primaldual",
                               eps_primal_inf=1e-12, eps_dual_inf=1e-12)
        dtype = np.float32
    else:
        settings = pt.Settings(eps_abs=eps, eps_rel=0.0,
                               inner_stall_iters=50,
                               eps_primal_inf=1e-12, eps_dual_inf=1e-12)
        dtype = np.float64

    names = problems_within(1000, 1000)[args.start:]
    if args.max:
        names = names[: args.max]
    print(f"{len(names)} problems, eps={eps:g}, "
          f"device={jax.devices()[0]}", flush=True)

    if args.tpu:
        # The axon TPU worker can take minutes to come back after a prior
        # process fault; the first op then raises UNAVAILABLE. Warm up
        # with retries so a slow worker restart doesn't poison the run.
        import jax.numpy as jnp
        for attempt in range(6):
            try:
                t0 = time.perf_counter()
                x = jnp.ones((128, 128))
                jax.block_until_ready(x @ x)
                print(f"TPU warmup ok ({time.perf_counter() - t0:.0f}s)",
                      flush=True)
                break
            except Exception as e:  # noqa: BLE001
                print(f"TPU warmup attempt {attempt + 1} failed: "
                      f"{str(e)[:80]}; retrying in 60s", flush=True)
                time.sleep(60)
        else:
            print("ABORT: TPU never became healthy", flush=True)
            sys.exit(2)

    results = []
    n_pass = 0
    t_total = 0.0
    for name in names:
        if args.sparse:
            Hs, gs, As, bs, Cs, us, ls = load_sparse(name)
            n, n_eq, n_in = Hs.shape[0], As.shape[0], Cs.shape[0]
        else:
            # TPU: coarse shape buckets (8 unique shapes over the corpus
            # instead of 33) -- each unique shape costs a multi-minute XLA
            # jit on this host, and the neutral padding keeps the solution
            # set identical (utils/maros_meszaros.py pad_qp docstring)
            buckets = (128, 512, 1024) if args.tpu else None
            orig, padded, dims = load_preprocessed(
                name, **({"buckets": buckets} if buckets else {}))
            n, n_eq, n_in = dims
        backend_used = None
        try:
            if args.sparse:
                Hp, gp, Ap, bp, Cp, up, lp = pad_sparse_qp(
                    Hs, gs, As, bs, Cs, us, ls)
                min_eig = float(np.linalg.eigvalsh(
                    Hs.toarray().astype(np.float64)).min())
                from proxsuite_tpu import sparse as pt_sparse
                from proxsuite_tpu.api import default_rho_for
                from proxsuite_tpu.types import ProblemSpec
                # budgeted matrix-free attempt: the MINRES path at 2e-8 is
                # open-ended on the handful of ill-conditioned corpus
                # problems (QCAPRI ran >80 min: up to max_iter_in inner
                # Newton steps per outer, each a 2(n+m)-iteration MINRES).
                # Bound the attempt; on MAX_ITER fall back to the
                # SparseCholesky backend (densify+Schur -- what the
                # Automatic policy picks for every <=1000-dim problem
                # anyway, sparse.py:50) and RECORD which backend produced
                # the result.
                # Tight budget (round-5 finding): an ill-conditioned
                # problem (QCAPRI) can burn HOURS inside a nominally
                # "bounded" attempt -- each inner Newton step is up to
                # (1 + nb_iterative_refinement) full MINRES solves of
                # 2(n+m) matvecs, so the budget must bound outer x inner
                # x refinement together. Problems the matrix-free path
                # genuinely solves at 2e-8 finish well inside this
                # (all 36 observed passes: <= 131 total inner iters).
                mf_settings = settings.replace(
                    sparse_backend=SparseBackend.MatrixFree,
                    max_iter=60, max_iter_in=60, inner_stall_iters=15,
                    nb_iterative_refinement=3)
                qp = pt_sparse.QP(
                    Hp.shape[0], Ap.shape[0], Cp.shape[0],
                    settings=mf_settings)
                rho = None
                if min_eig < 0:
                    # nonconvex support through the sparse kw path
                    rho = default_rho_for(
                        ProblemSpec(n=Hp.shape[0], n_eq=Ap.shape[0],
                                    n_in=Cp.shape[0]),
                        settings, np.float64) + abs(min_eig)
                qp.init(H=Hp, g=gp, A=Ap, b=bp, C=Cp, l=lp, u=up, rho=rho)
            else:
                # nonconvex support (reference helpers.hpp:174-189 +
                # examples/cpp/estimate_nonconvex_eigenvalue.cpp): slightly
                # indefinite corpus Hessians (e.g. VALUES, min eig -1.3e-5)
                # need rho > |min eig| for the Cholesky-based TPU backends
                min_eig = float(np.linalg.eigvalsh(
                    np.asarray(padded.H, np.float64)).min())
                qp = pt.QP(padded.H.shape[0], padded.A.shape[0],
                           padded.C.shape[0], settings=settings, dtype=dtype)
                qp.init(H=padded.H, g=padded.g, A=padded.A, b=padded.b,
                        C=padded.C, l=padded.l, u=padded.u,
                        manual_minimal_H_eigenvalue=(
                            min_eig if min_eig < 0 else None))
            # The axon TPU worker can crash mid-run ("UNAVAILABLE: TPU
            # worker process crashed or restarted") and come back after a
            # couple of minutes; retry instead of burning the rest of the
            # corpus as instant failures.
            def _solve_once():
                if not args.tpu:
                    return qp.solve(), None
                # CHUNKED solve (round-5 finding): the axon runtime kills
                # the worker when a single device execution runs too long
                # (QCAPRI/QE226/QFORPLAN: thousands of f32 inner
                # iterations in ONE while_loop program -> reproducible
                # "worker crashed"). Bound each call to `chunk` OUTER
                # iterations and continue across calls with a warm start,
                # carrying mu so the BCL schedule doesn't restart. The
                # rho ladder is off (factor_df covers conditioning; a
                # per-chunk MAX_ITER would otherwise trigger 2 wasted
                # full re-solves per chunk).
                # Per-call work bound: max_iter AND max_iter_in together
                # cap one device execution at ~chunk*max_iter_in inner
                # iterations (~1 min at the largest shapes). Longest
                # observed-good single execution on this worker is ~75s;
                # unbounded QCAPRI-class executions reproducibly kill it.
                chunk, total_outer = 6, 1080
                base = qp.settings.replace(max_iter=chunk, max_iter_in=30,
                                           inner_stall_iters=15,
                                           rho_retry_ladder=False)
                qp.settings = base
                r = qp.solve()
                iters = int(r.info.iter)
                max_it = int(pt.QPSolverOutput.PROXQP_MAX_ITER_REACHED)
                n_more = total_outer // chunk - 1
                for _ in range(n_more):
                    if int(r.info.status) != max_it:
                        break
                    qp._mu_eq = float(r.info.mu_eq)
                    qp._mu_in = float(r.info.mu_in)
                    qp.settings = base.replace(
                        initial_guess=InitialGuess.WARM_START_WITH_PREVIOUS_RESULT)
                    r = qp.solve()
                    iters += int(r.info.iter)
                return r, iters

            for attempt in range(4):
                try:
                    t0 = time.perf_counter()
                    res, chunked_iters = _solve_once()
                    jax.block_until_ready(res.x)
                    t = time.perf_counter() - t0
                    break
                except Exception as e:  # noqa: BLE001
                    if "UNAVAILABLE" not in str(e) or attempt == 3:
                        raise
                    print(f"  TPU worker unavailable on {name} "
                          f"(attempt {attempt + 1}); waiting 120s",
                          flush=True)
                    time.sleep(120)
            backend_used = None
            if args.sparse:
                backend_used = "matrixfree"
                if int(res.info.status) != 0:
                    # SparseCholesky fallback (recorded per problem)
                    from proxsuite_tpu import sparse as pt_sparse
                    qp = pt_sparse.QP(
                        Hp.shape[0], Ap.shape[0], Cp.shape[0],
                        settings=settings.replace(
                            sparse_backend=SparseBackend.SparseCholesky))
                    qp.init(H=Hp, g=gp, A=Ap, b=bp, C=Cp, l=lp, u=up,
                            rho=rho)
                    t0 = time.perf_counter()
                    res = qp.solve()
                    jax.block_until_ready(res.x)
                    t = time.perf_counter() - t0
                    backend_used = "sparse_cholesky_fallback"
            x = res.x_full()[:n]
            y = res.y_full()[:n_eq]
            z = res.z_full()[:n_in]
            if args.sparse:
                pri = max(
                    float(np.abs(As @ x - bs).max()) if n_eq else 0.0,
                    float(np.maximum(Cs @ x - us, 0).max()) if n_in else 0.0,
                    float(np.maximum(ls - Cs @ x, 0).max()) if n_in else 0.0)
                dua = float(np.abs(
                    Hs @ x + gs + (As.T @ y if n_eq else 0)
                    + (Cs.T @ z if n_in else 0)).max())
            else:
                pri, dua = kkt_residuals(orig, x, y, z)
            status = int(res.info.status)
            iters = (chunked_iters if chunked_iters is not None
                     else int(res.info.iter))
            # warm resolve (CPU contract only; 0 iterations expected)
            warm_iters = None
            if not args.tpu:
                qp.settings = qp.settings.replace(
                    initial_guess=InitialGuess.WARM_START_WITH_PREVIOUS_RESULT)
                warm_iters = int(qp.solve().info.iter)
            ok = (status == 0 and pri < 2 * eps and dua < 2 * eps
                  and (warm_iters in (None, 0)))
        except Exception as e:  # noqa: BLE001 - record and continue
            ok, status, iters, pri, dua, t, warm_iters = (
                False, -1, 0, float("inf"), float("inf"), 0.0, None)
            print(f"  EXC {name}: {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            # fail fast on a dead device: a TPU worker that stays down
            # poisons every subsequent call, so THREE CONSECUTIVE
            # exceptions (anywhere in the run, not just the prefix) mean
            # the run is garbage, not that the problems are hard
            if (len(results) >= 2
                    and all(r["status"] == -1 for r in results[-2:])):
                print("ABORT: 3 consecutive problems raised - device looks "
                      "dead; rerun when the TPU is healthy", flush=True)
                sys.exit(2)
        n_pass += ok
        t_total += t
        # bool(): the and-chain can return a numpy bool (e.g. a SOLVED row
        # whose external residual fails), which json refuses to serialize
        rec = dict(name=name, n=n, n_eq=n_eq, n_in=n_in, ok=bool(ok),
                   status=status, iter=int(iters), pri=float(pri),
                   dua=float(dua), time_s=round(t, 3),
                   warm_iters=warm_iters)
        if args.sparse:
            rec["backend"] = backend_used
        results.append(rec)
        print(f"{'PASS' if ok else 'FAIL'} {name:10s} n={n:4d} m={n_eq+n_in:4d} "
              f"status={status} iter={iters:4d} pri={pri:.2e} dua={dua:.2e} "
              f"t={t:.2f}s"
              + (f" warm={warm_iters}" if warm_iters is not None else ""),
              flush=True)
        if args.out:
            # incremental artifact: a stalled problem never loses the run
            with open(args.out + ".partial", "w") as f:
                json.dump(results, f)

    summary = dict(
        mode=("tpu_f32_high_accuracy" if args.tpu
              else "cpu_f64_sparse_matrixfree" if args.sparse
              else "cpu_f64"),
        eps_abs=eps, n_problems=len(names), n_pass=n_pass,
        total_solve_s=round(t_total, 2),
        device=str(jax.devices()[0]), problems=results)
    print(f"\n{n_pass}/{len(names)} pass at eps={eps:g} "
          f"(KKT < 2*eps, f64 oracle)", flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
