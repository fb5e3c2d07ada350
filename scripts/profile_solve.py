"""Per-stage profile of the headline batched solve (VERDICT r3 ask #2).

Times each stage of one Newton iteration IN ISOLATION, jitted and
vmapped at the headline config (B=1024, n=100, n_eq=n_in=50, f32), on
whatever device JAX selects (the real chip under axon, CPU otherwise),
then compares their sum against the measured full-solve per-iteration
time. The gap between sum-of-stages and the full iteration is the
launch/fusion/while-loop overhead XLA adds when the stages are chained
inside `lax.while_loop` — that gap is the MFU story, so it is printed,
not hidden. Output: a markdown table for docs/4-performance.md plus one
JSON line for machine consumption.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from proxsuite_tpu.utils.compile_cache import enable_compile_cache

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def time_fn(fn, *args, iters=20):
    """min wall time of fn(*args) with a host sync, after one warm call."""
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    on_tpu = "cpu" not in str(jax.devices()[0]).lower()
    cache = ".jax_compile_cache_tpu" if on_tpu else ".jax_compile_cache"
    enable_compile_cache(os.path.join(REPO, cache), per_machine=not on_tpu)

    from proxsuite_tpu.ops import kkt
    from proxsuite_tpu.ops.residuals import (ScaledQP, global_dual_residual,
                                             global_primal_residual)
    from proxsuite_tpu.parallel.batch import _solve_batch_jit
    from proxsuite_tpu.types import ProblemSpec, Settings
    from scripts.make_bench_qps import B_UNIQUE, generate

    B, n, n_eq, n_in = 1024, 100, 50, 50
    dtype = jnp.float32
    spec = ProblemSpec(n=n, n_eq=n_eq, n_in=n_in)
    settings = Settings(eps_abs=1e-4, max_iter=200, max_iter_in=200,
                        inner_stall_iters=20)

    qps = generate()
    reps = -(-B // B_UNIQUE)
    st = lambda f: jnp.asarray(np.tile(
        np.stack([np.asarray(f(q), np.float64) for q in qps]),
        (reps,) + (1,) * (np.asarray(f(qps[0])).ndim)), dtype)[:B]
    H, g = st(lambda q: q.H), st(lambda q: q.g)
    A, b = st(lambda q: q.A), st(lambda q: q.b)
    C, u, l = st(lambda q: q.C), st(lambda q: q.u), st(lambda q: q.l)
    zb = jnp.zeros((B, 0), dtype)

    # ---- full solve: per-QP ms and mean iteration count ----
    full = lambda gg: _solve_batch_jit(spec, settings, H, gg, A, b, C, u, l,
                                       zb, zb)
    res = full(g)
    mean_iter = float(jnp.mean(res.info.iter))
    t_full = time_fn(lambda gg: full(gg).x, g + 1e-5, iters=10)
    per_iter_ms = 1e3 * t_full / max(mean_iter, 1.0)

    # ---- stage inputs (representative mid-solve state) ----
    rho = jnp.asarray(1e-6, dtype)
    mu_eq = jnp.asarray(1e-3, dtype)
    mu_in = jnp.asarray(1e-1, dtype)
    rng = np.random.default_rng(0)
    mask = jnp.asarray(rng.random((B, n_in)) < 0.5)
    x = jnp.asarray(rng.standard_normal((B, n)), dtype)
    y = jnp.asarray(rng.standard_normal((B, n_eq)), dtype)
    z = jnp.asarray(rng.standard_normal((B, n_in)), dtype)
    r1, r2, r3 = -g, b, jnp.zeros((B, n_in), dtype)

    hp = jax.default_matmul_precision

    @jax.jit
    def stage_factorize(H, A, C):
        with hp("highest"):
            return jax.vmap(
                lambda h, a, c: kkt.factorize(
                    spec, kkt.KKTOperand(H=h, A=a, C=c), rho))(H, A, C)

    f = stage_factorize(H, A, C)

    @jax.jit
    def stage_newton_build(f, mask):
        with hp("highest"):
            return jax.vmap(
                lambda fi, mk: kkt.build_newton_system(
                    spec, fi, mk, mu_eq, mu_in))(f, mask)

    sysb = stage_newton_build(f, mask)

    @jax.jit
    def stage_kkt_solve_refine(f, sysb, H, A, C, r1, r2, r3):
        with hp("highest"):
            def one(fi, si, h, a, c, q1, q2, q3):
                op = kkt.KKTOperand(H=h, A=a, C=c)
                return kkt.solve_with_refinement(
                    spec, settings, fi, op, si, rho, q1, q2, q3,
                    jnp.asarray(1e-6, dtype))[:3]
            return jax.vmap(one)(f, sysb, H, A, C, r1, r2, r3)

    dxyz = stage_kkt_solve_refine(f, sysb, H, A, C, r1, r2, r3)
    dx, dy, dz = dxyz

    from proxsuite_tpu.ops.linesearch import (LinesearchOperand,
                                              primal_dual_linesearch)

    @jax.jit
    def stage_linesearch(H, A, C, g, b, x, y, z, dx, dy, dz, u, l):
        """Directional matvecs + exact linesearch, as in the inner body."""
        with hp("highest"):
            def one(h, a, c, gg, bb, xx, yy, zz, ddx, ddy, ddz, uu, ll):
                Hdx = h @ ddx
                Adx = a @ ddx
                Cdx = c @ ddx
                Cx = c @ xx
                o = LinesearchOperand(
                    x=xx, x_prev=xx, y=yy, z=zz,
                    se=a @ xx - bb, ru=Cx - uu + mu_in * zz,
                    rl=Cx - ll + mu_in * zz, g=gg,
                    dx=ddx, dy=ddy, dz=ddz,
                    Hdx=Hdx, Adx=Adx, Cdx=Cdx,
                    rho=rho, mu_eq=mu_eq, mu_in=mu_in)
                return primal_dual_linesearch(settings, o)
            return jax.vmap(one)(H, A, C, g, b, x, y, z, dx, dy, dz, u, l)

    ls_ok = True

    scaled = ScaledQP(
        H=H[0], g=g[0], A=A[0], b=b[0], C=C[0], u=u[0], l=l[0],
        u_orig=u[0], l_orig=l[0],
        delta_x=jnp.ones((n,), dtype), delta_y=jnp.ones((n_eq,), dtype),
        delta_z=jnp.ones((n_in,), dtype), c=jnp.asarray(1.0, dtype))

    @jax.jit
    def stage_residuals(H, g, A, b, C, u, l, x, y, z, mask):
        with hp("highest"):
            def one(h, gg, a, bb, c, uu, ll, xx, yy, zz, mk):
                qp = scaled._replace(H=h, g=gg, A=a, b=bb, C=c, u=uu, l=ll,
                                     u_orig=uu, l_orig=ll)
                pr = global_primal_residual(
                    spec, settings, qp, xx, jnp.asarray(False))
                dr = global_dual_residual(spec, settings, qp, xx, yy, zz,
                                          mk, mk)
                return pr.pri_lhs, dr.dua_lhs
            return jax.vmap(one)(H, g, A, b, C, u, l, x, y, z, mask)

    stages = {
        "factorize P + Gram blocks (per solve)":
            time_fn(stage_factorize, H, A, C),
        "Schur assemble + masked chol (per Newton step)":
            time_fn(stage_newton_build, f, mask),
        "KKT solve + refinement (per Newton step)":
            time_fn(stage_kkt_solve_refine, f, sysb, H, A, C, r1, r2, r3),
        "residuals pri+dua (per outer iter)":
            time_fn(stage_residuals, H, g, A, b, C, u, l, x, y, z, mask),
    }
    if ls_ok:
        stages["directional matvecs + exact linesearch (per Newton step)"] = \
            time_fn(stage_linesearch, H, A, C, g, b, x, y, z, dx, dy, dz,
                    u, l)

    print(f"device: {jax.devices()[0]}")
    print(f"full solve: {1e3 * t_full:.2f} ms/batch, mean_iter={mean_iter:.1f}"
          f" -> {per_iter_ms:.3f} ms per iteration (B={B})")
    print()
    print("| stage (isolated, jitted, B=1024) | ms | % of one iteration |")
    print("|---|---|---|")
    total = 0.0
    for name, t in stages.items():
        print(f"| {name} | {1e3 * t:.3f} | {100 * 1e3 * t / per_iter_ms:.0f}% |")
        total += t
    print(f"| sum of stages | {1e3 * total:.3f} | "
          f"{100 * 1e3 * total / per_iter_ms:.0f}% |")
    print()
    print("The shortfall between the stage sum and the measured iteration is "
          "while-loop sequencing + fusion-boundary overhead.")
    print(json.dumps({
        "device": str(jax.devices()[0]), "B": B,
        "full_ms_per_batch": round(1e3 * t_full, 3),
        "mean_iter": round(mean_iter, 2),
        "ms_per_iter": round(per_iter_ms, 4),
        "stages_ms": {k: round(1e3 * v, 4) for k, v in stages.items()},
    }))


if __name__ == "__main__":
    main()
