"""Microbenchmark the primitives on the hot path of the batched solve."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timeit(fn, *args, iters=5):
    # reduce on device so the host read is 4 bytes (the axon tunnel makes
    # large device->host copies dominate otherwise)
    red = jax.jit(lambda *a: jnp.sum(jax.tree.leaves(fn(*a))[0][..., -1]))
    _ = float(red(*args))
    ts = []
    for _k in range(iters):
        t0 = time.perf_counter()
        _ = float(red(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    B, n, m = 1024, 104, 104
    key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (B, m, n), jnp.float32)
    S = X @ jnp.swapaxes(X, -1, -2) + 10.0 * jnp.eye(m, dtype=jnp.float32)
    r = jax.random.normal(key, (B, m), jnp.float32)
    Mn = jax.random.normal(key, (B, n, n), jnp.float32)
    v = jax.random.normal(key, (B, n), jnp.float32)

    chol = jax.jit(jnp.linalg.cholesky)
    t = timeit(chol, S)
    print(f"batched cholesky {B}x{m}x{m}: {t*1e3:.2f} ms")

    L = chol(S)
    tri = jax.jit(lambda L, r: lax.linalg.triangular_solve(
        L, r[..., None], left_side=True, lower=True)[..., 0])
    t = timeit(tri, L, r)
    print(f"batched trisolve {B}x{m}: {t*1e3:.2f} ms")

    mm = jax.jit(lambda A, B_: A @ B_)
    t = timeit(mm, Mn, Mn)
    print(f"batched matmul {B}x{n}x{n}: {t*1e3:.2f} ms")

    mv = jax.jit(lambda A, x: jnp.einsum("bij,bj->bi", A, x))
    t = timeit(mv, Mn, v)
    print(f"batched matvec {B}x{n}: {t*1e3:.2f} ms")

    st = jax.jit(lambda x: jnp.sort(x, axis=-1))
    big = jax.random.normal(key, (B, 2 * m), jnp.float32)
    t = timeit(st, big)
    print(f"batched sort {B}x{2*m}: {t*1e3:.2f} ms")

    # solve via cholesky+2 trisolves vs direct general solve
    def chol_solve(S, r):
        L = jnp.linalg.cholesky(S)
        y = lax.linalg.triangular_solve(L, r[..., None], left_side=True, lower=True)
        z = lax.linalg.triangular_solve(L, y, left_side=True, lower=True,
                                        transpose_a=True)
        return z[..., 0]
    t = timeit(jax.jit(chol_solve), S, r)
    print(f"batched chol_solve {B}x{m}: {t*1e3:.2f} ms")

    # CG: 40 iterations of batched matvec on S
    def cg(S, r):
        def body(carry, _):
            x, p, res, rs = carry
            Ap = jnp.einsum("bij,bj->bi", S, p)
            alpha = rs / jnp.einsum("bi,bi->b", p, Ap)
            x = x + alpha[:, None] * p
            res = res - alpha[:, None] * Ap
            rs_new = jnp.einsum("bi,bi->b", res, res)
            p = res + (rs_new / rs)[:, None] * p
            return (x, p, res, rs_new), None
        x0 = jnp.zeros_like(r)
        rs = jnp.einsum("bi,bi->b", r, r)
        (x, _, _, _), _ = lax.scan(body, (x0, r, r, rs), None, length=40)
        return x
    t = timeit(jax.jit(cg), S, r)
    print(f"batched CG-40 {B}x{m}: {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
