"""In-loop primitive costs: scan K reps inside one jit, subtract overhead."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

K = 50


def timeit_scan(step, init, iters=3):
    @jax.jit
    def run(init):
        out = lax.scan(lambda c, _: (step(c), None), init, None, length=K)[0]
        return jnp.sum(jax.tree.leaves(out)[0][..., -1])
    _ = float(run(init))
    ts = []
    for _k in range(iters):
        t0 = time.perf_counter()
        _ = float(run(init))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    B, n, m = 1024, 104, 104
    key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (B, m, n), jnp.float32)
    S = X @ jnp.swapaxes(X, -1, -2) + 10.0 * jnp.eye(m, dtype=jnp.float32)
    r = jax.random.normal(key, (B, m), jnp.float32)

    base = timeit_scan(lambda c: c + 1.0, r)
    print(f"noop scan x{K}: {base*1e3:.1f} ms")

    def chol_step(c):
        Lc = jnp.linalg.cholesky(S + 1e-9 * c[..., None])
        return Lc[..., 0]
    t = timeit_scan(chol_step, r)
    print(f"cholesky {B}x{m}: {(t-base)/K*1e3:.2f} ms/iter")

    L = jnp.linalg.cholesky(S)

    def tri_step(c):
        y = lax.linalg.triangular_solve(L, c[..., None], left_side=True,
                                        lower=True)[..., 0]
        return y / jnp.maximum(jnp.max(jnp.abs(y)), 1.0)
    t = timeit_scan(tri_step, r)
    print(f"trisolve {B}x{m}: {(t-base)/K*1e3:.2f} ms/iter")

    def mm_step(c):
        y = jnp.einsum("bij,bj->bi", S, c)
        return y / jnp.maximum(jnp.max(jnp.abs(y)), 1.0)
    t = timeit_scan(mm_step, r)
    print(f"matvec {B}x{m}: {(t-base)/K*1e3:.2f} ms/iter")

    def sort_step(c):
        y = jnp.sort(c, axis=-1)
        return y + 1e-6
    t = timeit_scan(sort_step, r)
    print(f"sort {B}x{m}: {(t-base)/K*1e3:.2f} ms/iter")

    def cholsolve_step(c):
        Lc = jnp.linalg.cholesky(S)
        y = lax.linalg.triangular_solve(Lc, c[..., None], left_side=True,
                                        lower=True)
        z = lax.linalg.triangular_solve(Lc, y, left_side=True, lower=True,
                                        transpose_a=True)[..., 0]
        return z / jnp.maximum(jnp.max(jnp.abs(z)), 1.0)
    t = timeit_scan(cholsolve_step, r)
    print(f"chol+2solve {B}x{m}: {(t-base)/K*1e3:.2f} ms/iter")

    # bf16 matmul B x n x n for comparison
    Sb = S.astype(jnp.bfloat16)
    def mmfull_step(c):
        Y = S @ S * (1e-6 * c[0, 0] + 1.0)
        return Y[..., 0] * 1e-6
    t = timeit_scan(mmfull_step, r)
    print(f"matmul {B}x{m}x{m} f32: {(t-base)/K*1e3:.2f} ms/iter")


if __name__ == "__main__":
    main()
