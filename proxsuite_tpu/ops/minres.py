"""MINRES for symmetric (indefinite) systems, fixed-shape JAX.

TPU-native counterpart of the reference's matrix-free KKT path: the sparse
backend falls back to Eigen MINRES over an AugmentedKkt operator when the
factor would be too large (/root/reference/include/proxsuite/proxqp/sparse/
workspace.hpp:140-147,318 and utils.hpp:288-330). Here MINRES (standard
Paige-Saunders Lanczos + Givens recurrence) is a `lax.while_loop`, so it
jits, vmaps and runs entirely on-device; the operator is a closure of
matvecs (MXU work for dense-blocked data).
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class _MinresState(NamedTuple):
    x: jax.Array
    r1: jax.Array       # unnormalized Lanczos vector k-1
    r2: jax.Array       # unnormalized Lanczos vector k
    w1: jax.Array       # update direction k-2
    w2: jax.Array       # update direction k-1
    oldb: jax.Array
    beta: jax.Array
    dbar: jax.Array
    epsln: jax.Array
    phibar: jax.Array   # residual norm estimate
    cs: jax.Array
    sn: jax.Array
    it: jax.Array


def minres(
    matvec: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    x0: jax.Array | None = None,
    *,
    tol: jax.Array | float = 1e-12,
    max_iter: int = 200,
):
    """Solve A x = b with A symmetric (possibly indefinite).

    Returns (x, final_residual_norm_estimate, iterations).
    """
    dtype = b.dtype
    n = b.shape[0]
    if n == 0:
        return b, jnp.asarray(0.0, dtype), jnp.asarray(0, jnp.int32)
    tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
    x0 = jnp.zeros_like(b) if x0 is None else x0
    r0 = b - matvec(x0)
    beta0 = jnp.linalg.norm(r0)
    tol_abs = tol * jnp.maximum(jnp.linalg.norm(b), tiny)

    init = _MinresState(
        x=x0,
        r1=jnp.zeros_like(b),
        r2=r0,
        w1=jnp.zeros_like(b),
        w2=jnp.zeros_like(b),
        oldb=jnp.asarray(1.0, dtype),   # guarded by r1 == 0 on first step
        beta=beta0,
        dbar=jnp.asarray(0.0, dtype),
        epsln=jnp.asarray(0.0, dtype),
        phibar=beta0,
        cs=jnp.asarray(-1.0, dtype),
        sn=jnp.asarray(0.0, dtype),
        it=jnp.asarray(0, jnp.int32),
    )

    def cond(st: _MinresState):
        return jnp.logical_and(st.phibar > tol_abs, st.it < max_iter)

    def body(st: _MinresState):
        safe_beta = jnp.maximum(st.beta, tiny)
        v = st.r2 / safe_beta
        y = matvec(v)
        y = y - (st.beta / st.oldb) * st.r1      # r1 = 0 on the first step
        alfa = v @ y
        y = y - (alfa / safe_beta) * st.r2

        r1, r2 = st.r2, y
        oldb, beta = st.beta, jnp.linalg.norm(y)

        oldeps = st.epsln
        delta = st.cs * st.dbar + st.sn * alfa
        gbar = st.sn * st.dbar - st.cs * alfa
        epsln = st.sn * beta
        dbar = -st.cs * beta

        gamma = jnp.maximum(jnp.sqrt(gbar * gbar + beta * beta), tiny)
        cs = gbar / gamma
        sn = beta / gamma
        phi = cs * st.phibar
        phibar = sn * st.phibar

        w = (v - oldeps * st.w1 - delta * st.w2) / gamma
        x = st.x + phi * w

        return _MinresState(
            x=x, r1=r1, r2=r2, w1=st.w2, w2=w,
            oldb=jnp.maximum(oldb, tiny), beta=beta,
            dbar=dbar, epsln=epsln, phibar=phibar,
            cs=cs, sn=sn, it=st.it + 1)

    fin = lax.while_loop(cond, body, init)
    return fin.x, fin.phibar, fin.it
