"""Batched QP solving: vmap on one chip, shard_map across a device mesh.

TPU-native counterpart of the reference OpenMP batch layer
(/root/reference/include/proxsuite/proxqp/parallel/qp_solve.hpp:17-185,
omp.hpp:11-17): there, independent QPs run under
`#pragma omp parallel for schedule(dynamic)`. Here a batch of same-shape
QPs becomes ONE batched XLA program via `jax.vmap` -- every Cholesky,
triangular solve and matvec turns into a batched MXU kernel -- and scales
across chips with `shard_map` over the batch axis of a `jax.sharding.Mesh`
(problems are independent, so there is zero cross-chip communication in the
solve itself; only dispatch/gather, the same reason the reference gets away
with a parallel-for).

Convergence divergence across the batch is handled by the per-lane `done`
flags inside the solver: a batched while_loop runs until every lane of a
chunk converges, finished lanes frozen. `chunk_size` bounds the straggler
effect (and peak memory) for very large batches.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..api import build_scaled_qp, build_scaled_qp_ha, solve_scaled, \
    split_df_host
from ..types import ProblemSpec, Results, Settings


@functools.partial(jax.jit, static_argnums=(0, 1))
def _solve_batch_jit(spec: ProblemSpec, settings: Settings,
                     H, g, A, b, C, u, l, u_box, l_box) -> Results:
    def one(H, g, A, b, C, u, l, u_box, l_box):
        qp = build_scaled_qp(
            spec, settings, H, g, A, b, C, u, l, u_box, l_box,
            execute_preconditioner=settings.compute_preconditioner)
        return solve_scaled(spec, settings, qp)

    return jax.vmap(one)(H, g, A, b, C, u, l, u_box, l_box)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _solve_batch_state_jit(spec: ProblemSpec, settings: Settings,
                           H, g, A, b, C, u, l, u_box, l_box,
                           rho, mu_eq, mu_in, x0, y0, z0) -> Results:
    """Batched solve with PER-LANE proximal parameters and warm starts
    (the reference's parallel loop solves each QP with its own state,
    parallel/qp_solve.hpp:33-60)."""
    def one(H, g, A, b, C, u, l, u_box, l_box, rho, mu_eq, mu_in,
            x0, y0, z0):
        qp = build_scaled_qp(
            spec, settings, H, g, A, b, C, u, l, u_box, l_box,
            execute_preconditioner=settings.compute_preconditioner)
        return solve_scaled(spec, settings, qp, x0, y0, z0,
                            rho=rho, mu_eq=mu_eq, mu_in=mu_in)

    return jax.vmap(one)(H, g, A, b, C, u, l, u_box, l_box,
                         rho, mu_eq, mu_in, x0, y0, z0)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _solve_batch_ha_jit(spec: ProblemSpec, settings: Settings,
                        *parts) -> Results:
    """Batched high-accuracy solve: each lane runs the double-float
    pipeline (api.build_scaled_qp_ha); parts are 18 hi/lo word arrays
    (H,g,A,b,C,u,l,u_box,l_box), each with a leading batch axis."""
    def one(*p):
        qp = build_scaled_qp_ha(spec, settings, *p)
        return solve_scaled(spec, settings, qp)

    return jax.vmap(one)(*parts)


def _batch_arrays(spec: ProblemSpec, H, g, A, b, C, u, l, u_box, l_box, dtype):
    bsz = g.shape[0]
    H = jnp.asarray(H, dtype)
    g = jnp.asarray(g, dtype)
    A = (jnp.zeros((bsz, 0, spec.n), dtype) if A is None
         else jnp.asarray(A, dtype))
    b = (jnp.zeros((bsz, 0), dtype) if b is None else jnp.asarray(b, dtype))
    C = (jnp.zeros((bsz, 0, spec.n), dtype) if C is None
         else jnp.asarray(C, dtype))
    u = (jnp.zeros((bsz, 0), dtype) if u is None else jnp.asarray(u, dtype))
    l = (jnp.zeros((bsz, 0), dtype) if l is None else jnp.asarray(l, dtype))
    if spec.box_constraints:
        u_box = jnp.asarray(u_box, dtype)
        l_box = jnp.asarray(l_box, dtype)
    else:
        u_box = jnp.zeros((bsz, 0), dtype)
        l_box = jnp.zeros((bsz, 0), dtype)
    return H, g, A, b, C, u, l, u_box, l_box


def solve_in_parallel(
    H, g, A=None, b=None, C=None, u=None, l=None,
    u_box=None, l_box=None,
    *,
    settings: Optional[Settings] = None,
    mesh: Optional[Mesh] = None,
    axis_name: str = "batch",
    chunk_size: Optional[int] = None,
    **overrides,
) -> Results:
    """Solve a batch of same-shape dense QPs.

    Arrays are stacked along a leading batch axis. With `mesh`, the batch is
    sharded over `mesh.shape[axis_name]` devices (must divide the batch
    size); without, everything runs on the default device. `chunk_size`
    splits giant batches into sequential chunks to bound memory and
    straggler waste. Counterpart of reference dense::solve_in_parallel
    (parallel/qp_solve.hpp:64-82).
    """
    settings = settings or Settings()
    if overrides:
        settings = settings.replace(**overrides)
    bsz, n = np.shape(g)
    n_eq = 0 if A is None else np.shape(A)[1]
    n_in = 0 if C is None else np.shape(C)[1]
    box = u_box is not None or l_box is not None
    spec = ProblemSpec(n=n, n_eq=n_eq, n_in=n_in, box_constraints=box)

    if settings.high_accuracy:
        # double-float path: ingest f64 host data as (hi, lo) f32 pairs
        nb = n if box else 0
        defaults = dict(H=np.zeros((bsz, n, n)), A=np.zeros((bsz, n_eq, n)),
                        b=np.zeros((bsz, n_eq)), C=np.zeros((bsz, n_in, n)),
                        u=np.full((bsz, n_in), np.inf),
                        l=np.full((bsz, n_in), -np.inf),
                        u_box=np.full((bsz, nb), np.inf),
                        l_box=np.full((bsz, nb), -np.inf))
        parts = []
        for name, val in (("H", H), ("g", g), ("A", A), ("b", b), ("C", C),
                          ("u", u), ("l", l), ("u_box", u_box),
                          ("l_box", l_box)):
            v64 = defaults[name] if val is None else np.asarray(
                val, np.float64)
            hi, lo = split_df_host(v64)
            parts.extend([jnp.asarray(hi), jnp.asarray(lo)])
        if mesh is not None:
            n_dev = mesh.shape[axis_name]
            if bsz % n_dev != 0:
                raise ValueError(
                    f"mesh axis {axis_name}={n_dev} must divide the "
                    f"batch size {bsz}")
            sharding = NamedSharding(mesh, P(axis_name))
            parts = [jax.device_put(p, sharding) for p in parts]
        # .ha_finalized(): deliver combined-f64 x/y/z (types.Results)
        if chunk_size is None or bsz <= chunk_size:
            return _solve_batch_ha_jit(spec, settings, *parts).ha_finalized()
        outs = []
        for lo_i in range(0, bsz, chunk_size):
            chunk = tuple(p[lo_i: lo_i + chunk_size] for p in parts)
            outs.append(_solve_batch_ha_jit(spec, settings, *chunk))
        return jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=0), *outs).ha_finalized()

    g = jnp.asarray(g)
    dtype = g.dtype
    arrays = _batch_arrays(spec, H, g, A, b, C, u, l, u_box, l_box, dtype)

    if mesh is not None:
        n_dev = mesh.shape[axis_name]
        if bsz % n_dev != 0:
            raise ValueError(
                f"mesh axis {axis_name}={n_dev} must divide the "
                f"batch size {bsz}")
        sharding = NamedSharding(mesh, P(axis_name))
        arrays = tuple(jax.device_put(a, sharding) for a in arrays)

    if chunk_size is None or bsz <= chunk_size:
        return _solve_batch_jit(spec, settings, *arrays)

    outs = []
    for lo in range(0, bsz, chunk_size):
        chunk = tuple(a[lo: lo + chunk_size] for a in arrays)
        outs.append(_solve_batch_jit(spec, settings, *chunk))
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _backward_batch_jit(spec, settings, eps_bwd, rho_bwd, mu_bwd,
                        H, g, A, b, C, u, l, u_box, l_box,
                        dL_dx, dL_dy, dL_dz):
    from ..backward import compute_backward

    def one(H, g, A, b, C, u, l, u_box, l_box, gx, gy, gz):
        qp = build_scaled_qp(
            spec, settings, H, g, A, b, C, u, l, u_box, l_box,
            execute_preconditioner=settings.compute_preconditioner)
        res = solve_scaled(spec, settings, qp)
        bd = compute_backward(spec, settings, qp, res.x, res.y, res.z,
                              gx, gy, gz, eps=eps_bwd,
                              rho_backward=rho_bwd, mu_backward=mu_bwd)
        return res, bd

    return jax.vmap(one)(H, g, A, b, C, u, l, u_box, l_box,
                         dL_dx, dL_dy, dL_dz)


def solve_backward_in_parallel(
    H, g, A, b, C, u, l, dL_dx, dL_dy, dL_dz,
    *, settings: Optional[Settings] = None,
    eps_backward: float = 1e-4, rho_backward: float = 1e-6,
    mu_backward: float = 1e-6, **overrides,
):
    """Batched forward solves + adjoint backward passes in one program.

    Counterpart of reference qp_solve_backward_in_parallel
    (parallel/qp_solve.hpp:86-138). Returns (Results, BackwardData), both
    with a leading batch axis.
    """
    settings = settings or Settings()
    if overrides:
        settings = settings.replace(**overrides)
    g = jnp.asarray(g)
    dtype = g.dtype
    bsz, n = g.shape
    spec = ProblemSpec(n=n, n_eq=np.shape(A)[1] if A is not None else 0,
                       n_in=np.shape(C)[1] if C is not None else 0)
    arrays = _batch_arrays(spec, H, g, A, b, C, u, l, None, None, dtype)
    return _backward_batch_jit(
        spec, settings, eps_backward, rho_backward, mu_backward,
        *arrays, jnp.asarray(dL_dx, dtype), jnp.asarray(dL_dy, dtype),
        jnp.asarray(dL_dz, dtype))


def solve_in_parallel_ragged(
    problems,
    *,
    settings: Optional[Settings] = None,
    mesh: Optional[Mesh] = None,
    axis_name: str = "batch",
    dtype=None,
    rho=None, mu_eq=None, mu_in=None,
    warm_starts=None,
    **overrides,
):
    """Solve a batch of dense QPs with ARBITRARY per-QP dims.

    The reference's solve_in_parallel takes a vector of independently
    sized QPs (parallel/qp_solve.hpp:17-60); here each QP is neutrally
    padded to the next shape bucket (utils/padding.py) and each bucket is
    solved as one vmapped program, so a mixed-dims batch costs a handful
    of compiles instead of one per QP.

    problems: sequence of dicts with keys H,g,A,b,C,u,l (optionally
    u_box,l_box); missing/None entries mean "absent" as in solve().
    rho/mu_eq/mu_in: optional per-QP scalars (sequences, same length).
    warm_starts: optional per-QP (x0, y0, z0) tuples (None entries =
    cold start lanes; requires a warm initial_guess setting to be used).
    Returns a list of per-QP Results, sliced back to the original dims,
    in input order.
    """
    from ..types import InitialGuess
    from ..utils.padding import bucket, pad_dense_qp

    settings = settings or Settings()
    if overrides:
        settings = settings.replace(**overrides)
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    problems = list(problems)
    B = len(problems)
    if not B:
        return []

    def dims_of(p):
        n = np.shape(p["g"])[0]
        n_eq = 0 if p.get("A") is None else np.shape(p["A"])[0]
        n_in = 0 if p.get("C") is None else np.shape(p["C"])[0]
        box = p.get("u_box") is not None or p.get("l_box") is not None
        return n, n_eq, n_in, box

    # group problem indices by padded bucket shape; a batch that is
    # already shape-uniform skips padding entirely (no wasted flops)
    metas = [dims_of(p) for p in problems]
    any_box = any(m[3] for m in metas)
    uniform = len({m[:3] for m in metas}) == 1
    groups = {}
    for i, (n, n_eq, n_in, box) in enumerate(metas):
        key = ((n, n_eq, n_in) if uniform
               else (bucket(n), bucket(n_eq), bucket(n_in)))
        groups.setdefault(key, []).append(i)

    results = [None] * B
    warm = settings.initial_guess in (
        InitialGuess.WARM_START,
        InitialGuess.WARM_START_WITH_PREVIOUS_RESULT,
        InitialGuess.COLD_START_WITH_PREVIOUS_RESULT)
    for (n_p, ne_p, ni_p), idxs in groups.items():
        spec = ProblemSpec(n=n_p, n_eq=ne_p, n_in=ni_p,
                           box_constraints=any_box)
        padded = []
        for i in idxs:
            p = problems[i]
            kw = dict(p)
            if any_box and p.get("u_box") is None and p.get("l_box") is None:
                kw["u_box"] = np.full(np.shape(p["g"])[0], np.inf)
            # one-sided inequalities: missing u/l mean +/-inf, exactly as
            # in single-QP solve()
            if kw.get("C") is not None:
                n_in_i = np.shape(kw["C"])[0]
                if kw.get("u") is None:
                    kw["u"] = np.full(n_in_i, np.inf)
                if kw.get("l") is None:
                    kw["l"] = np.full(n_in_i, -np.inf)
            padded.append(pad_dense_qp(
                kw.get("H"), kw["g"], kw.get("A"), kw.get("b"),
                kw.get("C"), kw.get("u"), kw.get("l"),
                kw.get("u_box"), kw.get("l_box"),
                n_pad=n_p, n_eq_pad=ne_p, n_in_pad=ni_p))
        st = lambda k: jnp.asarray(
            np.stack([q[k] for q in padded]), dtype)
        if any_box:
            arrays = (st("H"), st("g"), st("A"), st("b"), st("C"),
                      st("u"), st("l"), st("u_box"), st("l_box"))
        else:
            nb = jnp.zeros((len(idxs), 0), dtype)
            arrays = (st("H"), st("g"), st("A"), st("b"), st("C"),
                      st("u"), st("l"), nb, nb)

        def lane_vals(seq, default):
            if seq is None:
                return jnp.full((len(idxs),), default, dtype)
            return jnp.asarray([default if seq[i] is None else seq[i]
                                for i in idxs], dtype)

        from ..api import default_rho_for
        rho_a = lane_vals(rho, default_rho_for(spec, settings, dtype))
        mu_eq_a = lane_vals(mu_eq, settings.default_mu_eq)
        mu_in_a = lane_vals(mu_in, settings.default_mu_in)

        n_c_p = ni_p + (n_p if any_box else 0)
        x0 = np.zeros((len(idxs), n_p))
        y0 = np.zeros((len(idxs), ne_p))
        z0 = np.zeros((len(idxs), n_c_p))
        if warm and warm_starts is not None:
            for j, i in enumerate(idxs):
                ws = warm_starts[i]
                if ws is None:
                    continue
                wx, wy, wz = ws
                ni, nei, nii = metas[i][0], metas[i][1], metas[i][2]
                if wx is not None:
                    x0[j, :ni] = np.asarray(wx)
                if wy is not None:
                    y0[j, :nei] = np.asarray(wy)
                if wz is not None:
                    wz = np.asarray(wz)
                    z0[j, :min(nii, wz.shape[0])] = wz[:nii]
                    if any_box and wz.shape[0] == nii + ni:
                        z0[j, ni_p: ni_p + ni] = wz[nii:]

        if mesh is not None:
            n_dev = mesh.shape[axis_name]
            if len(idxs) % n_dev != 0:
                raise ValueError(
                    f"mesh axis {axis_name}={n_dev} must divide every "
                    f"shape-bucket group; bucket {(n_p, ne_p, ni_p)} has "
                    f"{len(idxs)} QPs. Pad the batch or regroup.")
            sharding = NamedSharding(mesh, P(axis_name))
            arrays = tuple(jax.device_put(a, sharding) for a in arrays)
        res = _solve_batch_state_jit(
            spec, settings, *arrays, rho_a, mu_eq_a, mu_in_a,
            jnp.asarray(x0, dtype), jnp.asarray(y0, dtype),
            jnp.asarray(z0, dtype))
        for j, i in enumerate(idxs):
            n, n_eq, n_in, box = metas[i]
            lane = jax.tree.map(lambda a, j=j: a[j], res)
            # slice vector outputs back to the original dims; z keeps the
            # [ineq; box] layout of the ORIGINAL problem
            def cut(v, k):
                return None if v is None else v[:k]
            z = lane.z[:n_in]
            z_lo = cut(lane.z_lo, n_in)
            se = lane.se[:n_eq]
            si = lane.si[:n_in]
            if any_box:
                z = jnp.concatenate([z, lane.z[ni_p: ni_p + n]])
                if z_lo is not None:
                    z_lo = jnp.concatenate(
                        [z_lo, lane.z_lo[ni_p: ni_p + n]])
                si = jnp.concatenate([si, lane.si[ni_p: ni_p + n]])
            results[i] = lane._replace(
                x=lane.x[:n], y=lane.y[:n_eq], z=z,
                x_lo=cut(lane.x_lo, n), y_lo=cut(lane.y_lo, n_eq),
                z_lo=z_lo, se=se, si=si).ha_finalized()
    return results


class BatchQP:
    """Arena of same-shape QPs (reference dense::BatchQP,
    wrapper.hpp:1252-1311): accumulate problems, solve them as one batch."""

    def __init__(self, n: int, n_eq: int, n_in: int,
                 box_constraints: bool = False,
                 settings: Optional[Settings] = None,
                 dtype=jnp.float64):
        self.spec = ProblemSpec(n=n, n_eq=n_eq, n_in=n_in,
                                box_constraints=box_constraints)
        self.settings = settings or Settings()
        self.dtype = dtype
        self._problems = []
        self.results: Optional[Results] = None

    def init_qp_in_place(self, H, g, A=None, b=None, C=None, l=None, u=None,
                         l_box=None, u_box=None):
        self._problems.append((H, g, A, b, C, u, l, u_box, l_box))

    def __len__(self):
        return len(self._problems)

    def solve(self, mesh: Optional[Mesh] = None,
              chunk_size: Optional[int] = None) -> Results:
        def stack(idx, zero_shape):
            vals = [p[idx] for p in self._problems]
            if vals[0] is None:
                return np.zeros((len(vals),) + zero_shape)
            return np.stack([np.asarray(v) for v in vals])

        spec = self.spec
        H = stack(0, (spec.n, spec.n))
        g = stack(1, (spec.n,))
        A = stack(2, (spec.n_eq, spec.n))
        b = stack(3, (spec.n_eq,))
        C = stack(4, (spec.n_in, spec.n))
        u = stack(5, (spec.n_in,))
        l = stack(6, (spec.n_in,))
        u_box = stack(7, (spec.n,)) if spec.box_constraints else None
        l_box = stack(8, (spec.n,)) if spec.box_constraints else None
        self.results = solve_in_parallel(
            H, g, A, b, C, u, l, u_box, l_box,
            settings=self.settings, mesh=mesh, chunk_size=chunk_size)
        return self.results
