"""Reference-compatible `proxqp.dense` module.

Mirrors the nanobind surface of the reference dense bindings
(/root/reference/bindings/python/src/expose-qpobject.hpp,
expose-solve.hpp, expose-qpvector.hpp, expose-parallel.hpp,
expose-backward.hpp, expose-helpers.hpp): `QP`, stateless `solve`,
`BatchQP`, `solve_in_parallel`, `solve_backward_in_parallel`,
`compute_backward`, `estimate_minimal_eigen_value_of_symmetric_matrix`.
Argument names and order follow the reference (l before u).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from .. import api as _api
from .. import wrapper as _wrapper
from ..parallel import batch as _batch
from ..types import (
    DenseBackend,
    HessianType,
    InitialGuess,
    Results,
    Settings,
)
from ..utils.eigen import (
    estimate_minimal_eigen_value_of_symmetric_matrix,
)
from ._compat import ModelView, MutableSettings, ResultsView

__all__ = [
    "QP",
    "BatchQP",
    "solve",
    "solve_in_parallel",
    "solve_backward_in_parallel",
    "compute_backward",
    "estimate_minimal_eigen_value_of_symmetric_matrix",
]


class QP:
    """Reference-compatible dense QP object (dense/wrapper.hpp:115-996).

    Usage mirrors the reference bindings: construct with dims, assign
    settings attributes, `init(H, g, A, b, C, l, u)`, `solve()`, read
    `results.x`. Compute runs on the TPU-native core (wrapper.py).
    """

    def __init__(self, n: int, n_eq: int, n_in: int,
                 box_constraints: bool = False,
                 dense_backend: DenseBackend = DenseBackend.Automatic,
                 hessian_type: HessianType = HessianType.Dense):
        self.settings = MutableSettings()
        self._box = box_constraints
        self._hessian_type = hessian_type
        self._dense_backend = dense_backend
        self._core = _wrapper.QP(
            n, n_eq, n_in, box_constraints=box_constraints,
            hessian_type=hessian_type)
        self._init_args = None

    # -- lifecycle ----------------------------------------------------
    def init(self, H=None, g=None, A=None, b=None, C=None, l=None, u=None,
             l_box=None, u_box=None, compute_preconditioner: bool = True,
             rho: Optional[float] = None, mu_eq: Optional[float] = None,
             mu_in: Optional[float] = None,
             manual_minimal_H_eigenvalue: Optional[float] = None):
        self._core.settings = self.settings.freeze()
        self._core.init(
            H=H, g=g, A=A, b=b, C=C, l=l, u=u, l_box=l_box, u_box=u_box,
            compute_preconditioner=compute_preconditioner,
            rho=rho, mu_eq=mu_eq, mu_in=mu_in,
            manual_minimal_H_eigenvalue=manual_minimal_H_eigenvalue)
        return self

    def update(self, H=None, g=None, A=None, b=None, C=None, l=None, u=None,
               l_box=None, u_box=None,
               rho: Optional[float] = None, mu_eq: Optional[float] = None,
               mu_in: Optional[float] = None,
               update_preconditioner: bool = False):
        self.settings.update_preconditioner = update_preconditioner
        self._core.settings = self.settings.freeze()
        self._core.update(H=H, g=g, A=A, b=b, C=C, l=l, u=u,
                          l_box=l_box, u_box=u_box,
                          rho=rho, mu_eq=mu_eq, mu_in=mu_in)
        return self

    def solve(self, x=None, y=None, z=None):
        self._core.settings = self.settings.freeze()
        self._core.solve(x=x, y=y, z=z)
        # mirror possible initial_guess switch done by explicit warm start
        self.settings.initial_guess = self._core.settings.initial_guess
        return self.results

    def cleanup(self):
        self._core.cleanup()
        return self

    # -- state views ---------------------------------------------------
    @property
    def results(self) -> ResultsView:
        if self._core.results is None:
            raise RuntimeError("solve() has not been called")
        return ResultsView(self._core.results)

    @property
    def model(self) -> ModelView:
        return ModelView(self)

    def is_box_constrained(self) -> bool:
        return self._box


class BatchQP:
    """Arena of dense QPs (reference dense::BatchQP, wrapper.hpp:1252-1311
    + expose-qpvector.hpp): `init_qp_in_place` returns a QP to fill, the
    batch is solved as one vmapped program by `solve_in_parallel`."""

    def __init__(self, batch_size: int = 0):
        # batch_size is a capacity hint in the reference (the arena
        # pre-reserves storage, wrapper.hpp:1262); lists need no reserve
        self._qps = []

    def init_qp_in_place(self, n: int, n_eq: int, n_in: int) -> QP:
        # per-QP dims are allowed: solve_in_parallel buckets mixed-dims
        # batches via neutral padding (parallel/batch.py)
        qp = QP(n, n_eq, n_in)
        self._qps.append(qp)
        return qp

    def size(self) -> int:
        return len(self._qps)

    def __len__(self):
        return len(self._qps)

    def get(self, i: int) -> QP:
        return self._qps[i]

    def __getitem__(self, i: int) -> QP:
        return self._qps[i]


def solve(H=None, g=None, A=None, b=None, C=None, l=None, u=None,
          x=None, y=None, z=None, **kwargs) -> ResultsView:
    """Stateless dense solve with the reference kwarg surface
    (expose-solve.hpp:17-200 / dense/wrapper.hpp:1000-1233)."""
    res = _api.solve(H=H, g=g, A=A, b=b, C=C, l=l, u=u, x=x, y=y, z=z,
                     **kwargs)
    return ResultsView(res)


def solve_in_parallel(qps, num_threads: Optional[int] = None) -> None:
    """Solve a BatchQP / list of QPs as vmapped TPU programs.

    Reference: proxqp/parallel/qp_solve.hpp:17-82 (OpenMP parallel-for
    over independently-sized, independently-configured QPs). Here each
    QP keeps its OWN proximal parameters (rho/mu overrides from init),
    box bounds, and warm start; heterogeneous dims are solved by
    bucketed neutral padding (parallel/batch.solve_in_parallel_ragged).
    The one per-QP state that cannot vary inside a single compiled
    program is Settings (it is compile-time static), so differing
    settings raise instead of being silently dropped. num_threads is
    accepted for API compatibility and ignored (vmap lanes are the
    parallelism). Results land in each qp.results.
    """
    from ..types import InitialGuess

    items = qps._qps if isinstance(qps, BatchQP) else list(qps)
    if not items:
        raise ValueError("empty batch")
    frozen = [q.settings.freeze() for q in items]
    if any(f != frozen[0] for f in frozen[1:]):
        raise ValueError(
            "solve_in_parallel requires identical settings across the "
            "batch: Settings are compile-time static, so per-QP settings "
            "cannot ride one vmapped program (the reference runs each QP "
            "with its own settings, parallel/qp_solve.hpp:33-60 -- solve "
            "differing QPs in separate calls)")
    settings = frozen[0]

    problems, rhos, mu_eqs, mu_ins, warms = [], [], [], [], []
    warm_modes = (InitialGuess.WARM_START,
                  InitialGuess.WARM_START_WITH_PREVIOUS_RESULT,
                  InitialGuess.COLD_START_WITH_PREVIOUS_RESULT)
    for q in items:
        core = q._core
        m = core._model
        if m is None:
            raise RuntimeError("every QP in the batch must be init()ed")
        p = dict(H=np.asarray(m["H"]), g=np.asarray(m["g"]),
                 A=np.asarray(m["A"]), b=np.asarray(m["b"]),
                 C=np.asarray(m["C"]), u=np.asarray(m["u"]),
                 l=np.asarray(m["l"]))
        if core.spec.box_constraints:
            p["u_box"] = np.asarray(m["u_box"])
            p["l_box"] = np.asarray(m["l_box"])
        problems.append(p)
        rhos.append(core._rho)
        mu_eqs.append(core._mu_eq)
        mu_ins.append(core._mu_in)
        ws = None
        if settings.initial_guess in warm_modes:
            if core._warm is not None:
                ws = tuple(np.asarray(v) for v in core._warm)
            elif core.results is not None:
                ws = (np.asarray(core.results.x),
                      np.asarray(core.results.y),
                      np.asarray(core.results.z))
        warms.append(ws)

    res_list = _batch.solve_in_parallel_ragged(
        problems, settings=settings, rho=rhos, mu_eq=mu_eqs,
        mu_in=mu_ins, warm_starts=warms)
    for q, r in zip(items, res_list):
        q._core.results = r
        q._core._warm = None


def compute_backward(qp: QP, loss_derivative, eps: float = 1e-4,
                     rho_backward: float = 1e-6, mu_backward: float = 1e-6):
    """Adjoint gradients at qp's solution; results land in
    qp.model.backward_data (reference expose-backward.hpp:13-37,
    dense/compute_ECJ.hpp:31-188)."""
    qp._core.compute_backward(
        np.asarray(loss_derivative), eps=eps,
        rho_backward=rho_backward, mu_backward=mu_backward)
    return qp.model.backward_data


import functools as _functools

import jax as _jax
import jax.numpy as _jnp


@_functools.lru_cache(maxsize=64)
def _batched_backward_fn(spec, settings, eps, rho_backward, mu_backward):
    from ..backward import compute_backward as _cb

    def one(qp_scaled, x, y, z, gx, gy, gz):
        return _cb(spec, settings, qp_scaled, x, y, z, gx, gy, gz,
                   eps=eps, rho_backward=rho_backward,
                   mu_backward=mu_backward)
    return _jax.jit(_jax.vmap(one))


def solve_backward_in_parallel(qps, loss_derivatives,
                               num_threads: Optional[int] = None,
                               eps: float = 1e-4,
                               rho_backward: float = 1e-6,
                               mu_backward: float = 1e-6) -> None:
    """Batched backward passes over already-solved QPs: ONE vmapped adjoint
    program over the stacked per-QP state, the TPU counterpart of the
    reference's OpenMP loop (parallel/qp_solve.hpp:86-138). num_threads is
    accepted for API compatibility and ignored (vmap lanes are the
    parallelism). Gradients land in each qp.model.backward_data."""
    items = qps._qps if isinstance(qps, BatchQP) else list(qps)
    if not items:
        return
    cores = [q._core for q in items]
    for c in cores:
        if c.results is None:
            raise RuntimeError("every QP must be solved before the "
                               "parallel backward pass")
    sp = cores[0].spec
    if any(c.spec != sp for c in cores[1:]):
        raise ValueError("parallel backward requires same-shape QPs")
    qp_batch = _jax.tree.map(lambda *xs: _jnp.stack(xs),
                             *[c._scaled for c in cores])
    xs = _jnp.stack([c.results.x for c in cores])
    ys = _jnp.stack([c.results.y for c in cores])
    zs = _jnp.stack([c.results.z for c in cores])
    lds = _jnp.stack([_jnp.asarray(ld, xs.dtype)
                      for ld in loss_derivatives])
    gx = lds[:, : sp.n]
    gy = lds[:, sp.n: sp.n + sp.n_eq]
    gz = lds[:, sp.n + sp.n_eq:]
    fn = _batched_backward_fn(sp, cores[0].settings, eps,
                              rho_backward, mu_backward)
    bd = fn(qp_batch, xs, ys, zs, gx, gy, gz)
    for i, c in enumerate(cores):
        c.backward_data = _jax.tree.map(lambda a, i=i: a[i], bd)
