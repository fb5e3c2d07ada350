"""Sparse-problem API (scipy.sparse in, matrix-free or Schur backends).

Counterpart of the reference sparse solver surface
(/root/reference/include/proxsuite/proxqp/sparse/wrapper.hpp:90-885):
`sparse.QP(n, n_eq, n_in)` with init/update/solve and a stateless
`sparse.solve(...)`, accepting scipy.sparse (or dense) matrices.

TPU-first backend policy (SURVEY.md section 2.5 / 5): scatter/gather
sparse LDLT is TPU-hostile, so the compute path stores the problem as
dense blocks and chooses between
  * "schur"      -- dense Schur-complement Cholesky (fast for n up to a
                    few thousand; the MXU eats dense factors for
                    breakfast, sparsity buys nothing at these sizes), and
  * "matrixfree" -- MINRES over the masked KKT operator, the analogue of
                    the reference's SparseBackend::MatrixFree fallback
                    (sparse/workspace.hpp:318 picks MatrixFree when the
                    factor exceeds 1e7 nonzeros).
SparseBackend.Automatic picks by problem size (AUTO_MATRIXFREE_DIM).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from .types import (
    HessianType,
    ProblemSpec,
    Results,
    Settings,
    SparseBackend,
)
from . import wrapper as _wrapper

# Automatic backend switch: beyond this primal dimension the dense factor's
# O(n^3) cost outgrows MINRES matvecs on sparse-structured data.
AUTO_MATRIXFREE_DIM = 2048


def _densify(M):
    if M is None:
        return None
    if hasattr(M, "todense"):
        return np.asarray(M.todense(), np.float64)
    return np.asarray(M, np.float64)


def _select_backend(settings: Settings, n: int, n_eq: int, n_in: int) -> str:
    if settings.sparse_backend == SparseBackend.MatrixFree:
        return "matrixfree"
    if settings.sparse_backend == SparseBackend.SparseCholesky:
        return "schur"
    return "matrixfree" if n + n_eq + n_in > AUTO_MATRIXFREE_DIM else "schur"


class QP(_wrapper.QP):
    """Sparse-input QP (reference sparse::QP<T,I>, sparse/wrapper.hpp:90)."""

    def __init__(self, n: int, n_eq: int, n_in: int,
                 settings: Optional[Settings] = None,
                 hessian_type: HessianType = HessianType.Dense,
                 dtype=None):
        settings = settings or Settings()
        settings = settings.replace(
            kkt_backend=_select_backend(settings, n, n_eq, n_in))
        super().__init__(n, n_eq, n_in, box_constraints=False,
                         hessian_type=hessian_type, settings=settings,
                         dtype=dtype)

    def init(self, H=None, g=None, A=None, b=None, C=None, l=None, u=None,
             **kw):
        return super().init(
            H=_densify(H), g=g, A=_densify(A), b=b, C=_densify(C),
            l=l, u=u, **kw)

    def update(self, H=None, g=None, A=None, b=None, C=None, l=None, u=None,
               **kw):
        return super().update(
            H=_densify(H), g=g, A=_densify(A), b=b, C=_densify(C),
            l=l, u=u, **kw)


def solve(H=None, g=None, A=None, b=None, C=None, l=None, u=None,
          settings: Optional[Settings] = None, **overrides) -> Results:
    """Stateless sparse solve (reference sparse/wrapper.hpp:711)."""
    from .api import solve as dense_solve
    g = np.asarray(g)
    n = g.shape[0]
    n_eq = 0 if A is None else A.shape[0]
    n_in = 0 if C is None else C.shape[0]
    settings = settings or Settings()
    if overrides:
        settings = settings.replace(**overrides)
    settings = settings.replace(
        kkt_backend=_select_backend(settings, n, n_eq, n_in))
    return dense_solve(H=_densify(H), g=g, A=_densify(A), b=b,
                       C=_densify(C), l=l, u=u, settings=settings)
