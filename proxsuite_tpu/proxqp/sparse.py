"""Reference-compatible `proxqp.sparse` module.

Mirrors the reference sparse bindings surface
(/root/reference/include/proxsuite/proxqp/sparse/wrapper.hpp:90-885 via
bindings/python/src/expose-qpobject.hpp, expose-solve.hpp): `QP` accepting
scipy.sparse matrices, stateless `solve`. Backend policy is TPU-first
(see proxsuite_tpu/sparse.py): dense Schur Cholesky for moderate sizes,
matrix-free MINRES beyond (the reference's SparseBackend::MatrixFree
analogue, sparse/workspace.hpp:318).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from .. import sparse as _sparse
from ..types import HessianType, Settings, SparseBackend
from ._compat import ModelView, MutableSettings, ResultsView

__all__ = ["QP", "solve"]


class QP:
    """Reference-compatible sparse QP object (sparse/wrapper.hpp:90)."""

    def __init__(self, n: int, n_eq: int, n_in: int,
                 hessian_type: HessianType = HessianType.Dense):
        self.settings = MutableSettings()
        self._n, self._n_eq, self._n_in = n, n_eq, n_in
        self._hessian_type = hessian_type
        self._core = None

    def _make_core(self):
        core = _sparse.QP(self._n, self._n_eq, self._n_in,
                          settings=self.settings.freeze(),
                          hessian_type=self._hessian_type)
        return core

    def init(self, H=None, g=None, A=None, b=None, C=None, l=None, u=None,
             compute_preconditioner: bool = True,
             rho: Optional[float] = None, mu_eq: Optional[float] = None,
             mu_in: Optional[float] = None):
        self._core = self._make_core()
        self._core.init(H=H, g=g, A=A, b=b, C=C, l=l, u=u,
                        compute_preconditioner=compute_preconditioner,
                        rho=rho, mu_eq=mu_eq, mu_in=mu_in)
        return self

    def update(self, H=None, g=None, A=None, b=None, C=None, l=None, u=None,
               update_preconditioner: bool = False,
               rho: Optional[float] = None, mu_eq: Optional[float] = None,
               mu_in: Optional[float] = None):
        if self._core is None:
            raise RuntimeError("update() before init()")
        self.settings.update_preconditioner = update_preconditioner
        self._core.settings = self.settings.freeze().replace(
            kkt_backend=self._core.settings.kkt_backend)
        self._core.update(H=H, g=g, A=A, b=b, C=C, l=l, u=u,
                          rho=rho, mu_eq=mu_eq, mu_in=mu_in)
        return self

    def solve(self, x=None, y=None, z=None):
        if self._core is None:
            raise RuntimeError("solve() before init()")
        self._core.settings = self.settings.freeze().replace(
            kkt_backend=self._core.settings.kkt_backend)
        self._core.solve(x=x, y=y, z=z)
        self.settings.initial_guess = self._core.settings.initial_guess
        return self.results

    def cleanup(self):
        if self._core is not None:
            self._core.cleanup()
        return self

    @property
    def results(self) -> ResultsView:
        if self._core is None or self._core.results is None:
            raise RuntimeError("solve() has not been called")
        return ResultsView(self._core.results)

    @property
    def model(self) -> ModelView:
        class _Owner:  # ModelView reads owner._core
            pass
        o = _Owner()
        o._core = self._core
        return ModelView(o)


def solve(H=None, g=None, A=None, b=None, C=None, l=None, u=None,
          x=None, y=None, z=None, **kwargs) -> ResultsView:
    """Stateless sparse solve (reference sparse/wrapper.hpp:711). The
    warm-start triple (x, y, z) is forwarded to the core (ADVICE r1: it
    used to be silently dropped)."""
    res = _sparse.solve(H=H, g=g, A=A, b=b, C=C, l=l, u=u,
                        x=x, y=y, z=z, **kwargs)
    return ResultsView(res)
