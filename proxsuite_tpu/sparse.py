"""Sparse QP solver: BCOO storage + matrix-free MINRES backend.

Counterpart of the reference sparse solver surface
(/root/reference/include/proxsuite/proxqp/sparse/wrapper.hpp:90-885):
`sparse.QP(n, n_eq, n_in)` with init/update/solve and a stateless
`sparse.solve(...)`, accepting scipy.sparse / BCOO / dense matrices.

TPU-first backend policy (SURVEY.md sections 2.5/7): the reference picks
sparse LDLT when the symbolic factor has < 1e7 nonzeros and falls back to
matrix-free MINRES above (sparse/workspace.hpp:318). Scatter-heavy sparse
LDLT is TPU-hostile, so here the two backends are

  * "schur"       -- densify + dense Schur-complement Cholesky: for
                     moderate n the MXU eats the dense factor and sparsity
                     buys nothing (a 2048^2 f32 Cholesky is ~ms);
  * "matrixfree"  -- TRUE sparse path: problem stays BCOO end-to-end
                     (sparse Ruiz, sparse matvecs in residuals / Newton
                     rhs / MINRES on the masked KKT operator); memory and
                     flops scale with nnz, so 10k+-dim problems that the
                     dense path cannot materialize solve fine.

`SparseBackend.Automatic` picks matrixfree when the problem is big AND
sparse (dense cost ~ n^3 vs MINRES cost ~ iters * nnz), mirroring the
intent of the reference's lnnz rule with TPU constants.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from .ops import sparse_ops as sp
from .ops.precond import ruiz_equilibrate_sparse
from .ops.residuals import ScaledQP
from .types import (
    HessianType,
    INFINITE_BOUND,
    InitialGuess,
    ProblemSpec,
    Results,
    Settings,
    SparseBackend,
)
from . import wrapper as _wrapper

# Automatic policy: matrixfree when the KKT dimension exceeds this AND the
# problem is sparser than AUTO_DENSITY (below it, densify+Schur wins on
# the MXU).
AUTO_MATRIXFREE_DIM = 2048
AUTO_DENSITY = 0.05


def _densify(M):
    if M is None:
        return None
    if hasattr(M, "todense"):
        return np.asarray(M.todense(), np.float64)
    if isinstance(M, sp.BCOO):
        return np.asarray(M.todense())
    return np.asarray(M, np.float64)


def _select_backend(settings: Settings, H, A, C,
                    n: int, n_eq: int, n_in: int) -> str:
    if settings.sparse_backend == SparseBackend.MatrixFree:
        return "matrixfree"
    if settings.sparse_backend == SparseBackend.SparseCholesky:
        return "schur"
    big = n + n_eq + n_in > AUTO_MATRIXFREE_DIM
    dens = max(sp.density(M) for M in (H, A, C) if M is not None
               and 0 not in M.shape) if any(
        M is not None and 0 not in M.shape for M in (H, A, C)) else 1.0
    return "matrixfree" if (big and dens < AUTO_DENSITY) else "schur"


def build_scaled_qp_sparse(
    spec: ProblemSpec,
    settings: Settings,
    H, g, A, b, C, u, l,
    *,
    execute_preconditioner: bool = True,
) -> ScaledQP:
    """Sparse analogue of api.build_scaled_qp: BCOO operands end-to-end."""
    dtype = g.dtype
    u_cl = jnp.minimum(u, INFINITE_BOUND)
    l_cl = jnp.maximum(l, -INFINITE_BOUND)
    if execute_preconditioner:
        rz = ruiz_equilibrate_sparse(
            H, g, A, b, C, u_cl, l_cl,
            hessian_type=spec.hessian_type,
            max_iter=settings.preconditioner_max_iter,
            epsilon=settings.preconditioner_accuracy,
            infeasibility_preconditioning=settings.primal_infeasibility_solving)
        return ScaledQP(
            H=rz.H, g=rz.g, A=rz.A, b=rz.b, C=rz.C, u=rz.u, l=rz.l,
            u_orig=u, l_orig=l,
            delta_x=rz.delta_x, delta_y=rz.delta_y, delta_z=rz.delta_z,
            c=rz.c)
    return ScaledQP(
        H=H, g=g, A=A, b=b, C=C, u=u_cl, l=l_cl, u_orig=u, l_orig=l,
        delta_x=jnp.ones((spec.n,), dtype),
        delta_y=jnp.ones((spec.n_eq,), dtype),
        delta_z=jnp.ones((spec.n_c,), dtype),
        c=jnp.asarray(1.0, dtype))


class QP(_wrapper.QP):
    """Sparse-input QP (reference sparse::QP<T,I>, sparse/wrapper.hpp:90).

    With the matrixfree backend the problem stays sparse end-to-end; with
    the schur backend inputs are densified (delegating to the dense core).
    """

    def __init__(self, n: int, n_eq: int, n_in: int,
                 settings: Optional[Settings] = None,
                 hessian_type: HessianType = HessianType.Dense,
                 dtype=None):
        self._pending_settings = settings or Settings()
        if hessian_type == HessianType.Diagonal:
            raise ValueError(
                "sparse path supports Dense/Zero hessian types; a diagonal "
                "H is best passed to the dense wrapper directly")
        super().__init__(n, n_eq, n_in, box_constraints=False,
                         hessian_type=hessian_type,
                         settings=self._pending_settings, dtype=dtype)

    def init(self, H=None, g=None, A=None, b=None, C=None, l=None, u=None,
             **kw):
        backend = _select_backend(
            self._pending_settings, H, A, C,
            self.spec.n, self.spec.n_eq, self.spec.n_in)
        self.settings = self._pending_settings.replace(kkt_backend=backend)
        if backend != "matrixfree":
            return super().init(
                H=_densify(H), g=g, A=_densify(A), b=b, C=_densify(C),
                l=l, u=u, **kw)
        # true sparse path: build a BCOO ScaledQP, bypass the dense setup
        n, n_eq, n_in = self.spec.n, self.spec.n_eq, self.spec.n_in
        dtype = self.dtype
        g = jnp.asarray(g, dtype)
        zero = lambda r, c: sp.BCOO(
            (jnp.zeros((0,), dtype), jnp.zeros((0, 2), jnp.int32)),
            shape=(r, c))
        Hb = zero(n, n) if H is None else sp.from_any(H, dtype=dtype)
        Ab = zero(n_eq, n) if A is None else sp.from_any(A, dtype=dtype)
        Cb = zero(n_in, n) if C is None else sp.from_any(C, dtype=dtype)
        b = jnp.zeros((n_eq,), dtype) if b is None else jnp.asarray(b, dtype)
        u = (jnp.full((n_in,), jnp.inf, dtype) if u is None
             else jnp.asarray(u, dtype))
        l = (jnp.full((n_in,), -jnp.inf, dtype) if l is None
             else jnp.asarray(l, dtype))
        self._model = dict(H=Hb, g=g, A=Ab, b=b, C=Cb, u=u, l=l,
                           u_box=None, l_box=None)
        self._scaled = build_scaled_qp_sparse(
            self.spec, self.settings, Hb, g, Ab, b, Cb, u, l,
            execute_preconditioner=kw.get("compute_preconditioner", True))
        self._rho = jnp.asarray(
            kw.get("rho") or self.settings.default_rho, dtype)
        self._mu_eq = jnp.asarray(
            kw.get("mu_eq") or self.settings.default_mu_eq, dtype)
        self._mu_in = jnp.asarray(
            kw.get("mu_in") or self.settings.default_mu_in, dtype)
        self.results = None
        return self

    def update(self, H=None, g=None, A=None, b=None, C=None, l=None, u=None,
               **kw):
        if self.settings.kkt_backend != "matrixfree":
            return super().update(
                H=_densify(H), g=g, A=_densify(A), b=b, C=_densify(C),
                l=l, u=u, **kw)
        # reference sparse update requires the same sparsity pattern
        # (sparse/wrapper.hpp:357, helpers.hpp have_same_structure); here
        # any new operand is re-ingested wholesale
        m = self._model
        self.init(H=H if H is not None else m["H"],
                  g=g if g is not None else m["g"],
                  A=A if A is not None else m["A"],
                  b=b if b is not None else m["b"],
                  C=C if C is not None else m["C"],
                  l=l if l is not None else m["l"],
                  u=u if u is not None else m["u"], **kw)
        return self


def solve(H=None, g=None, A=None, b=None, C=None, l=None, u=None,
          x=None, y=None, z=None,
          settings: Optional[Settings] = None, **overrides) -> Results:
    """Stateless sparse solve (reference sparse/wrapper.hpp:711).

    Warm-start triple (x, y, z) is forwarded (ADVICE r1: it used to be
    silently dropped); passing x switches initial_guess to WARM_START
    exactly like the dense stateless solve.
    """
    g = np.asarray(g)
    n = g.shape[0]
    n_eq = 0 if A is None else A.shape[0]
    n_in = 0 if C is None else C.shape[0]
    settings = settings or Settings()
    if overrides:
        settings = settings.replace(**overrides)
    if x is not None and settings.initial_guess not in (
            InitialGuess.WARM_START,
            InitialGuess.WARM_START_WITH_PREVIOUS_RESULT,
            InitialGuess.COLD_START_WITH_PREVIOUS_RESULT):
        settings = settings.replace(initial_guess=InitialGuess.WARM_START)
    qp = QP(n, n_eq, n_in, settings=settings)
    qp.init(H=H, g=g, A=A, b=b, C=C, l=l, u=u)
    return qp.solve(x=x, y=y, z=z)
