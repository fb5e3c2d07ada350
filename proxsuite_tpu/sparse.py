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
        if n + n_eq + n_in > AUTO_MATRIXFREE_DIM:
            # documented divergence from the reference (docs/2-api.md):
            # SparseCholesky here means densify + dense Schur, O(dim^2)
            # memory -- say so once instead of silently allocating GBs
            import warnings
            warnings.warn(
                f"SparseBackend.SparseCholesky densifies: the "
                f"{n + n_eq + n_in}-dim KKT becomes dense O(dim^2) "
                f"storage (no sparse LDL^T kernel on TPU by design; "
                f"see docs/2-api.md). Use SparseBackend.MatrixFree for "
                f"O(nnz) memory.", stacklevel=3)
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


def build_scaled_qp_sparse_ha(
    spec: ProblemSpec,
    settings: Settings,
    H, H_lo, g, g_lo, A, A_lo, b, b_lo, C, C_lo, u, u_lo, l, l_lo,
) -> ScaledQP:
    """High-accuracy sparse setup (BCOO analogue of api.build_scaled_qp_ha).

    f64 data arrives as (hi, lo) word pairs — BCOO pairs sharing indices
    for H/A/C (sparse_ops.from_any_df), f32 vector pairs for g/b/u/l.
    Ruiz runs on the hi words to pick the scalings; the scaled operands
    are then recomputed from the full double-float data with error-free
    products (sparse_ops.scale_rows_cols_df / ops/df.py), so the solved
    problem matches the f64 input to ~2^-45. Reference anchor:
    sparse/solver.hpp:342 — the reference's f64 accuracy is
    backend-independent.
    """
    from .ops.df import df_mul, two_prod

    u_cl = jnp.minimum(u, INFINITE_BOUND)
    l_cl = jnp.maximum(l, -INFINITE_BOUND)
    rz = ruiz_equilibrate_sparse(
        H, g, A, b, C, u_cl, l_cl,
        hessian_type=spec.hessian_type,
        max_iter=settings.preconditioner_max_iter,
        epsilon=settings.preconditioner_accuracy,
        infeasibility_preconditioning=settings.primal_infeasibility_solving)
    dx, dy, dz, c = rz.delta_x, rz.delta_y, rz.delta_z, rz.c

    H_s, H_s_lo = sp.scale_rows_cols_df(H, H_lo, dx, dx, s=c)
    A_s, A_s_lo = sp.scale_rows_cols_df(A, A_lo, dy, dx)
    C_s, C_s_lo = sp.scale_rows_cols_df(C, C_lo, dz, dx)
    cb = jnp.broadcast_to(c, dx.shape)
    g_s = df_mul((g, g_lo), two_prod(dx, cb))
    b_s = df_mul((b, b_lo), (dy, jnp.zeros_like(dy)))
    u_s = df_mul((u_cl, jnp.where(u <= INFINITE_BOUND, u_lo, 0.0)),
                 (dz, jnp.zeros_like(dz)))
    l_s = df_mul((l_cl, jnp.where(l >= -INFINITE_BOUND, l_lo, 0.0)),
                 (dz, jnp.zeros_like(dz)))
    return ScaledQP(
        H=H_s, g=g_s[0], A=A_s, b=b_s[0], C=C_s, u=u_s[0], l=l_s[0],
        u_orig=u, l_orig=l,
        delta_x=dx, delta_y=dy, delta_z=dz, c=c,
        H_lo=H_s_lo, g_lo=g_s[1], A_lo=A_s_lo, b_lo=b_s[1],
        C_lo=C_s_lo, u_lo=u_s[1], l_lo=l_s[1])


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
        if backend == "matrixfree":
            self.settings = self._pending_settings.replace(
                kkt_backend="matrixfree")
        elif self._pending_settings.kkt_backend:
            self.settings = self._pending_settings  # user pin respected
        else:
            # densified path: leave kkt_backend Automatic so the dense
            # core's full robustness chain stays available (schur first,
            # primaldual fallback on MAX_ITER) -- pinning "schur" here
            # disabled the fallback and ground e.g. Maros-Meszaros QCAPRI
            # to max_iter through the sparse API while the dense API
            # solved it in 461 iterations
            self.settings = self._pending_settings
        if backend != "matrixfree":
            return super().init(
                H=_densify(H), g=g, A=_densify(A), b=b, C=_densify(C),
                l=l, u=u, **kw)
        # true sparse path: build a BCOO ScaledQP, bypass the dense setup
        n, n_eq, n_in = self.spec.n, self.spec.n_eq, self.spec.n_in
        dtype = self.dtype
        ha = self.settings.high_accuracy
        if ha:
            dtype = jnp.float32   # HA = f32 words + double-float pipeline
            self.dtype = dtype
        else:
            g = jnp.asarray(g, dtype)
        zero = lambda r, c: sp.BCOO(
            (jnp.zeros((0,), dtype), jnp.zeros((0, 2), jnp.int32)),
            shape=(r, c))
        zero2 = lambda r, c: (zero(r, c), zero(r, c))
        if ha:
            from .api import split_df_host
            Hp = zero2(n, n) if H is None else sp.from_any_df(H, dtype)
            Ap = zero2(n_eq, n) if A is None else sp.from_any_df(A, dtype)
            Cp = zero2(n_in, n) if C is None else sp.from_any_df(C, dtype)
            vec = lambda v, size, fill: (
                np.full(size, fill) if v is None else np.asarray(
                    v, np.float64))
            b64 = vec(b, n_eq, 0.0)
            u64 = vec(u, n_in, np.inf)
            l64 = vec(l, n_in, -np.inf)
            pairs = [split_df_host(np.asarray(g, np.float64)),
                     split_df_host(b64), split_df_host(u64),
                     split_df_host(l64)]
            (g, g_lo), (b, b_lo), (u, u_lo), (l, l_lo) = [
                (jnp.asarray(hi, dtype), jnp.asarray(lo, dtype))
                for hi, lo in pairs]
            self._model = dict(H=Hp[0], g=g, A=Ap[0], b=b, C=Cp[0],
                               u=u, l=l, u_box=None, l_box=None)
            self._scaled = build_scaled_qp_sparse_ha(
                self.spec, self.settings,
                Hp[0], Hp[1], g, g_lo, Ap[0], Ap[1], b, b_lo,
                Cp[0], Cp[1], u, u_lo, l, l_lo)
        else:
            Hb = zero(n, n) if H is None else sp.from_any(H, dtype=dtype)
            Ab = zero(n_eq, n) if A is None else sp.from_any(A, dtype=dtype)
            Cb = zero(n_in, n) if C is None else sp.from_any(C, dtype=dtype)
            b = (jnp.zeros((n_eq,), dtype) if b is None
                 else jnp.asarray(b, dtype))
            u = (jnp.full((n_in,), jnp.inf, dtype) if u is None
                 else jnp.asarray(u, dtype))
            l = (jnp.full((n_in,), -jnp.inf, dtype) if l is None
                 else jnp.asarray(l, dtype))
            self._model = dict(H=Hb, g=g, A=Ab, b=b, C=Cb, u=u, l=l,
                               u_box=None, l_box=None)
            self._scaled = build_scaled_qp_sparse(
                self.spec, self.settings, Hb, g, Ab, b, Cb, u, l,
                execute_preconditioner=kw.get("compute_preconditioner",
                                              True))
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
        # Same-pattern fast path (reference sparse::QP::update,
        # sparse/wrapper.hpp:357 + helpers.hpp:414-460 have_same_structure/
        # copy): when every supplied matrix matches the stored sparsity
        # pattern and update_preconditioner is off, the existing Ruiz
        # scaling is re-APPLIED to the new data — no equilibration loop,
        # no re-ingest. MPC-style warm-started re-solves pay O(nnz)
        # elementwise work only. Any pattern mismatch falls back to a
        # full re-init (the reference raises instead; re-ingest is the
        # gentler contract).
        m = self._model
        ha = self.settings.high_accuracy

        def match(new, old):
            """BCOO of `new` if its pattern equals old's, else None."""
            if ha:
                pair = sp.from_any_df(new, self.dtype)
                nb = pair[0]
            else:
                pair = sp.from_any(new, dtype=self.dtype)
                nb = pair
            if nb.nse == old.nse and bool(
                    jnp.all(nb.indices == old.indices)):
                return pair
            return None

        fast = not self.settings.update_preconditioner
        news = {}
        for name, val in (("H", H), ("A", A), ("C", C)):
            if val is None or not fast:
                continue
            got = match(val, m[name])
            if got is None:
                fast = False
            else:
                news[name] = got
        if not fast:
            self.init(H=H if H is not None else m["H"],
                      g=g if g is not None else m["g"],
                      A=A if A is not None else m["A"],
                      b=b if b is not None else m["b"],
                      C=C if C is not None else m["C"],
                      l=l if l is not None else m["l"],
                      u=u if u is not None else m["u"], **kw)
            return self

        s = self._scaled
        dx, dy, dz, c = s.delta_x, s.delta_y, s.delta_z, s.c
        dt = self.dtype
        if ha:
            from .api import split_df_host
            from .ops.df import df_mul, two_prod
            upd = dict(s._asdict())
            for name, (dr, dc, sc) in (("H", (dx, dx, c)),
                                       ("A", (dy, dx, None)),
                                       ("C", (dz, dx, None))):
                if name in news:
                    hi, lo = sp.scale_rows_cols_df(*news[name], dr, dc, s=sc)
                    upd[name] = hi
                    upd[name + "_lo"] = lo
                    m[name] = news[name][0]
            if g is not None:
                ghi, glo = split_df_host(np.asarray(g, np.float64))
                cb = jnp.broadcast_to(c, dx.shape)
                gs = df_mul((jnp.asarray(ghi, dt), jnp.asarray(glo, dt)),
                            two_prod(dx, cb))
                upd["g"], upd["g_lo"] = gs
                m["g"] = jnp.asarray(ghi, dt)
            for name, val, d in (("b", b, dy), ("u", u, dz), ("l", l, dz)):
                if val is None:
                    continue
                v64 = np.asarray(val, np.float64)
                if name == "u":
                    v_cl = np.minimum(v64, float(INFINITE_BOUND))
                elif name == "l":
                    v_cl = np.maximum(v64, -float(INFINITE_BOUND))
                else:
                    v_cl = v64
                hi, lo = split_df_host(v_cl)
                vs = df_mul((jnp.asarray(hi, dt), jnp.asarray(lo, dt)),
                            (d, jnp.zeros_like(d)))
                upd[name], upd[name + "_lo"] = vs
                if name in ("u", "l"):
                    upd[name + "_orig"] = jnp.asarray(v64, dt)
                m[name] = jnp.asarray(hi, dt)
            self._scaled = ScaledQP(**upd)
        else:
            upd = dict(s._asdict())
            for name, (dr, dc, sc) in (("H", (dx, dx, c)),
                                       ("A", (dy, dx, None)),
                                       ("C", (dz, dx, None))):
                if name in news:
                    scaled = sp.scale_rows_cols(news[name], dr, dc)
                    if sc is not None:
                        scaled = sp.scale_data(scaled, sc)
                    upd[name] = scaled
                    m[name] = news[name]
            if g is not None:
                m["g"] = jnp.asarray(g, dt)
                upd["g"] = m["g"] * dx * c
            if b is not None:
                m["b"] = jnp.asarray(b, dt)
                upd["b"] = m["b"] * dy
            if u is not None:
                m["u"] = jnp.asarray(u, dt)
                upd["u"] = jnp.minimum(m["u"], INFINITE_BOUND) * dz
                upd["u_orig"] = m["u"]
            if l is not None:
                m["l"] = jnp.asarray(l, dt)
                upd["l"] = jnp.maximum(m["l"], -INFINITE_BOUND) * dz
                upd["l_orig"] = m["l"]
            self._scaled = ScaledQP(**upd)
        for pname in ("rho", "mu_eq", "mu_in"):
            if kw.get(pname) is not None:
                setattr(self, "_" + pname,
                        jnp.asarray(float(kw[pname]), dt))
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
