"""Stateful QP object: init / update / solve / cleanup lifecycle.

Counterpart of the reference dense::QP wrapper
(/root/reference/include/proxsuite/proxqp/dense/wrapper.hpp:115-996):
holds settings, model, results and the equilibration state between solves,
implements every InitialGuess mode, partial model updates that reuse the
previous preconditioner (wrapper.hpp:723-919), warm starts, and proximal-
parameter updates. Compute dispatches to jitted functional pieces cached
per (ProblemSpec, Settings).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .api import build_scaled_qp, solve_scaled
from .backward import BackwardData, compute_backward
from .ops.residuals import ScaledQP
from .types import (
    HessianType,
    InitialGuess,
    ProblemSpec,
    QPSolverOutput,
    Results,
    Settings,
)
from .utils.eigen import estimate_minimal_eigen_value_of_symmetric_matrix


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _scale_jit(spec, settings, execute, H, g, A, b, C, u, l, u_box, l_box,
               delta_x, delta_y, delta_z, c):
    if execute:
        return build_scaled_qp(spec, settings, H, g, A, b, C, u, l,
                               u_box, l_box, execute_preconditioner=True)
    return build_scaled_qp(spec, settings, H, g, A, b, C, u, l,
                           u_box, l_box, execute_preconditioner=False,
                           delta_x=delta_x, delta_y=delta_y,
                           delta_z=delta_z, c=c)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _solve_jit(spec, settings, qp: ScaledQP, x0, y0, z0, rho, mu_eq, mu_in):
    return solve_scaled(spec, settings, qp, x0, y0, z0, rho, mu_eq, mu_in)


class QP:
    """Dense QP with persistent state (reference dense::QP<T>)."""

    def __init__(self, n: int, n_eq: int, n_in: int,
                 box_constraints: bool = False,
                 hessian_type: HessianType = HessianType.Dense,
                 settings: Optional[Settings] = None,
                 dtype=None):
        self.spec = ProblemSpec(n=n, n_eq=n_eq, n_in=n_in,
                                box_constraints=box_constraints,
                                hessian_type=hessian_type)
        self.settings = settings or Settings()
        self.dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64
                               else jnp.float32)
        self.results: Optional[Results] = None
        self.backward_data: Optional[BackwardData] = None
        self._model = None          # unscaled numpy-side model dict
        self._scaled: Optional[ScaledQP] = None
        self._rho = None            # persistent proximal parameters
        self._mu_eq = None
        self._mu_in = None
        self._warm = None           # pending explicit warm start (x, y, z)
        self._minimal_H_eig = 0.0

    # ------------------------------------------------------------- init
    def init(self, H=None, g=None, A=None, b=None, C=None, l=None, u=None,
             l_box=None, u_box=None,
             compute_preconditioner: bool = True,
             rho: Optional[float] = None,
             mu_eq: Optional[float] = None,
             mu_in: Optional[float] = None,
             manual_minimal_H_eigenvalue: Optional[float] = None):
        """Set up the model and run (or skip) equilibration
        (reference wrapper.hpp:354-518)."""
        sp, dt = self.spec, self.dtype
        self._check_dims(H=H, g=g, A=A, b=b, C=C, l=l, u=u,
                         l_box=l_box, u_box=u_box)
        if self.settings.high_accuracy:
            # keep the f64 host data: the HA pipeline splits it into
            # double-float word pairs at scaling time (api.split_df_host)
            import numpy as _np
            z2 = lambda *shp: _np.zeros(shp, _np.float64)
            nb = sp.n if sp.box_constraints else 0
            self._model64 = {
                "H": z2(sp.n, sp.n) if H is None else _np.asarray(H, _np.float64),
                "g": _np.asarray(g, _np.float64),
                "A": z2(sp.n_eq, sp.n) if A is None else _np.asarray(A, _np.float64),
                "b": z2(sp.n_eq) if b is None else _np.asarray(b, _np.float64),
                "C": z2(sp.n_in, sp.n) if C is None else _np.asarray(C, _np.float64),
                "u": (_np.full(sp.n_in, _np.inf) if u is None
                      else _np.asarray(u, _np.float64)),
                "l": (_np.full(sp.n_in, -_np.inf) if l is None
                      else _np.asarray(l, _np.float64)),
                "u_box": (_np.full(nb, _np.inf) if u_box is None
                          else _np.asarray(u_box, _np.float64)),
                "l_box": (_np.full(nb, -_np.inf) if l_box is None
                          else _np.asarray(l_box, _np.float64)),
            }
        model = {
            "H": jnp.zeros((sp.n, sp.n), dt) if H is None else jnp.asarray(H, dt),
            "g": jnp.asarray(g, dt),
            "A": jnp.zeros((sp.n_eq, sp.n), dt) if A is None else jnp.asarray(A, dt),
            "b": jnp.zeros((sp.n_eq,), dt) if b is None else jnp.asarray(b, dt),
            "C": jnp.zeros((sp.n_in, sp.n), dt) if C is None else jnp.asarray(C, dt),
            "u": jnp.full((sp.n_in,), jnp.inf, dt) if u is None else jnp.asarray(u, dt),
            "l": jnp.full((sp.n_in,), -jnp.inf, dt) if l is None else jnp.asarray(l, dt),
            "u_box": (jnp.asarray(u_box, dt) if u_box is not None
                      else jnp.full((sp.n if sp.box_constraints else 0,), jnp.inf, dt)),
            "l_box": (jnp.asarray(l_box, dt) if l_box is not None
                      else jnp.full((sp.n if sp.box_constraints else 0,), -jnp.inf, dt)),
        }
        self._model = model

        # proximal parameter overrides (helpers.hpp:678-705)
        from .api import default_rho_for
        rho_val = (default_rho_for(sp, self.settings, dt)
                   if rho is None else float(rho))
        # nonconvex support: rho += |min eigenvalue estimate|
        # (helpers.hpp:174-189)
        if manual_minimal_H_eigenvalue is not None:
            self._minimal_H_eig = float(manual_minimal_H_eigenvalue)
            rho_val += abs(self._minimal_H_eig)
        self._rho = rho_val
        self._mu_eq = (self.settings.default_mu_eq if mu_eq is None
                       else float(mu_eq))
        self._mu_in = (self.settings.default_mu_in if mu_in is None
                       else float(mu_in))

        import time as _time
        _t0 = _time.perf_counter()
        self._rescale(execute=compute_preconditioner
                      and self.settings.compute_preconditioner)
        if self.settings.compute_timings:
            jax.block_until_ready(self._scaled.H)
            self._setup_time_us = (_time.perf_counter() - _t0) * 1e6
        self.results = None
        return self

    def _check_dims(self, **kw):
        """Shape validation (reference PROXSUITE_CHECK_ARGUMENT_SIZE,
        wrapper.hpp:380-451): mis-sized inputs raise, never mis-solve."""
        import numpy as _np
        sp = self.spec
        expect = {
            "H": (sp.n, sp.n), "g": (sp.n,),
            "A": (sp.n_eq, sp.n), "b": (sp.n_eq,),
            "C": (sp.n_in, sp.n), "u": (sp.n_in,), "l": (sp.n_in,),
            # non-box QPs carry shape-(0,) box arrays (save_qp stores them
            # that way for every QP; reference wrapper.hpp:380-451 only
            # checks box shapes when box_constraints is set)
            "u_box": (sp.n if sp.box_constraints else 0,),
            "l_box": (sp.n if sp.box_constraints else 0,),
        }
        for name, val in kw.items():
            if val is None:
                continue
            shape = tuple(_np.shape(val))
            if shape != expect[name]:
                raise ValueError(
                    f"{name} has shape {shape}, expected {expect[name]} "
                    f"for (n={sp.n}, n_eq={sp.n_eq}, n_in={sp.n_in})")

    def _rescale(self, execute: bool):
        if self.settings.high_accuracy:
            from .api import build_scaled_qp_ha, split_df_host
            m = self._model64
            parts = []
            for k in ("H", "g", "A", "b", "C", "u", "l",
                      "u_box", "l_box"):
                hi, lo = split_df_host(m[k])
                parts.extend([jnp.asarray(hi), jnp.asarray(lo)])
            self._scaled = build_scaled_qp_ha(
                self.spec, self.settings, *parts)
            return
        m = self._model
        if execute or self._scaled is None:
            self._scaled = _scale_jit(
                self.spec, self.settings, True,
                m["H"], m["g"], m["A"], m["b"], m["C"], m["u"], m["l"],
                m["u_box"], m["l_box"],
                None, None, None, None)
        else:
            s = self._scaled
            self._scaled = _scale_jit(
                self.spec, self.settings, False,
                m["H"], m["g"], m["A"], m["b"], m["C"], m["u"], m["l"],
                m["u_box"], m["l_box"],
                s.delta_x, s.delta_y, s.delta_z, s.c)

    # ----------------------------------------------------------- update
    def update(self, H=None, g=None, A=None, b=None, C=None, l=None, u=None,
               l_box=None, u_box=None,
               rho: Optional[float] = None,
               mu_eq: Optional[float] = None,
               mu_in: Optional[float] = None):
        """Partial model update; reuses the previous equilibration unless
        settings.update_preconditioner (reference wrapper.hpp:723-919)."""
        if self._model is None:
            raise RuntimeError("QP.update called before QP.init")
        self._check_dims(H=H, g=g, A=A, b=b, C=C, l=l, u=u,
                         l_box=l_box, u_box=u_box)
        dt = self.dtype
        for name, val in (("H", H), ("g", g), ("A", A), ("b", b), ("C", C),
                          ("l", l), ("u", u), ("l_box", l_box),
                          ("u_box", u_box)):
            if val is not None:
                self._model[name] = jnp.asarray(val, dt)
                if self.settings.high_accuracy and name in getattr(
                        self, "_model64", {}):
                    import numpy as _np
                    self._model64[name] = _np.asarray(val, _np.float64)
        if rho is not None:
            self._rho = float(rho)
        if mu_eq is not None:
            self._mu_eq = float(mu_eq)
        if mu_in is not None:
            self._mu_in = float(mu_in)
        self._rescale(execute=self.settings.update_preconditioner)
        return self

    # ------------------------------------------------------- warm start
    def warm_start(self, x=None, y=None, z=None):
        """Explicit warm start; switches initial_guess to WARM_START
        (reference helpers.hpp:715-763)."""
        if x is None and y is None and z is None:
            return self
        self.settings = self.settings.replace(
            initial_guess=InitialGuess.WARM_START)
        dt = self.dtype
        sp = self.spec
        self._warm = (
            jnp.zeros((sp.n,), dt) if x is None else jnp.asarray(x, dt),
            jnp.zeros((sp.n_eq,), dt) if y is None else jnp.asarray(y, dt),
            jnp.zeros((sp.n_c,), dt) if z is None else jnp.asarray(z, dt),
        )
        return self

    # ------------------------------------------------------------ solve
    _compiled_keys = set()   # executables already built this process

    def _resolved_settings(self) -> Settings:
        """Resolve factor_df=None -> bool (the jitted solver needs a
        static flag; only the wrapper knows rho as a host value).

        Automatic rule: double-float factorization ON for f32 +
        high_accuracy + primaldual backend when rho < 1e-5 -- exactly the
        regime where the f32 signed factor's element growth
        (~ ||W||^2/(rho mu)) defeats iterative refinement (ops/chol.py
        FullDFLDL). This is the conditioning-aware answer to the round-4
        rho-retry ladder: keep the reference's rho (and iteration counts),
        factor accurately instead of escalating rho.
        """
        s = self.settings
        if s.factor_df is not None:
            return s
        f32 = jnp.finfo(self.dtype).bits < 64
        from .solver import resolve_backend
        auto = (f32 and s.high_accuracy
                and resolve_backend(self.spec, s, self.dtype) == "primaldual"
                and float(self._rho) < 1e-5)
        return s.replace(factor_df=auto)

    def _timing_key(self):
        return (self.spec, self.settings, self.dtype)

    def solve(self, x=None, y=None, z=None) -> Results:
        import time as _time
        t0 = _time.perf_counter()
        self._used_fallback = False
        if self._scaled is None:
            raise RuntimeError("QP.solve called before QP.init")
        if x is not None or y is not None or z is not None:
            self.warm_start(x, y, z)

        ig = self.settings.initial_guess
        x0 = y0 = z0 = None
        if ig == InitialGuess.WARM_START:
            if self._warm is not None:
                x0, y0, z0 = self._warm
            elif self.results is not None:
                x0, y0, z0 = self.results.x, self.results.y, self.results.z
        elif ig in (InitialGuess.WARM_START_WITH_PREVIOUS_RESULT,
                    InitialGuess.COLD_START_WITH_PREVIOUS_RESULT):
            if self.results is not None:
                x0, y0, z0 = self.results.x, self.results.y, self.results.z

        dt = self.dtype
        sp = self.spec
        if x0 is None:
            x0 = jnp.zeros((sp.n,), dt)
            y0 = jnp.zeros((sp.n_eq,), dt)
            z0 = jnp.zeros((sp.n_c,), dt)
        if jnp.asarray(z0).shape[0] == sp.n_in and sp.box_constraints:
            z0 = jnp.concatenate([jnp.asarray(z0, dt), jnp.zeros((sp.n,), dt)])

        st = self._resolved_settings()
        self.results = _solve_jit(
            self.spec, st, self._scaled,
            jnp.asarray(x0, dt), jnp.asarray(y0, dt), jnp.asarray(z0, dt),
            jnp.asarray(self._rho, dt), jnp.asarray(self._mu_eq, dt),
            jnp.asarray(self._mu_in, dt))
        self._maybe_backend_fallback(st, x0, y0, z0)
        self._warm = None
        if self.settings.verbose:
            # solver statistics banner (reference solver.hpp:1789-1834)
            r = self.results
            print("----------------SOLVER STATISTICS----------------")
            print(f"status:       {QPSolverOutput(int(r.info.status)).name}")
            print(f"outer iter:   {int(r.info.iter_ext)}")
            print(f"total iter:   {int(r.info.iter)}")
            print(f"mu updates:   {int(r.info.mu_updates)}")
            print(f"objective:    {float(r.info.objValue):.6e}")
            print(f"pri residual: {float(r.info.pri_res):.3e}")
            print(f"dua residual: {float(r.info.dua_res):.3e}")
        if self.settings.compute_timings:
            # reference Timer semantics (proxqp/timings.hpp:13-101 +
            # info.setup_time/solve_time/run_time): solve_time EXCLUDES
            # XLA compilation. The first time an executable is built the
            # solve is re-run once to separate compile from run.
            jax.block_until_ready(self.results.x)
            t_first = (_time.perf_counter() - t0) * 1e6
            key = self._timing_key()
            compile_us = 0.0
            if getattr(self, "_used_fallback", False):
                # the kept result came from the fallback backend; a
                # timings re-run with the primary settings would discard
                # it, so keep wall time as solve_time
                QP._compiled_keys.add(key)
            if key not in QP._compiled_keys:
                QP._compiled_keys.add(key)
                t1 = _time.perf_counter()
                self.results = _solve_jit(
                    self.spec, st, self._scaled,
                    jnp.asarray(x0, dt), jnp.asarray(y0, dt),
                    jnp.asarray(z0, dt),
                    jnp.asarray(self._rho, dt), jnp.asarray(self._mu_eq, dt),
                    jnp.asarray(self._mu_in, dt))
                jax.block_until_ready(self.results.x)
                solve_us = (_time.perf_counter() - t1) * 1e6
                compile_us = max(t_first - solve_us, 0.0)
            else:
                solve_us = t_first
            setup_us = getattr(self, "_setup_time_us", 0.0)
            self.solve_time_us = solve_us
            self.results = self.results._replace(
                info=self.results.info._replace(
                    setup_time=setup_us, solve_time=solve_us,
                    run_time=setup_us + solve_us,
                    compile_time=compile_us))
        # high accuracy: deliver the combined f64 solution so the reported
        # status certifies res.x/y/z themselves (types.Results.ha_finalized)
        self.results = self.results.ha_finalized()
        return self.results

    def _maybe_backend_fallback(self, st, x0, y0, z0):
        """Robust-backend retry when the Automatic Schur choice fails.

        The Schur form squares the KKT conditioning through its mu^-1
        Gram terms; on problems whose Hessian diagonal (nearly) vanishes
        (QP relaxations of LPs, e.g. Maros-Meszaros QFORPLAN: H diag has
        exact zeros, P^-1 ~ 1/rho) the inner Newton loop can stall and
        the BCL loop then shrinks mu into divergence. The full
        quasi-definite factorization does not square conditioning — the
        reference's PrimalDualLDLT solves these (observed: QFORPLAN 164
        outer iters there, 170 here with primaldual). So: when the
        backend was chosen AUTOMATICALLY as schur and the solve returns
        MAX_ITER_REACHED, re-solve once with the primaldual backend and
        keep the better result. Mirrors the spirit of the reference's
        refactorization fallback (dense/solver.hpp:474-532): pay a
        factorization-class fallback only when the fast path provably
        failed.
        """
        from .solver import resolve_backend

        if int(self.results.info.status) != int(
                QPSolverOutput.PROXQP_MAX_ITER_REACHED):
            return
        dt = self.dtype
        f32 = jnp.finfo(dt).bits < 64
        pinned = bool(st.kkt_backend)

        def _with_df(fb, rho):
            """Re-resolve factor_df for a retry config (the automatic rule
            depends on backend and rho, both of which a retry changes)."""
            if self.settings.factor_df is not None:
                return fb
            return fb.replace(factor_df=(
                f32 and fb.high_accuracy and rho < 1e-5
                and resolve_backend(self.spec, fb, dt) == "primaldual"))

        attempts = []
        if (not pinned
                and resolve_backend(self.spec, st, self.dtype) == "schur"):
            fb0 = _with_df(st.replace(kkt_backend="primaldual"),
                           float(self._rho))
            attempts.append(("primaldual fallback", fb0, self._rho))
        retry_backend = st.kkt_backend if pinned else "primaldual"
        if retry_backend == "matrixfree":
            retry_backend = None  # no factor to regularize
        if f32 and st.rho_retry_ladder and retry_backend is not None:
            # rho-escalated LAST-RESORT retry. Primary defense is now the
            # double-float factorization (factor_df, ops/chol.py
            # FullDFLDL), which keeps rho = 1e-6 solvable in f32; the
            # ladder remains for problems that still hit MAX_ITER (e.g.
            # genuinely slow active-set discovery at f32 noise floors).
            # A pinned backend is respected: the retry re-runs the SAME
            # backend with more proximal regularization, never switching.
            # Disable entirely with settings.rho_retry_ladder = False.
            seen_rho = {float(self._rho)}
            for rho_retry in (1e-4, 1e-3):
                rho_eff = max(float(self._rho), rho_retry)
                if rho_eff in seen_rho:
                    continue  # identical re-run would waste a full solve
                seen_rho.add(rho_eff)
                attempts.append(
                    (f"rho={rho_eff:g} {retry_backend} retry",
                     _with_df(st.replace(kkt_backend=retry_backend),
                              rho_eff), rho_eff))
        for label, fb, rho in attempts:
            res2 = _solve_jit(
                self.spec, fb, self._scaled,
                jnp.asarray(x0, dt), jnp.asarray(y0, dt), jnp.asarray(z0, dt),
                jnp.asarray(rho, dt), jnp.asarray(self._mu_eq, dt),
                jnp.asarray(self._mu_in, dt))
            r1, r2 = self.results, res2
            r1max = float(jnp.maximum(r1.info.pri_res, r1.info.dua_res))
            r2max = float(jnp.maximum(r2.info.pri_res, r2.info.dua_res))
            if r1max != r1max:  # NaN-held result loses to anything finite
                r1max = float("inf")
            keep2 = (int(r2.info.status) == int(QPSolverOutput.PROXQP_SOLVED)
                     or (int(r1.info.status)
                         == int(QPSolverOutput.PROXQP_MAX_ITER_REACHED)
                         and r2max < r1max))
            if keep2:
                if self.settings.verbose:
                    print(f"[proxsuite_tpu] automatic backend hit MAX_ITER; "
                          f"{label} kept")
                self.results = res2
                self._used_fallback = True
            if int(self.results.info.status) == int(
                    QPSolverOutput.PROXQP_SOLVED):
                return

    # ------------------------------------------------------- differentiate
    def compute_backward(self, loss_derivative, eps: float = 1e-4,
                         rho_backward: float = 1e-6,
                         mu_backward: float = 1e-6) -> BackwardData:
        """Adjoint gradients at the solved point (compute_ECJ.hpp:29-125).

        loss_derivative is the concatenated (dL_dx, dL_dy, dL_dz)."""
        if self.results is None:
            raise RuntimeError("compute_backward requires a prior solve")
        if int(self.results.info.status) == int(
                QPSolverOutput.PROXQP_DUAL_INFEASIBLE):
            raise ValueError(
                "the QP is dual infeasible; derivatives are not defined")
        sp = self.spec
        ld = jnp.asarray(loss_derivative, self.dtype)
        dL_dx = ld[: sp.n]
        dL_dy = ld[sp.n: sp.n + sp.n_eq]
        dL_dz = ld[sp.n + sp.n_eq:]
        self.backward_data = compute_backward(
            sp, self.settings, self._scaled,
            self.results.x, self.results.y, self.results.z,
            dL_dx, dL_dy, dL_dz,
            eps=eps, rho_backward=rho_backward, mu_backward=mu_backward)
        return self.backward_data

    # ---------------------------------------------------------- cleanup
    def cleanup(self):
        """Reset results and statistics (reference wrapper.hpp:958-996)."""
        self.results = None
        self.backward_data = None
        self._warm = None
        return self


def estimate_nonconvex_rho(H, settings: Settings) -> float:
    """default_rho + |minimal eigenvalue| for nonconvex QPs
    (reference helpers.hpp:174-189 + examples)."""
    min_eig = float(estimate_minimal_eigen_value_of_symmetric_matrix(H))
    return settings.default_rho + abs(min(min_eig, 0.0))
