"""Shared solver types: settings, status enums, results, problem spec.

TPU-native re-design of the reference shared types
(/root/reference/include/proxsuite/proxqp/{settings,results,status}.hpp).
Settings is a static (hashable) dataclass — it parameterizes tracing, so a
given (Settings, problem-shape) pair compiles exactly one XLA program.
Results is a pytree of arrays so batched solves vmap cleanly.
"""
from __future__ import annotations

import dataclasses
import enum
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp


class QPSolverOutput(enum.IntEnum):
    """Solver status. Mirrors reference status.hpp:17-26."""

    PROXQP_SOLVED = 0
    PROXQP_MAX_ITER_REACHED = 1
    PROXQP_PRIMAL_INFEASIBLE = 2
    PROXQP_SOLVED_CLOSEST_PRIMAL_FEASIBLE = 3
    PROXQP_DUAL_INFEASIBLE = 4
    PROXQP_NOT_RUN = 5


class InitialGuess(enum.IntEnum):
    """Initial-guess modes. Mirrors reference status.hpp:28-35."""

    NO_INITIAL_GUESS = 0
    EQUALITY_CONSTRAINED_INITIAL_GUESS = 1
    WARM_START_WITH_PREVIOUS_RESULT = 2
    WARM_START = 3
    COLD_START_WITH_PREVIOUS_RESULT = 4


class HessianType(enum.IntEnum):
    """Structure of the quadratic cost. Mirrors reference settings.hpp:40-46."""

    Zero = 0  # LP fast path: P = rho*I, no H matvecs
    Dense = 1
    Diagonal = 2  # P = diag(H) + rho*I, diagonal solves


class MeritFunctionType(enum.IntEnum):
    """Inner-loop merit function. Mirrors reference settings.hpp:34-38."""

    GPDAL = 0
    PDAL = 1


class DenseBackend(enum.IntEnum):
    """KKT linear-system backend (reference settings.hpp:26-32).

    PrimalDualLDLT maps to the signed blocked LDLT of the full masked
    quasi-definite KKT (kkt_backend="primaldual"); PrimalLDLT maps to the
    condensed Schur-complement Cholesky (kkt_backend="schur") -- both
    fixed-shape refactorize-always TPU designs, not the reference's serial
    rank-update machinery (see ops/kkt.py, ops/chol.py). Automatic picks
    primaldual for Zero-Hessian problems (LPs: P = rho*I makes the Schur
    complement pathological) and schur otherwise.
    """

    Automatic = 0
    PrimalDualLDLT = 1
    PrimalLDLT = 2
    # TPU-native alias kept for round-1 compatibility
    SchurCholesky = 2

    def to_kkt_backend(self) -> str:
        if self == DenseBackend.PrimalDualLDLT:
            return "primaldual"
        if self == DenseBackend.PrimalLDLT:
            return "schur"
        return ""


class EigenValueEstimateMethodOption(enum.IntEnum):
    PowerIteration = 0
    ExactMethod = 1


class SparseBackend(enum.IntEnum):
    """Mirrors reference settings.hpp:19-24. MatrixFree = CG/MINRES path."""

    Automatic = 0
    SparseCholesky = 1
    MatrixFree = 2


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class Settings:
    """Algorithm knobs. Defaults mirror reference settings.hpp:213-316."""

    default_rho: float = 1e-6
    default_mu_eq: float = 1e-3
    default_mu_in: float = 1e-1

    alpha_bcl: float = 0.1
    beta_bcl: float = 0.9

    # NOTE: the reference also carries refactor_dual_feasibility_threshold,
    # refactor_rho_threshold (dead even in the reference: only settings.hpp/
    # serialization/bindings mention them) and the inverse-representation
    # mirrors mu_max_{eq,in}_inv / mu_update_inv_factor (reference tracks mu
    # and mu_inv redundantly, solver.hpp:600-612). This core keeps only the
    # canonical knobs; the proxqp compat layer accepts and maps the mirrors.
    mu_min_eq: float = 1e-9
    mu_min_in: float = 1e-8

    mu_update_factor: float = 0.1

    cold_reset_mu_eq: float = 1.0 / 1.1
    cold_reset_mu_in: float = 1.0 / 1.1

    eps_abs: float = 1e-5
    eps_rel: float = 0.0

    max_iter: int = 10000
    max_iter_in: int = 1500
    safe_guard: int = 10000
    # TPU addition (no reference counterpart): break the inner Newton loop
    # after this many consecutive non-improving iterations. 0 disables the
    # break (reference behavior: only the 1e-11 small-step break applies).
    # Intended for f32 batched solves where one lane sitting at the noise
    # floor above eta_in would serialize the whole batch; harmful at high
    # accuracy -- slow active-set discovery through tiny linesearch steps
    # looks exactly like a stall (QSCFXM1 needs ~50 flat iterations).
    inner_stall_iters: int = 0
    nb_iterative_refinement: int = 10
    # NOTE: the reference's eps_refact triggers a refactorization fallback
    # inside iterative refinement (solver.hpp:474-532). This core has no
    # refactorization fallback BY DESIGN (ops/kkt.py: the Schur factor does
    # not depend on mu, and a data-dependent lax.cond fallback would execute
    # both branches under vmap, serializing batched solves), so the knob
    # does not exist here; the bindings-compat layer accepts and ignores it
    # (proxqp/_compat.py _DEAD_REFERENCE_KNOBS).

    verbose: bool = False
    initial_guess: InitialGuess = InitialGuess.EQUALITY_CONSTRAINED_INITIAL_GUESS
    update_preconditioner: bool = False
    compute_preconditioner: bool = True
    compute_timings: bool = False

    check_duality_gap: bool = False
    eps_duality_gap_abs: float = 1e-4
    eps_duality_gap_rel: float = 0.0

    preconditioner_max_iter: int = 10
    preconditioner_accuracy: float = 1e-3
    eps_primal_inf: float = 1e-4
    eps_dual_inf: float = 1e-4
    bcl_update: bool = True
    merit_function_type: MeritFunctionType = MeritFunctionType.GPDAL
    alpha_gpdal: float = 0.95

    # High-accuracy f32 mode (TPU): residual computations (global stopping
    # residuals + iterative-refinement KKT residuals) run through exact
    # Ozaki-split matvecs combined in double-float (~2^-45 effective, see
    # ops/df.py), so an f32 solve can certify eps_abs down to ~1e-7 without
    # f64 hardware. Reference anchor: the f64 residual/refinement loop
    # (dense/solver.hpp:408-541) is what carries the reference's accuracy.
    high_accuracy: bool = False

    sparse_backend: SparseBackend = SparseBackend.Automatic
    # KKT linear-system backend (reference DenseBackend, settings.hpp:26):
    #  "schur"      - dense Schur-complement Cholesky (the reference's
    #                 PrimalLDLT analogue; throughput engine, ops/kkt.py)
    #  "primaldual" - signed LDLT of the full masked quasi-definite KKT
    #                 (the reference's default PrimalDualLDLT analogue;
    #                 robust at small mu / for LPs -- the Schur complement
    #                 squares conditioning and pollutes dual directions
    #                 with near-null components on rank-deficient duals)
    #  "matrixfree" - MINRES over the masked KKT operator (the reference's
    #                 SparseBackend::MatrixFree equivalent)
    # "" = Automatic: primaldual for Zero-Hessian (LPs), schur otherwise
    # (TPU cost model: schur factors m^2 vs primaldual (n+m)^2 per step).
    kkt_backend: str = ""
    # Double-float KKT factorization (TPU f32 only; the f64 CPU path never
    # needs it). None = automatic: ON for f32 + high_accuracy + primaldual
    # backend when rho < 1e-5 (resolved by the wrapper, which knows rho as
    # a host value). The signed factor of the quasi-definite KKT has
    # element growth ~ ||W||^2/(rho mu); at rho = mu ~ 1e-6 no f32-stored
    # factor retains refinement contraction (ops/chol.py FullDFLDL), so
    # the factor itself runs in double-float -- the TPU equivalent of the
    # reference factoring in f64. Keeps the reference's default rho=1e-6
    # (and so its iteration counts) on ill-conditioned problems instead of
    # escalating rho through the retry ladder.
    factor_df: Optional[bool] = None
    # f32 robustness retry ladder (wrapper._maybe_backend_fallback): on
    # MAX_ITER_REACHED, re-solve with escalated rho (1e-4, then 1e-3).
    # Last-resort behind factor_df; False disables all rho retries (a
    # pinned backend is still honored -- the ladder never switches
    # backend, it only raises rho).
    rho_retry_ladder: bool = True
    primal_infeasibility_solving: bool = False
    frequence_infeasibility_check: int = 1
    default_H_eigenvalue_estimate: float = 0.0

    def replace(self, **kw) -> "Settings":
        return dataclasses.replace(self, **kw)


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class ProblemSpec:
    """Static shape/structure descriptor of a QP family.

    All jitted code is specialized on this: (n, n_eq, n_in, box_constraints,
    hessian_type) fix every array shape in the solver, so one compiled
    executable serves any batch of problems with these dims.
    """

    n: int
    n_eq: int
    n_in: int
    box_constraints: bool = False
    hessian_type: HessianType = HessianType.Dense

    @property
    def n_c(self) -> int:
        """Total inequality rows incl. box rows (reference n_constraints,
        dense/solver.hpp:1108-1111)."""
        return self.n_in + (self.n if self.box_constraints else 0)


class Info(NamedTuple):
    """Per-solve statistics pytree. Mirrors reference results.hpp:27-58."""

    mu_eq: jax.Array
    mu_in: jax.Array
    rho: jax.Array
    iter: jax.Array       # total inner iterations
    iter_ext: jax.Array   # outer (BCL) iterations
    mu_updates: jax.Array
    rho_updates: jax.Array
    status: jax.Array     # QPSolverOutput value
    objValue: jax.Array
    pri_res: jax.Array
    dua_res: jax.Array
    duality_gap: jax.Array
    iterative_residual: jax.Array
    minimal_H_eigenvalue_estimate: jax.Array
    # total MINRES iterations spent by the matrix-free backend across the
    # whole solve (0 for factorization backends). The reference records
    # which sparse backend ran and its refinement stats (results.hpp:44-52);
    # this is the TPU analogue: it tells you when an ill-conditioned
    # problem is crawling inside the iterative solver.
    minres_iters: jax.Array = 0
    # timings in microseconds (reference proxqp/timings.hpp:13-101 +
    # info.setup_time/solve_time/run_time, dense/wrapper.hpp:495-497),
    # filled HOST-side by the wrapper when settings.compute_timings:
    #   setup_time: init/update work (scaling, model ingest)
    #   solve_time: the just-executed solve, EXCLUDING XLA compilation
    #   run_time:   setup_time + solve_time
    # compile_time additionally records the one-off jit compile the first
    # time a (shapes, settings) executable is built -- the reference has
    # no analogue (C++ is AOT); reporting it separately keeps solve_time
    # comparable to the reference's semantics.
    setup_time: float = 0.0
    solve_time: float = 0.0
    run_time: float = 0.0
    compile_time: float = 0.0


class Results(NamedTuple):
    """Solution pytree. Mirrors reference results.hpp:66-204.

    x, y, z are unscaled primal / equality-dual / inequality-dual solutions
    (z includes box multipliers in its tail when box constraints are active).
    se, si are the unscaled optimal shifts to the closest feasible problem.
    """

    x: jax.Array
    y: jax.Array
    z: jax.Array
    se: jax.Array
    si: jax.Array
    info: Info
    # high-accuracy mode: double-float low words of (x, y, z); the full
    # solution is x + x_lo combined in f64 on the host (see ops/df.py).
    # None when high_accuracy is off (None = empty pytree subtree).
    x_lo: Optional[jax.Array] = None
    y_lo: Optional[jax.Array] = None
    z_lo: Optional[jax.Array] = None

    def x_full(self):
        """Host-side f64 solution combining the double-float words."""
        import numpy as np
        v = np.asarray(self.x, np.float64)
        return v if self.x_lo is None else v + np.asarray(self.x_lo,
                                                          np.float64)

    def y_full(self):
        import numpy as np
        v = np.asarray(self.y, np.float64)
        return v if self.y_lo is None else v + np.asarray(self.y_lo,
                                                          np.float64)

    def z_full(self):
        import numpy as np
        v = np.asarray(self.z, np.float64)
        return v if self.z_lo is None else v + np.asarray(self.z_lo,
                                                          np.float64)

    def ha_finalized(self) -> "Results":
        """Combine the double-float words into user-facing f64 arrays.

        A status of PROXQP_SOLVED certifies residuals of the full
        double-float iterate; the f32 high word ALONE carries a
        representation error of O(|x| * eps_f32) per component, which
        propagates through ||H|| into a dual residual that can exceed
        eps_abs by orders of magnitude (observed: CVXQP1_S, 1.7e-4 at
        eps=1e-6). The user-facing contract therefore delivers x/y/z as
        the combined f64 solution whenever low words exist."""
        if self.x_lo is None:
            return self
        return self._replace(
            x=self.x_full(), y=self.y_full(), z=self.z_full(),
            x_lo=None, y_lo=None, z_lo=None)


def infty_norm(v: jax.Array) -> jax.Array:
    """Infinity norm, safe for zero-size arrays (returns 0)."""
    return jnp.max(jnp.abs(v), initial=jnp.zeros((), v.dtype))


def positive_part(v: jax.Array) -> jax.Array:
    """Elementwise max(v, 0). Reference helpers/common.hpp."""
    return jnp.maximum(v, 0)


def negative_part(v: jax.Array) -> jax.Array:
    """Elementwise min(v, 0). Reference helpers/common.hpp."""
    return jnp.minimum(v, 0)


# Sentinel for the reference's "infinite bound" clamping (helpers.hpp:628-649).
INFINITE_BOUND = 1e20
