"""Seeded random QP generators (test/bench oracle).

Counterpart of the reference generators
(/root/reference/include/proxsuite/proxqp/utils/random_qp_problems.hpp):
strongly-convex dense QPs with equality + two-sided inequality constraints,
box-constrained variants, degenerate and unconstrained cases. NumPy-based
(host-side data generation, not part of the compute path).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np


class DenseQPData(NamedTuple):
    H: np.ndarray
    g: np.ndarray
    A: np.ndarray
    b: np.ndarray
    C: np.ndarray
    u: np.ndarray
    l: np.ndarray
    u_box: Optional[np.ndarray] = None
    l_box: Optional[np.ndarray] = None


def positive_definite_rand(rng: np.random.Generator, n: int,
                           cond: float = 1e2, dtype=np.float64) -> np.ndarray:
    """SPD matrix with condition number ~cond
    (reference random_qp_problems.hpp:210)."""
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    eigs = np.logspace(-np.log10(cond), 0.0, n)
    return (Q * eigs) @ Q.T.astype(dtype)


def sparse_matrix_rand(rng: np.random.Generator, rows: int, cols: int,
                       p: float = 0.15, dtype=np.float64) -> np.ndarray:
    """Dense storage of a p-sparse random matrix
    (reference random_qp_problems.hpp:338)."""
    M = rng.standard_normal((rows, cols))
    mask = rng.random((rows, cols)) < p
    return (M * mask).astype(dtype)


def dense_strongly_convex_qp(
    n: int, n_eq: int, n_in: int,
    seed: int = 0,
    sparsity: float = 0.15,
    strong_convexity_factor: float = 1e-2,
    dtype=np.float64,
) -> DenseQPData:
    """Random strongly convex QP with a strictly feasible point
    (reference dense_strongly_convex_qp)."""
    rng = np.random.default_rng(seed)
    H = sparse_matrix_rand(rng, n, n, sparsity, dtype)
    H = 0.5 * (H + H.T)
    H += (abs(min(np.linalg.eigvalsh(H).min(), 0.0)) + strong_convexity_factor) * np.eye(n)
    g = rng.standard_normal(n).astype(dtype)
    A = sparse_matrix_rand(rng, n_eq, n, sparsity, dtype)
    C = sparse_matrix_rand(rng, n_in, n, sparsity, dtype)
    x_sol = rng.standard_normal(n).astype(dtype)
    b = (A @ x_sol).astype(dtype)
    delta_u = rng.random(n_in).astype(dtype)
    delta_l = rng.random(n_in).astype(dtype)
    u = (C @ x_sol + delta_u).astype(dtype)
    l = (C @ x_sol - delta_l - 1.0).astype(dtype)
    return DenseQPData(H=H.astype(dtype), g=g, A=A, b=b, C=C, u=u, l=l)


def dense_box_constrained_qp(
    n: int, n_eq: int, n_in: int, seed: int = 0,
    sparsity: float = 0.15, dtype=np.float64,
) -> DenseQPData:
    """Strongly convex QP with additional box bounds on x."""
    rng = np.random.default_rng(seed + 777)
    base = dense_strongly_convex_qp(n, n_eq, n_in, seed=seed,
                                    sparsity=sparsity, dtype=dtype)
    x_ref = rng.standard_normal(n).astype(dtype)
    u_box = x_ref + 1.0 + rng.random(n).astype(dtype)
    l_box = x_ref - 1.0 - rng.random(n).astype(dtype)
    return base._replace(u_box=u_box.astype(dtype), l_box=l_box.astype(dtype))


def dense_lp(n: int, n_eq: int, n_in: int, seed: int = 0,
             dtype=np.float64) -> DenseQPData:
    """Feasible bounded LP (HessianType.Zero fast path,
    reference benchmark/timings-lp.cpp)."""
    qp = dense_strongly_convex_qp(n, n_eq, n_in, seed=seed, dtype=dtype)
    rng = np.random.default_rng(seed + 1234)
    # bound the LP with a box encoded in C to keep it dense-friendly
    C = np.concatenate([qp.C, np.eye(n, dtype=dtype)], axis=0)
    u = np.concatenate([qp.u, 10.0 * np.ones(n, dtype=dtype)])
    l = np.concatenate([qp.l, -10.0 * np.ones(n, dtype=dtype)])
    return qp._replace(H=np.zeros((n, n), dtype=dtype), C=C, u=u, l=l)


def kkt_residuals(qp: DenseQPData, x, y, z):
    """Independent (NumPy) optimality oracle: unscaled KKT residuals.

    Matches the reference test assertions (test/src/dense_qp_wrapper.cpp):
    pri = max(||Ax-b||_inf, ||[Cx-u]_+ + [Cx-l]_-||_inf) and
    dua = ||Hx + g + A'y + C'z||_inf (box multipliers fold into the C part).
    """
    x, y, z = np.asarray(x), np.asarray(y), np.asarray(z)
    n_in = qp.C.shape[0]
    z_in = z[:n_in]
    pri_eq = np.abs(qp.A @ x - qp.b).max() if qp.A.shape[0] else 0.0
    Cx = qp.C @ x
    pri_in = np.abs(np.maximum(Cx - qp.u, 0) + np.minimum(Cx - qp.l, 0)).max() if n_in else 0.0
    dua_vec = qp.H @ x + qp.g
    if qp.A.shape[0]:
        dua_vec = dua_vec + qp.A.T @ y
    if n_in:
        dua_vec = dua_vec + qp.C.T @ z_in
    if qp.u_box is not None:
        z_box = z[n_in:]
        dua_vec = dua_vec + z_box
        pri_box = np.abs(np.maximum(x - qp.u_box, 0) + np.minimum(x - qp.l_box, 0)).max()
        pri_in = max(pri_in, pri_box)
    dua = np.abs(dua_vec).max()
    return max(pri_eq, pri_in), dua
