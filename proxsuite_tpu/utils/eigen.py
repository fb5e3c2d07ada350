"""Symmetric-matrix eigenvalue estimation (nonconvex QP support).

Counterpart of reference power iteration / minimal-eigenvalue estimation
(/root/reference/include/proxsuite/proxqp/dense/helpers.hpp:24-166):
used to augment rho so H + rho*I is positive definite for nonconvex QPs
(helpers.hpp:174-189).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..types import EigenValueEstimateMethodOption, infty_norm


def power_iteration(H: jax.Array, accuracy: float = 1e-6,
                    max_iter: int = 1000) -> jax.Array:
    """Dominant eigenvalue of symmetric H (helpers.hpp:29-64)."""
    n = H.shape[0]
    dtype = H.dtype
    v0 = jnp.full((n,), 1.0 / jnp.sqrt(jnp.asarray(n, dtype)), dtype)
    Hv0 = H @ v0

    def body(carry):
        v, Hv, eig, err, it = carry
        v = Hv / jnp.linalg.norm(Hv)
        Hv = H @ v
        eig = v @ Hv
        err = infty_norm(Hv - eig * v)
        return v, Hv, eig, err, it + 1

    def cond(carry):
        _, _, _, err, it = carry
        return jnp.logical_and(err > accuracy, it < max_iter)

    init = (v0, Hv0, jnp.asarray(0.0, dtype), jnp.asarray(jnp.inf, dtype),
            jnp.asarray(0, jnp.int32))
    _, _, eig, _, _ = lax.while_loop(cond, body, init)
    return eig


def min_eigenvalue_via_power_iteration(
    H: jax.Array, max_eig: jax.Array,
    accuracy: float = 1e-6, max_iter: int = 1000) -> jax.Array:
    """Minimal eigenvalue via power iteration on max_eig*I - H
    (helpers.hpp:65-113)."""
    n = H.shape[0]
    shifted_dominant = power_iteration(
        max_eig * jnp.eye(n, dtype=H.dtype) - H, accuracy, max_iter)
    return max_eig - shifted_dominant


def estimate_minimal_eigen_value_of_symmetric_matrix(
    H,
    estimate_method_option: EigenValueEstimateMethodOption =
        EigenValueEstimateMethodOption.PowerIteration,
    power_iteration_accuracy: float = 1e-6,
    nb_power_iteration: int = 1000,
) -> jax.Array:
    """Reference estimate_minimal_eigen_value_of_symmetric_matrix
    (helpers.hpp:123-166)."""
    H = jnp.asarray(H)
    if estimate_method_option == EigenValueEstimateMethodOption.ExactMethod:
        return jnp.min(jnp.linalg.eigvalsh(H))
    max_eig = power_iteration(H, power_iteration_accuracy, nb_power_iteration)
    min_eig = min_eigenvalue_via_power_iteration(
        H, max_eig, power_iteration_accuracy, nb_power_iteration)
    return jnp.minimum(min_eig, max_eig)
