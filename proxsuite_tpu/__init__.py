"""proxsuite_tpu: a TPU-native QP/LP solver framework.

Brand-new implementation of the ProxQP algorithm family (primal-dual
proximal augmented Lagrangian) designed for JAX/XLA on TPU: fixed shapes,
batched MXU-friendly factorizations, vmap batching and shard_map scale-out.
Capabilities mirror the reference Simple-Robotics/proxsuite (v0.7.2).
"""
from .api import solve
from .wrapper import QP
from . import proxqp  # reference-compatible module layout (proxqp.dense/...)
from .types import (
    DenseBackend,
    EigenValueEstimateMethodOption,
    HessianType,
    InitialGuess,
    Info,
    MeritFunctionType,
    ProblemSpec,
    QPSolverOutput,
    Results,
    Settings,
    SparseBackend,
)

__version__ = "0.1.0"

__all__ = [
    "solve",
    "QP",
    "Settings",
    "Results",
    "Info",
    "ProblemSpec",
    "QPSolverOutput",
    "InitialGuess",
    "HessianType",
    "MeritFunctionType",
    "DenseBackend",
    "SparseBackend",
    "EigenValueEstimateMethodOption",
    "__version__",
]
