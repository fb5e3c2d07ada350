"""Drop-in module layout compatibility with the reference Python bindings.

The reference wheel exposes `proxsuite.proxqp` with `dense` / `sparse`
submodules and top-level enums (bindings/python/src/expose-all.cpp:76-123).
This package mirrors that exact surface on top of the TPU-native core, so

    import proxsuite_tpu as proxsuite
    qp = proxsuite.proxqp.dense.QP(n, n_eq, n_in)
    qp.init(H, g, A, b, C, l, u)
    qp.settings.eps_abs = 1e-9
    qp.solve()
    qp.results.x

works exactly as with the reference bindings.
"""
from ..types import (
    DenseBackend,
    EigenValueEstimateMethodOption,
    HessianType,
    InitialGuess,
    MeritFunctionType,
    QPSolverOutput,
    SparseBackend,
)
from . import dense, sparse

__all__ = [
    "dense",
    "sparse",
    "InitialGuess",
    "QPSolverOutput",
    "HessianType",
    "MeritFunctionType",
    "DenseBackend",
    "SparseBackend",
    "EigenValueEstimateMethodOption",
]
