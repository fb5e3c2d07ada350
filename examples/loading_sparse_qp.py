"""Sparse-input QPs (reference examples/python/loading_sparse_qp.py /
update_sparse_qp.py analogues): scipy.sparse in, TPU-first backend choice
(dense Schur for moderate sizes, matrix-free MINRES for large ones)."""
import _common  # noqa: F401
import numpy as np
import scipy.sparse as sp

import proxsuite_tpu as proxsuite
from proxsuite_tpu.utils.random_qp import dense_strongly_convex_qp

d = dense_strongly_convex_qp(30, 8, 12, seed=4)
H = sp.csc_matrix(d.H)
A = sp.csc_matrix(d.A)
C = sp.csc_matrix(d.C)

qp = proxsuite.proxqp.sparse.QP(30, 8, 12)
qp.settings.eps_abs = 1e-9
qp.init(H, d.g, A, d.b, C, d.l, d.u)
qp.solve()
print("sparse QP:", qp.results.info.status.name, "iters:", qp.results.info.iter)

# force the matrix-free MINRES backend (reference SparseBackend::MatrixFree)
qp2 = proxsuite.proxqp.sparse.QP(30, 8, 12)
qp2.settings.sparse_backend = proxsuite.proxqp.SparseBackend.MatrixFree
qp2.settings.eps_abs = 1e-7
qp2.init(H, d.g, A, d.b, C, d.l, d.u)
qp2.solve()
print("matrix-free:", qp2.results.info.status.name)

# same-pattern update
qp.update(g=d.g * 2.0)
qp.solve()
print("after update:", qp.results.info.status.name)
