"""Smallest possible end-to-end QP solve (reference
examples/python/overview-simple.py analogue): drop-in proxqp API."""
import _common  # noqa: F401
import numpy as np

import proxsuite_tpu as proxsuite


def generate_mixed_qp(n, seed=1):
    rng = np.random.default_rng(seed)
    m = int(n / 4) + int(n / 4)
    P = rng.standard_normal((n, n))
    P = P @ P.T + 1e-2 * np.eye(n)
    q = rng.standard_normal(n)
    A_full = rng.standard_normal((m, n))
    delta = rng.random(m)
    x0 = rng.standard_normal(n)
    u = A_full @ x0 + delta
    l = A_full @ x0 - delta - 1.0
    n_eq = int(n / 4)
    return P, q, A_full[:n_eq], u[:n_eq], A_full[n_eq:], u[n_eq:], l[n_eq:]


H, g, A, b, C, u, l = generate_mixed_qp(20)

qp = proxsuite.proxqp.dense.QP(20, A.shape[0], C.shape[0])
qp.settings.eps_abs = 1e-9
qp.init(H, g, A, b, C, l, u)
qp.solve()
print("status:", qp.results.info.status.name)
print("optimal x[:5]:", qp.results.x[:5])
print("primal residual:", qp.results.info.pri_res)
