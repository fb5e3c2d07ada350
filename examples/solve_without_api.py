"""Stateless one-shot solves (reference examples/python/solve_without_api.py
and solve_without_api_and_option.py analogues)."""
import _common  # noqa: F401
import numpy as np

import proxsuite_tpu as proxsuite
from proxsuite_tpu.utils.random_qp import dense_strongly_convex_qp

d = dense_strongly_convex_qp(15, 4, 6, seed=3)

# plain stateless call
res = proxsuite.proxqp.dense.solve(
    H=d.H, g=d.g, A=d.A, b=d.b, C=d.C, l=d.l, u=d.u)
print("default settings:", res.info.status.name, "iters:", res.info.iter)

# with options
res = proxsuite.proxqp.dense.solve(
    H=d.H, g=d.g, A=d.A, b=d.b, C=d.C, l=d.l, u=d.u,
    eps_abs=1e-9,
    initial_guess=proxsuite.proxqp.InitialGuess.NO_INITIAL_GUESS,
    check_duality_gap=True)
print("tight + duality gap:", res.info.status.name,
      "gap:", res.info.duality_gap)

# None blocks are allowed: unconstrained problem
res = proxsuite.proxqp.dense.solve(H=d.H, g=d.g)
print("unconstrained:", res.info.status.name, "x[:3]:", res.x[:3])
