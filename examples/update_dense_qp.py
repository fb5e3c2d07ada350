"""Model updates and warm starts (reference examples/python/
update_dense_qp.py + update_dense_qp_ws_previous_result.py analogues)."""
import _common  # noqa: F401
import numpy as np

import proxsuite_tpu as proxsuite
from proxsuite_tpu.utils.random_qp import dense_strongly_convex_qp

d = dense_strongly_convex_qp(20, 5, 8, seed=0)
qp = proxsuite.proxqp.dense.QP(20, 5, 8)
qp.settings.eps_abs = 1e-9
qp.init(d.H, d.g, d.A, d.b, d.C, d.l, d.u)
qp.solve()
print("first solve: ", qp.results.info.status.name,
      "iters:", qp.results.info.iter)

# update only the linear cost; reuse the preconditioner
qp.update(g=d.g * 1.1)
qp.solve()
print("after update: ", qp.results.info.status.name,
      "iters:", qp.results.info.iter)

# warm-start the next solve from the previous result: near-zero iterations
qp.settings.initial_guess = (
    proxsuite.proxqp.InitialGuess.WARM_START_WITH_PREVIOUS_RESULT)
qp.solve()
print("warm re-solve:", qp.results.info.status.name,
      "iters:", qp.results.info.iter)

# explicit warm start with user-provided x, y, z
x, y, z = qp.results.x, qp.results.y, qp.results.z
qp.solve(x, y, z)
print("explicit warm:", qp.results.info.status.name,
      "iters:", qp.results.info.iter)
