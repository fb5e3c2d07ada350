"""Solving primal-infeasible QPs to the closest feasible problem
(reference doc/2-ProxQP_api.md 'solving the closest feasible problem';
settings.primal_infeasibility_solving, solver.hpp:1581-1595)."""
import _common  # noqa: F401
import numpy as np

import proxsuite_tpu as proxsuite

# contradictory constraints: x0 <= -1 and x0 + 0.5 x1 >= 1 with x1 <= 0.
# (note: a perfectly antisymmetric C gives ||C^T 1|| = 0, for which the
# closest-feasible stopping tolerance degenerates to 0 in the reference
# too -- solver.hpp:1581-1595)
H = np.eye(2)
g = np.array([0.0, 1.0])
C = np.array([[1.0, 0.0], [-1.0, -0.5], [0.0, 1.0]])
u = np.array([-1.0, -1.0, 0.0])
l = np.array([-1e20, -1e20, -1e20])

# plain solve detects infeasibility
res = proxsuite.proxqp.dense.solve(H=H, g=g, C=C, l=l, u=u, eps_abs=1e-9)
print("plain:", res.info.status.name)

# with primal_infeasibility_solving the solver returns the solution of the
# closest feasible QP plus the shifts se/si
res = proxsuite.proxqp.dense.solve(
    H=H, g=g, C=C, l=l, u=u, eps_abs=1e-9,
    primal_infeasibility_solving=True)
print("closest-feasible:", res.info.status.name)
print("x:", res.x, "inequality shift si:", res.si)
