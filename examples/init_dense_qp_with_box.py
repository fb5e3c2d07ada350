"""Box-constraint fast path (reference
examples/python/init_dense_qp_with_box.py, benchmark/timings-box-constraints.cpp)."""
import _common  # noqa: F401  (path + platform setup)
import jax

jax.config.update("jax_enable_x64", True)

import numpy as np
import proxsuite_tpu as pt
from proxsuite_tpu.utils.random_qp import dense_box_constrained_qp


def main():
    qp_data = dense_box_constrained_qp(10, 3, 5, seed=1)
    qp = pt.QP(10, 3, 5, box_constraints=True,
               settings=pt.Settings(eps_abs=1e-9))
    qp.init(H=qp_data.H, g=qp_data.g, A=qp_data.A, b=qp_data.b,
            C=qp_data.C, l=qp_data.l, u=qp_data.u,
            l_box=qp_data.l_box, u_box=qp_data.u_box)
    res = qp.solve()
    print("status:", pt.QPSolverOutput(int(res.info.status)).name)
    print("x within box:",
          bool(np.all(np.asarray(res.x) <= qp_data.u_box + 1e-8)),
          bool(np.all(np.asarray(res.x) >= qp_data.l_box - 1e-8)))


if __name__ == "__main__":
    main()
