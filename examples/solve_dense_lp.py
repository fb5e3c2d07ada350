"""LP fast path: HessianType.Zero skips every Hessian product
(reference examples/python/solve_dense_lp.py, benchmark/timings-lp.cpp)."""
import _common  # noqa: F401  (path + platform setup)
import jax

jax.config.update("jax_enable_x64", True)

import numpy as np
import proxsuite_tpu as pt
from proxsuite_tpu.utils.random_qp import dense_lp


def main():
    qp = dense_lp(20, 5, 10, seed=0)
    res = pt.solve(H=None, g=qp.g, A=qp.A, b=qp.b, C=qp.C, l=qp.l, u=qp.u,
                   hessian_type=pt.HessianType.Zero, eps_abs=1e-9)
    print("status:", pt.QPSolverOutput(int(res.info.status)).name,
          "iter:", int(res.info.iter))
    print("objective:", float(res.info.objValue))


if __name__ == "__main__":
    main()
