"""Nonconvex QP: estimate the minimal Hessian eigenvalue and augment rho
(reference examples/python/estimate_nonconvex_eigenvalue.py)."""
import _common  # noqa: F401  (path + platform setup)
import jax

jax.config.update("jax_enable_x64", True)

import numpy as np
import proxsuite_tpu as pt
from proxsuite_tpu.utils.eigen import (
    estimate_minimal_eigen_value_of_symmetric_matrix,
)
from proxsuite_tpu.utils.random_qp import dense_strongly_convex_qp


def main():
    rng = np.random.default_rng(0)
    n = 10
    M = rng.standard_normal((n, n))
    H = 0.5 * (M + M.T)  # indefinite
    min_eig = float(estimate_minimal_eigen_value_of_symmetric_matrix(H))
    print("estimated minimal eigenvalue:", min_eig)
    print("exact:", float(np.linalg.eigvalsh(H).min()))

    base = dense_strongly_convex_qp(n, 3, 5, seed=7)
    qp = pt.QP(n, 3, 5, settings=pt.Settings(eps_abs=1e-7))
    qp.init(H=H, g=base.g, A=base.A, b=base.b, C=base.C, l=base.l, u=base.u,
            manual_minimal_H_eigenvalue=min_eig)
    res = qp.solve()
    print("status:", pt.QPSolverOutput(int(res.info.status)).name)


if __name__ == "__main__":
    main()
