"""MPC-style warm-started sparse re-solves with the same-pattern fast
update.

`sparse.QP.update` with matrices that keep the stored sparsity pattern
re-applies the existing Ruiz scaling in O(nnz) — no equilibration
re-run, no re-ingest (reference have_same_structure/copy,
sparse/helpers.hpp:414-460). Combined with
WARM_START_WITH_PREVIOUS_RESULT, a tracking problem re-solves in a few
(often 0) iterations per step.
"""
import _common  # noqa: F401  (path + platform setup)
import numpy as np
import scipy.sparse as spa

import proxsuite_tpu as pt
from proxsuite_tpu import sparse
from proxsuite_tpu.types import InitialGuess


def main():
    rng = np.random.default_rng(0)
    n, n_eq, n_in = 120, 30, 40
    Hs = spa.random(n, n, density=0.05, random_state=3,
                    data_rvs=rng.standard_normal).tocsc()
    H = (Hs @ Hs.T + spa.eye(n)).tocsc()
    A = spa.random(n_eq, n, density=0.1, random_state=4).tocsc()
    C = spa.random(n_in, n, density=0.1, random_state=5).tocsc()
    x_ref = rng.standard_normal(n)
    g = rng.standard_normal(n)
    b = A @ x_ref
    Cx = C @ x_ref
    u = Cx + 0.5
    l = Cx - 0.5

    qp = sparse.QP(n, n_eq, n_in, settings=pt.Settings(
        eps_abs=1e-9, sparse_backend=pt.SparseBackend.MatrixFree))
    qp.init(H=H, g=g, A=A, b=b, C=C, l=l, u=u)
    res = qp.solve()
    print(f"cold solve: {int(res.info.iter)} iterations")

    qp.settings = qp.settings.replace(
        initial_guess=InitialGuess.WARM_START_WITH_PREVIOUS_RESULT)
    for step in range(3):
        # drift the objective and a matrix IN PLACE (same pattern)
        g = g + 0.001 * rng.standard_normal(n)
        H2 = H.copy()
        H2.data = H.data * (1.0 + 0.001 * step)
        qp.update(H=H2, g=g)          # fast path: Ruiz scaling reused
        res = qp.solve()
        print(f"tracking step {step}: {int(res.info.iter)} iterations, "
              f"status={int(res.info.status)}")


if __name__ == "__main__":
    main()
