"""Ragged batch: solve QPs of DIFFERENT dimensions in one call.

The reference's solve_in_parallel takes a vector of independently sized
QPs (parallel/qp_solve.hpp:17-60). Here each QP is neutrally padded to
the next shape bucket and each bucket solves as one vmapped XLA program,
so a mixed-dims batch costs a handful of compiles instead of one per QP.
"""
import _common  # noqa: F401  (path + platform setup)
import numpy as np

from proxsuite_tpu.parallel.batch import solve_in_parallel_ragged
from proxsuite_tpu.utils.random_qp import dense_strongly_convex_qp


def main():
    problems = []
    datas = []
    for i, (n, n_eq, n_in) in enumerate([(10, 2, 4), (24, 6, 9),
                                         (57, 12, 20), (24, 6, 9)]):
        d = dense_strongly_convex_qp(n, n_eq, n_in, seed=i)
        datas.append(d)
        problems.append(dict(H=d.H, g=d.g, A=d.A, b=d.b, C=d.C,
                             u=d.u, l=d.l))

    results = solve_in_parallel_ragged(
        problems,
        rho=[1e-6, 1e-5, None, None],      # optional per-QP proximal rho
        eps_abs=1e-9)

    for i, (res, d) in enumerate(zip(results, datas)):
        x, y, z = np.asarray(res.x), np.asarray(res.y), np.asarray(res.z)
        pri = max(np.abs(d.A @ x - d.b).max(),
                  np.maximum(d.C @ x - d.u, 0).max(),
                  np.maximum(d.l - d.C @ x, 0).max())
        dua = np.abs(d.H @ x + d.g + d.A.T @ y + d.C.T @ z).max()
        print(f"QP {i} (n={len(x)}): status={int(res.info.status)} "
              f"iter={int(res.info.iter)} pri={pri:.1e} dua={dua:.1e}")
        assert max(pri, dua) < 2e-9


if __name__ == "__main__":
    main()
