"""High-accuracy mode: reference-grade eps=1e-9 on f32-only hardware.

TPU v5e has no f64 units; `Settings(high_accuracy=True)` ingests f64
data as exact (hi, lo) f32 word pairs and runs every cancelling residual
in double-float arithmetic (ops/df.py), certifying external f64 KKT
residuals below 2*eps at eps_abs=1e-9. Solutions carry low words — read
them with `res.x_full()` (f64), not `res.x` (the f32 hi word).
Reference anchor: README.md:141-147 (Maros-Meszaros at 1e-9).
"""
import _common  # noqa: F401  (path + platform setup)
import numpy as np

import proxsuite_tpu as pt
from proxsuite_tpu.utils.random_qp import dense_strongly_convex_qp


def main():
    d = dense_strongly_convex_qp(100, 50, 50, seed=0)
    settings = pt.Settings(eps_abs=1e-9, eps_rel=0.0, high_accuracy=True)
    qp = pt.QP(100, 50, 50, settings=settings, dtype=np.float32)
    qp.init(H=d.H, g=d.g, A=d.A, b=d.b, C=d.C, l=d.l, u=d.u)
    res = qp.solve()

    x, y, z = res.x_full(), res.y_full(), res.z_full()   # f64 solutions
    pri = max(np.abs(d.A @ x - d.b).max(),
              np.maximum(d.C @ x - d.u, 0).max(),
              np.maximum(d.l - d.C @ x, 0).max())
    dua = np.abs(d.H @ x + d.g + d.A.T @ y + d.C.T @ z).max()
    print(f"status: {pt.QPSolverOutput(int(res.info.status)).name}, "
          f"iterations: {int(res.info.iter)}")
    print(f"external f64 KKT residuals (f32 words only!): "
          f"pri {pri:.2e}, dua {dua:.2e}")
    assert max(pri, dua) < 2e-9


if __name__ == "__main__":
    main()
