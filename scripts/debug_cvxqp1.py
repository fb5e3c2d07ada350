"""Debug the CVXQP1_S f32-HA SOLVED-with-bad-dual-residual failure.

Distinguish: (a) info residuals wrong vs external-on-PADDED problem
(residual computation bug), (b) padded external fine but sliced external
bad (padding leakage), (c) info itself already > eps (status bug).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_COMPILATION_CACHE", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import proxsuite_tpu as pt
from proxsuite_tpu.utils.maros_meszaros import load_preprocessed
from proxsuite_tpu.utils.random_qp import kkt_residuals

orig, padded, dims = load_preprocessed("CVXQP1_S", buckets=(128, 512, 1024))
n, n_eq, n_in = dims
eps = 1e-6
settings = pt.Settings(eps_abs=eps, eps_rel=0.0, max_iter=1000,
                       high_accuracy=True, inner_stall_iters=50,
                       kkt_backend="primaldual",
                       eps_primal_inf=1e-12, eps_dual_inf=1e-12)
qp = pt.QP(padded.H.shape[0], padded.A.shape[0], padded.C.shape[0],
           settings=settings, dtype=np.float32)
qp.init(H=padded.H, g=padded.g, A=padded.A, b=padded.b,
        C=padded.C, l=padded.l, u=padded.u)
res = qp.solve()
print("status:", pt.QPSolverOutput(int(res.info.status)).name)
print("info.iter:", int(res.info.iter), " rho:", float(res.info.rho))
print("info.pri_res: %.3e  info.dua_res: %.3e"
      % (float(res.info.pri_res), float(res.info.dua_res)))

x = np.asarray(res.x, np.float64)
y = np.asarray(res.y, np.float64)
z = np.asarray(res.z, np.float64)

# external on the PADDED problem
pri_p, dua_p = kkt_residuals(padded, x, y, z)
print("external padded : pri=%.3e dua=%.3e" % (pri_p, dua_p))
# external on the SLICED original
pri_s, dua_s = kkt_residuals(orig, x[:n], y[:n_eq], z[:n_in])
print("external sliced : pri=%.3e dua=%.3e" % (pri_s, dua_s))

# where is the dual residual large? componentwise
dr = padded.H @ x + padded.g + padded.A.T @ y + padded.C.T @ z
print("padded dual res: max idx", int(np.argmax(np.abs(dr))),
      "val %.3e" % np.max(np.abs(dr)), " n =", n)
dr_o = orig.H @ x[:n] + orig.g + orig.A.T @ y[:n_eq] + orig.C.T @ z[:n_in]
print("orig dual res: max idx", int(np.argmax(np.abs(dr_o))),
      "val %.3e" % np.max(np.abs(dr_o)))
# padded-var part of padded dual residual
print("padded-vars dual res max: %.3e" % np.max(np.abs(dr[n:])))
# contribution difference: padded rows of A/C acting on original vars?
print("||A[,n:]||, ||C[,n:]|| on orig rows:",
      np.abs(padded.A[:n_eq, n:]).max(), np.abs(padded.C[:n_in, n:]).max())
print("y pad part max: %.3e, z pad part max: %.3e"
      % (np.abs(y[n_eq:]).max() if y.size > n_eq else 0.0,
         np.abs(z[n_in:]).max() if z.size > n_in else 0.0))

# hypothesis: the dropped double-float low words explain the gap
if res.x_lo is not None:
    x2 = np.asarray(res.x, np.float64) + np.asarray(res.x_lo, np.float64)
    y2 = np.asarray(res.y, np.float64) + np.asarray(res.y_lo, np.float64)
    z2 = np.asarray(res.z, np.float64) + np.asarray(res.z_lo, np.float64)
    pri2, dua2 = kkt_residuals(orig, x2[:n], y2[:n_eq], z2[:n_in])
    print("external sliced w/ lo words: pri=%.3e dua=%.3e" % (pri2, dua2))
    print("Hnorm*xnorm*eps_f32 = %.3e"
          % (np.abs(orig.H).max() * np.abs(x2).max() * 6e-8))
