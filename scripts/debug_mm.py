"""Debug harness for a single Maros-Meszaros problem."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import proxsuite_tpu as pt
from proxsuite_tpu.utils.maros_meszaros import load_preprocessed
from proxsuite_tpu.utils.random_qp import kkt_residuals

name = sys.argv[1] if len(sys.argv) > 1 else "QSCFXM1"
verbose = "--verbose" in sys.argv

EPS = 2e-8
settings = pt.Settings(eps_abs=EPS, eps_rel=0.0,
                       eps_primal_inf=1e-12, eps_dual_inf=1e-12,
                       verbose=verbose)

orig, padded, dims = load_preprocessed(name)
n, n_eq, n_in = dims
print(f"{name}: n={n} n_eq={n_eq} n_in={n_in} "
      f"padded=({padded.H.shape[0]},{padded.A.shape[0]},{padded.C.shape[0]})")

qp = pt.QP(padded.H.shape[0], padded.A.shape[0], padded.C.shape[0],
           settings=settings)
qp.init(H=padded.H, g=padded.g, A=padded.A, b=padded.b,
        C=padded.C, l=padded.l, u=padded.u)
res = qp.solve()
status = int(res.info.status)
print(f"status={pt.QPSolverOutput(status).name} iter={int(res.info.iter)} "
      f"iter_ext={int(res.info.iter_ext)} "
      f"pri={float(res.info.pri_res):.3e} dua={float(res.info.dua_res):.3e} "
      f"mu_updates={int(res.info.mu_updates)}")
x = np.asarray(res.x)[:n]
y = np.asarray(res.y)[:n_eq]
z = np.asarray(res.z)[:n_in]
pri, dua = kkt_residuals(orig, x, y, z)
print(f"orig-space KKT: pri={pri:.3e} dua={dua:.3e}")
