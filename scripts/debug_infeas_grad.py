"""Isolate which cotangent path of the infeasible QPLayer backward is wrong:
probe dL/dA for L = x_k, L = se_k, L = si_k separately against FD."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import torch

from proxsuite_tpu.torch.qplayer import QPFunction

# x in R^2, min ||x||^2/2 s.t. x0 = 1 (eq), x0 <= -1, -2 <= x1 <= 2 (ineq)
H = np.eye(2)
g = np.zeros(2)
A = np.array([[1.0, 0.2]])
b = np.array([1.0])
C = np.array([[1.0, 0.1], [0.0, 1.0]])
u = np.array([-1.0, 2.0])
l = np.array([-5.0, -2.0])

layer = QPFunction(eps=1e-10, maxIter=1000, structural_feasibility=False,
                   eps_backward=1e-10)
t = lambda a: torch.from_numpy(np.asarray(a)).unsqueeze(0)


def outs(Av):
    x, y, z, se, si = layer(t(H), t(g), Av, t(b), t(C), t(l), t(u))
    return x, se, si


x, se, si = outs(t(A))
print("x =", x.detach().numpy(), "se =", se.detach().numpy(),
      "si =", si.detach().numpy())

eps = 1e-6
for (label, pick) in (("x0", lambda o: o[0][0, 0]),
                      ("x1", lambda o: o[0][0, 1]),
                      ("se0", lambda o: o[1][0, 0]),
                      ("si0", lambda o: o[2][0, 0]),
                      ("si1", lambda o: o[2][0, 1])):
    for j in range(2):
        At = t(A).clone().requires_grad_(True)
        val = pick(outs(At))
        val.backward()
        an = float(At.grad[0, 0, j])
        Ap = A.copy(); Ap[0, j] += eps
        Am = A.copy(); Am[0, j] -= eps
        fd = (float(pick(outs(t(Ap)))) - float(pick(outs(t(Am))))) / (2 * eps)
        flag = "OK " if abs(fd - an) < 1e-4 * max(1.0, abs(fd)) else "BAD"
        print(f"{flag} d{label}/dA[0,{j}]: fd={fd:+.6e} analytic={an:+.6e}")
