"""Debug-only numpy transliteration of the reference QPFunctionFn_infeas
backward (reference bindings/python/proxsuite/torch/qplayer.py:371-610),
fed with our forward solve outputs, compared against finite differences.
Used to decide what the correct extended adjoint is. NOT part of the
framework compute path.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import proxsuite_tpu as pt

H = np.eye(2)
g = np.zeros(2)
A = np.array([[1.0, 0.2]])
b = np.array([1.0])
C = np.array([[1.0, 0.1], [0.0, 1.0]])
u = np.array([-1.0, 2.0])
l = np.array([-5.0, -2.0])
n, n_eq, n_in = 2, 1, 2


def solve_onesided(Hv, gv, Av, bv, Cv, lv, uv, eps=1e-10, max_iter=2000):
    """Forward exactly like the reference infeas layer: one-sided QP."""
    Ct = np.vstack([-Cv, Cv])
    ut = np.concatenate([-lv, uv])
    lt = -1e20 * np.ones(2 * n_in)
    s = pt.Settings(eps_abs=eps, max_iter=max_iter, default_rho=5e-5,
                    primal_infeasibility_solving=True)
    qp = pt.QP(n, n_eq, 2 * n_in, settings=s)
    qp.init(H=Hv, g=gv, A=Av, b=bv, C=Ct, l=lt, u=ut)
    r = qp.solve()
    return (np.asarray(r.x), np.asarray(r.y), np.asarray(r.z),
            np.asarray(r.se), np.asarray(r.si), Ct, ut)


def ref_backward(x, y, z_os, se, si_os, Ct, ut,
                 dl_dx, dl_dy, dl_dnu, dl_dse, dl_dsi, reg=1e-9):
    """Reference backward, one-sided (z_os/si_os are one-sided)."""
    dim, neq, nin = n, n_eq, 2 * n_in
    slack = Ct @ x - ut
    P_1 = (np.minimum(slack, 0.0) + z_os) >= 0.0
    P_2 = slack <= 0.0
    P_2_c_s_i = np.maximum(slack, 0.0)
    D_1 = np.diag(P_1.astype(float))
    D_1_c = np.eye(nin) - D_1
    D_2 = np.diag(P_2.astype(float))
    D_2_c = np.eye(nin) - D_2

    n_row = dim + 2 * neq + 2 * nin
    n_col = 2 * dim + 2 * nin + neq + dim
    K = np.zeros((n_row, n_col))
    K[:dim, :dim] = H
    K[:dim, dim:dim + neq] = A.T
    K[dim:dim + neq, :dim] = A
    K[dim + neq + nin:dim + 2 * neq + nin, dim:dim + neq] = -np.eye(neq)
    K[dim + neq + nin:dim + 2 * neq + nin,
      dim + neq + 2 * nin:2 * dim + neq + 2 * nin] = A
    K[:dim, dim + neq:dim + neq + nin] = Ct.T
    K[dim + neq:dim + neq + nin, :dim] = Ct
    K[dim + 2 * neq + nin:, dim + neq:dim + neq + nin] = -np.eye(nin)
    K[dim + neq:dim + neq + nin, dim + neq + nin:dim + neq + 2 * nin] = D_1_c
    K[dim + 2 * neq + nin:, dim + neq + nin:dim + neq + 2 * nin] = \
        -np.multiply(np.diag(D_1)[:, None], D_2)
    K[dim + 2 * neq + nin:, dim + neq + 2 * nin + dim:] = \
        np.multiply(np.diag(D_2_c)[:, None], Ct)

    rhs = np.zeros(n_row)
    rhs[:dim] = -dl_dx
    rhs[dim:dim + neq] = -dl_dy
    active = (-z_os[:n_in] + z_os[n_in:]) >= 0
    r3 = np.zeros(nin)
    r3[:n_in][~active] = dl_dnu[~active]
    r3[n_in:][active] = -dl_dnu[active]
    rhs[dim + neq:dim + neq + nin] = r3
    rhs[dim + neq + nin:dim + 2 * neq + nin] = -dl_dse
    r5 = np.zeros(nin)
    r5[:n_in][~active] = dl_dsi[~active]
    r5[n_in:][active] = -dl_dsi[active]
    rhs[dim + 2 * neq + nin:] = r5

    w, *_ = np.linalg.lstsq(K, rhs, rcond=None)
    dx = w[:dim]
    dlam = w[dim:dim + neq]
    dnu = w[dim + neq:dim + neq + nin]
    b5 = w[dim + neq + 2 * nin:2 * dim + neq + 2 * nin]
    b6 = w[2 * dim + neq + 2 * nin:]

    dQ = 0.5 * (np.outer(dx, x) + np.outer(x, dx))
    dp = dx
    dA = np.outer(dlam, x) + np.outer(y, dx) + np.outer(se, b5)
    db = -dlam
    dG = (np.outer(dnu, x) + np.outer(z_os, dx)
          + np.outer(P_2_c_s_i, b6))
    dhs = -dnu
    # reference mapping: dG_two = dG[n_in:], dl = -dhs[:n_in], du = dhs[n_in:]
    return dict(dQ=dQ, dp=dp, dA=dA, db=db,
                dG_ref=dG[n_in:], dG_sum=-dG[:n_in] + dG[n_in:],
                dl=-dhs[:n_in], du=dhs[n_in:], dx=dx, dlam=dlam, dnu=dnu,
                b5=b5, b6=b6)


x, y, z_os, se, si_os, Ct, ut = solve_onesided(H, g, A, b, C, l, u)
print("x", x, "y", y)
print("z_os", z_os)

# loss: pick a single output component via cotangents; compare dL/dA[0,j]
for label, cots in (
        ("x0", (np.array([1.0, 0]), np.zeros(1), np.zeros(2), np.zeros(1),
                np.zeros(2))),
        ("se0", (np.zeros(2), np.zeros(1), np.zeros(2), np.array([1.0]),
                 np.zeros(2))),
        ("si0", (np.zeros(2), np.zeros(1), np.zeros(2), np.zeros(1),
                 np.array([1.0, 0]))),
):
    gr = ref_backward(x, y, z_os, se, si_os, Ct, ut, *cots)
    # FD through the one-sided forward on the quantity
    eps = 1e-6
    idx = {"x0": 0, "se0": 0, "si0": 0}[label]
    def val(Av):
        xx, yy, zz, ss, sii, _, _ = solve_onesided(H, g, Av, b, C, l, u)
        if label == "x0":
            return xx[0]
        if label == "se0":
            return ss[0]
        si2 = -sii[:n_in] + sii[n_in:]
        return si2[0]
    for j in range(2):
        Ap = A.copy(); Ap[0, j] += eps
        Am = A.copy(); Am[0, j] -= eps
        fd = (val(Ap) - val(Am)) / (2 * eps)
        print(f"d{label}/dA[0,{j}]: fd={fd:+.6e} ref={gr['dA'][0, j]:+.6e}")


# --- deeper: dp vs FD, and kappa-sensitivity ---
print("\n--- dp (loss=x0) vs FD, and kappa-sensitivity of ref grads ---")
cots = (np.array([1.0, 0]), np.zeros(1), np.zeros(2), np.zeros(1), np.zeros(2))
gr = ref_backward(x, y, z_os, se, si_os, Ct, ut, *cots)
print("dx(adjoint) =", gr["dx"], " dlam =", gr["dlam"])
print("b5 =", gr["b5"], " b6 =", gr["b6"])
eps = 1e-6
for j in range(2):
    gp = g.copy(); gp[j] += eps
    gm = g.copy(); gm[j] -= eps
    fp = solve_onesided(H, gp, A, b, C, l, u)[0][0]
    fm = solve_onesided(H, gm, A, b, C, l, u)[0][0]
    fd = (fp - fm) / (2 * eps)
    print(f"dx0/dp[{j}]: fd={fd:+.6e} ref={gr['dp'][j]:+.6e}")

# scale y,z by 10 (simulating more outer iterations) and recompute
gr10 = ref_backward(x, 10 * y, 10 * z_os, se, si_os, Ct, ut, *cots)
print("dA with 10x multipliers:", gr10["dA"], "vs", gr["dA"])
