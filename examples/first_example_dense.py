"""First dense QP example (reference examples/cpp/first_example_dense.cpp,
examples/python/overview-simple.py)."""
import _common  # noqa: F401  (path + platform setup)
import jax

jax.config.update("jax_enable_x64", True)

import numpy as np
import proxsuite_tpu as pt


def main():
    H = np.array([[65.0, -22.0, -16.0],
                  [-22.0, 14.0, 7.0],
                  [-16.0, 7.0, 5.0]])
    g = np.array([-13.0, 15.0, 7.0])
    A = np.array([[1.0, 2.0, -1.0]])
    b = np.array([1.0])
    C = np.array([[0.0, 1.0, 1.0]])
    l = np.array([-1.0])
    u = np.array([1.0])

    res = pt.solve(H=H, g=g, A=A, b=b, C=C, l=l, u=u, eps_abs=1e-9)
    print("status :", pt.QPSolverOutput(int(res.info.status)).name)
    print("x      :", np.asarray(res.x))
    print("y      :", np.asarray(res.y))
    print("z      :", np.asarray(res.z))
    print("obj    :", float(res.info.objValue))
    print("pri/dua:", float(res.info.pri_res), float(res.info.dua_res))


if __name__ == "__main__":
    main()
