"""Dump a Maros-Meszaros problem (or any DenseQPData) to the raw binary
format read by native/ref_baseline/solve_qp.cpp."""
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from proxsuite_tpu.utils.maros_meszaros import load_preprocessed


def dump(qp, path):
    n = qp.H.shape[0]
    n_eq = qp.A.shape[0]
    n_in = qp.C.shape[0]
    with open(path, "wb") as f:
        f.write(struct.pack("<3q", n, n_eq, n_in))
        for arr in (qp.H, qp.g, qp.A, qp.b, qp.C, qp.u, qp.l):
            f.write(np.ascontiguousarray(arr, np.float64).tobytes())


if __name__ == "__main__":
    name = sys.argv[1] if len(sys.argv) > 1 else "QSCFXM1"
    pad = "--pad" in sys.argv
    orig, padded, dims = load_preprocessed(name)
    qp = padded if pad else orig
    out = f"/tmp/{name}{'_pad' if pad else ''}.bin"
    dump(qp, out)
    print(f"{out}: n={qp.H.shape[0]} n_eq={qp.A.shape[0]} n_in={qp.C.shape[0]}")
