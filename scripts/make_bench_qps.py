"""Generate the benchmark QP batch and dump it for the reference baseline.

The SAME problems are solved by bench.py (TPU) and by
native/ref_baseline/bench_qps (the real reference solver on CPU), so the
vs_baseline ratio is apples-to-apples. Workload mirrors the reference
benchmark (/root/reference/benchmark/timings-parallel.cpp:22-35): dense
strongly-convex QPs, n=100, n_eq=n_in=50.
"""
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from proxsuite_tpu.utils.random_qp import dense_strongly_convex_qp

N, N_EQ, N_IN = 100, 50, 50
B_UNIQUE = 128   # unique problems; bench.py tiles them to the full batch


def generate(b_unique: int = B_UNIQUE, n=N, n_eq=N_EQ, n_in=N_IN):
    return [dense_strongly_convex_qp(n, n_eq, n_in, seed=1000 + i)
            for i in range(b_unique)]


def dump(qps, path):
    with open(path, "wb") as f:
        f.write(struct.pack("<q", len(qps)))
        for qp in qps:
            n = qp.H.shape[0]
            f.write(struct.pack("<3q", n, qp.A.shape[0], qp.C.shape[0]))
            for arr in (qp.H, qp.g, qp.A, qp.b, qp.C, qp.u, qp.l):
                f.write(np.ascontiguousarray(arr, np.float64).tobytes())


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_qps.bin"
    qps = generate()
    dump(qps, out)
    print(f"{out}: {len(qps)} QPs (n={N}, n_eq={N_EQ}, n_in={N_IN})")
