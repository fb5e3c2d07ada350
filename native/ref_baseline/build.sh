#!/bin/bash
# Builds the reference-ProxQP baseline binaries against the read-only
# reference checkout and the tensorflow-bundled Eigen (both already in the
# image; nothing is vendored or copied). Produces:
#   solve_qp        - single-QP oracle/driver (debugging + MM baseline)
#   bench_parallel  - the reference benchmark/timings-parallel.cpp workload
set -e
cd "$(dirname "$0")"
EIGEN=/opt/venv/lib/python3.12/site-packages/tensorflow/include
REF=/root/reference/include
# -march=x86-64-v3 (AVX2+FMA): Eigen-master's AVX512FP16 kernels do not
# compile with this g++, so stay off AVX512.
CXXFLAGS="-O3 -march=x86-64-v3 -DNDEBUG -std=c++17 -Ishim -I$REF -I$EIGEN"

g++ $CXXFLAGS solve_qp.cpp -o solve_qp
g++ $CXXFLAGS -fopenmp bench_qps.cpp -o bench_qps
echo "built: $(ls solve_qp bench_qps 2>/dev/null)"
