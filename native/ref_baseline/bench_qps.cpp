// Honest CPU baseline: solves a batch of dense QPs with the REAL reference
// ProxQP (compiled from /root/reference/include, unmodified) and reports
// per-QP timing. Mirrors the reference benchmark workload
// (/root/reference/benchmark/timings-parallel.cpp:19-232: 1024 dense QPs,
// serial and OpenMP-parallel) but reads the problems from a file so the
// TPU bench (bench.py) solves the IDENTICAL problems.
//
// File format: int64 B, then B records of
//   int64 n, n_eq, n_in; f64 H(n*n) g(n) A(n_eq*n) b(n_eq) C(n_in*n)
//   u(n_in) l(n_in)   (row-major)
//
// Usage: bench_qps qps.bin [eps_abs] [n_threads]
//   n_threads = 0 (default): serial, one core (the BASELINE.json north star)
#include <cstdio>
#include <cstdint>
#include <cstdlib>
#include <string>
#include <vector>
#include <chrono>
#include <memory>

#ifdef _OPENMP
#include <omp.h>
#endif

#include <proxsuite/proxqp/dense/dense.hpp>

using T = double;
using Mat = Eigen::Matrix<T, Eigen::Dynamic, Eigen::Dynamic, Eigen::RowMajor>;
using Vec = Eigen::Matrix<T, Eigen::Dynamic, 1>;

struct Problem {
  Mat H, A, C;
  Vec g, b, u, l;
};

static Mat read_mat(FILE* f, int64_t r, int64_t c) {
  Mat m(r, c);
  if (fread(m.data(), sizeof(T), (size_t)(r * c), f) != (size_t)(r * c)) {
    fprintf(stderr, "short read\n");
    exit(1);
  }
  return m;
}

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s qps.bin [eps_abs] [n_threads]\n", argv[0]);
    return 1;
  }
  double eps_abs = argc > 2 ? atof(argv[2]) : 1e-9;
  int n_threads = argc > 3 ? atoi(argv[3]) : 0;

  FILE* f = fopen(argv[1], "rb");
  if (!f) { fprintf(stderr, "cannot open %s\n", argv[1]); return 1; }
  int64_t B;
  if (fread(&B, sizeof(int64_t), 1, f) != 1) return 1;
  std::vector<Problem> probs((size_t)B);
  for (int64_t i = 0; i < B; i++) {
    int64_t d[3];
    if (fread(d, sizeof(int64_t), 3, f) != 3) return 1;
    Problem& p = probs[(size_t)i];
    p.H = read_mat(f, d[0], d[0]);
    p.g = read_mat(f, d[0], 1);
    p.A = read_mat(f, d[1], d[0]);
    p.b = read_mat(f, d[1], 1);
    p.C = read_mat(f, d[2], d[0]);
    p.u = read_mat(f, d[2], 1);
    p.l = read_mat(f, d[2], 1);
  }
  fclose(f);

  int64_t n = probs[0].H.rows(), n_eq = probs[0].A.rows(),
          n_in = probs[0].C.rows();

  auto solve_all = [&](int threads) -> std::pair<double, int64_t> {
    // fresh QP objects each run (setup included, like timings-parallel.cpp)
    std::vector<std::unique_ptr<proxsuite::proxqp::dense::QP<T>>> qps;
    qps.reserve((size_t)B);
    for (int64_t i = 0; i < B; i++) {
      qps.emplace_back(std::make_unique<proxsuite::proxqp::dense::QP<T>>(
          n, n_eq, n_in));
      qps.back()->settings.eps_abs = eps_abs;
      qps.back()->settings.eps_rel = 0;
    }
    auto t0 = std::chrono::steady_clock::now();
#ifdef _OPENMP
    if (threads > 0) {
      omp_set_num_threads(threads);
#pragma omp parallel for schedule(dynamic)
      for (int64_t i = 0; i < B; i++) {
        Problem& p = probs[(size_t)i];
        qps[(size_t)i]->init(p.H, p.g, p.A, p.b, p.C, p.l, p.u);
        qps[(size_t)i]->solve();
      }
    } else
#endif
    {
      for (int64_t i = 0; i < B; i++) {
        Problem& p = probs[(size_t)i];
        qps[(size_t)i]->init(p.H, p.g, p.A, p.b, p.C, p.l, p.u);
        qps[(size_t)i]->solve();
      }
    }
    auto t1 = std::chrono::steady_clock::now();
    int64_t solved = 0;
    for (int64_t i = 0; i < B; i++)
      solved += (qps[(size_t)i]->results.info.status ==
                 proxsuite::proxqp::QPSolverOutput::PROXQP_SOLVED);
    return { std::chrono::duration<double, std::milli>(t1 - t0).count(),
             solved };
  };

  auto [ms, solved] = solve_all(n_threads);
  printf("{\"B\": %lld, \"n\": %lld, \"n_eq\": %lld, \"n_in\": %lld, "
         "\"eps_abs\": %g, \"threads\": %d, \"total_ms\": %.3f, "
         "\"ms_per_qp\": %.6f, \"solved\": %lld}\n",
         (long long)B, (long long)n, (long long)n_eq, (long long)n_in,
         eps_abs, n_threads, ms, ms / (double)B, (long long)solved);
  return 0;
}
