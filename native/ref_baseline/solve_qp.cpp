// Reference-ProxQP driver: solves a dense QP read from a raw binary file
// and prints status/iterations/residuals. Used as the ground-truth oracle
// for debugging and as the honest CPU baseline (VERDICT round-1 item 4).
//
// Binary format (little-endian): int64 n, n_eq, n_in, then row-major f64
// H(n*n), g(n), A(n_eq*n), b(n_eq), C(n_in*n), u(n_in), l(n_in).
//
// Build: see build.sh (compiles against /root/reference/include and the
// tensorflow-bundled Eigen; no proxsuite code is copied into this repo).
#include <cstdio>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>
#include <chrono>

#include <proxsuite/proxqp/dense/dense.hpp>

using T = double;
using Mat = Eigen::Matrix<T, Eigen::Dynamic, Eigen::Dynamic, Eigen::RowMajor>;
using Vec = Eigen::Matrix<T, Eigen::Dynamic, 1>;

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
    fprintf(stderr, "usage: %s qp.bin [eps_abs] [--verbose]\n", argv[0]);
    return 1;
  }
  double eps_abs = 2e-8;
  bool verbose = false;
  bool closest = false;   // primal_infeasibility_solving
  bool default_inf = false;  // keep the reference's default eps_*_inf=1e-4
  for (int i = 2; i < argc; i++) {
    if (std::string(argv[i]) == "--verbose") verbose = true;
    else if (std::string(argv[i]) == "--closest") closest = true;
    else if (std::string(argv[i]) == "--default-inf") default_inf = true;
    else eps_abs = atof(argv[i]);
  }
  FILE* f = fopen(argv[1], "rb");
  if (!f) { fprintf(stderr, "cannot open %s\n", argv[1]); return 1; }
  int64_t dims[3];
  if (fread(dims, sizeof(int64_t), 3, f) != 3) return 1;
  int64_t n = dims[0], n_eq = dims[1], n_in = dims[2];
  Mat H = read_mat(f, n, n);
  Vec g = read_mat(f, n, 1);
  Mat A = read_mat(f, n_eq, n);
  Vec b = read_mat(f, n_eq, 1);
  Mat C = read_mat(f, n_in, n);
  Vec u = read_mat(f, n_in, 1);
  Vec l = read_mat(f, n_in, 1);
  fclose(f);

  proxsuite::proxqp::dense::QP<T> qp(n, n_eq, n_in);
  qp.settings.eps_abs = eps_abs;
  qp.settings.eps_rel = 0;
  qp.settings.verbose = verbose;
  if (!default_inf) {
    qp.settings.eps_primal_inf = 1e-12;
    qp.settings.eps_dual_inf = 1e-12;
  }
  if (closest) {
    qp.settings.primal_infeasibility_solving = true;
    qp.settings.eps_primal_inf = 1e-4;
    qp.settings.eps_dual_inf = 1e-4;
    qp.settings.default_rho = 5e-5;  // reference qplayer.py:311 forward rho
  }
  auto t0 = std::chrono::steady_clock::now();
  qp.init(H, g, A, b, C, l, u);
  qp.solve();
  auto t1 = std::chrono::steady_clock::now();
  double ms = std::chrono::duration<double, std::milli>(t1 - t0).count();

  // KKT residuals of the returned solution
  Vec x = qp.results.x, y = qp.results.y, z = qp.results.z;
  double pri_eq = n_eq ? (A * x - b).lpNorm<Eigen::Infinity>() : 0.0;
  Vec Cx = C * x;
  double pri_in = 0;
  for (int64_t i = 0; i < n_in; i++) {
    double v = std::max(Cx[i] - u[i], 0.0) + std::min(Cx[i] - l[i], 0.0);
    pri_in = std::max(pri_in, std::abs(v));
  }
  Vec dual = H * x + g + A.transpose() * y + C.transpose() * z;
  double dua = dual.lpNorm<Eigen::Infinity>();

  if (closest) {
    printf("y = ");
    for (int64_t i = 0; i < n_eq; i++) printf("%.9e ", y[i]);
    printf("\nz = ");
    for (int64_t i = 0; i < n_in; i++) printf("%.9e ", z[i]);
    printf("\nse = ");
    for (int64_t i = 0; i < n_eq; i++) printf("%.9e ", qp.results.se[i]);
    printf("\nsi = ");
    for (int64_t i = 0; i < n_in; i++) printf("%.9e ", qp.results.si[i]);
    printf("\nx = ");
    for (int64_t i = 0; i < n; i++) printf("%.9e ", x[i]);
    printf("\n");
  }
  printf("status=%d iter=%zd iter_ext=%zd mu_updates=%zd pri=%.3e dua=%.3e "
         "pri_kkt=%.3e dua_kkt=%.3e obj=%.9e ms=%.3f mu_eq=%.2e mu_in=%.2e\n",
         (int)qp.results.info.status, (ssize_t)qp.results.info.iter,
         (ssize_t)qp.results.info.iter_ext,
         (ssize_t)qp.results.info.mu_updates,
         qp.results.info.pri_res, qp.results.info.dua_res,
         std::max(pri_eq, pri_in), dua, qp.results.info.objValue, ms,
         qp.results.info.mu_eq, qp.results.info.mu_in);
  return 0;
}
