// proxqp_cpu: native CPU ProxQP-class dense QP solver.
//
// Same algorithm as the JAX/TPU path (proxsuite_tpu/solver.py): Ruiz
// equilibration, BCL outer loop, semismooth Newton inner loop with exact
// linesearch, and a Schur-complement Cholesky KKT solve (P = H + rho*I
// factored once, masked active-set Schur complement per Newton step).
// This is an original design (see ops/kkt.py docstring), not a port of the
// reference's LDLT-with-rank-updates (reference behavior spec:
// /root/reference/include/proxsuite/proxqp/dense/solver.hpp).
//
// Roles in the framework:
//  * low-latency CPU backend for single/small QPs (TPU dispatch overhead
//    dominates below ~1k batch);
//  * OpenMP batched solver = measured 1-core/N-core CPU baseline for
//    bench.py (the reference cannot be built here: no Eigen in image).
//
// Build: make -C native   (g++ -O3 -march=native -fopenmp, C API, ctypes)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

using std::size_t;

constexpr double kInfBound = 1e20;

struct Settings {
  double eps_abs = 1e-5;
  double eps_rel = 0.0;
  double rho = 1e-6;
  double mu_eq = 1e-3;
  double mu_in = 1e-1;
  double alpha_bcl = 0.1;
  double beta_bcl = 0.9;
  double mu_update_factor = 0.1;
  double mu_min_eq = 1e-9;
  double mu_min_in = 1e-8;
  double cold_reset_mu_eq = 1.0 / 1.1;
  double cold_reset_mu_in = 1.0 / 1.1;
  double alpha_gpdal = 0.95;  // merit: GPDAL (alpha<1) or PDAL (alpha=1)
  int max_iter = 10000;
  int max_iter_in = 1500;
  int nb_iterative_refinement = 10;
  int preconditioner_max_iter = 10;
  double preconditioner_accuracy = 1e-3;
};

struct Info {
  int status = 1;  // 0 solved, 1 max-iter
  int iter = 0;
  int iter_ext = 0;
  double pri_res = 0, dua_res = 0, obj = 0;
};

inline double inf_norm(const double* v, int n) {
  double m = 0;
  for (int i = 0; i < n; ++i) m = std::max(m, std::fabs(v[i]));
  return m;
}

// in-place lower Cholesky of row-major n x n SPD matrix
inline bool cholesky(double* a, int n) {
  for (int j = 0; j < n; ++j) {
    double d = a[j * n + j];
    for (int k = 0; k < j; ++k) d -= a[j * n + k] * a[j * n + k];
    if (d <= 0) return false;
    d = std::sqrt(d);
    a[j * n + j] = d;
    const double inv = 1.0 / d;
    for (int i = j + 1; i < n; ++i) {
      double s = a[i * n + j];
      const double* ri = a + i * n;
      const double* rj = a + j * n;
      for (int k = 0; k < j; ++k) s -= ri[k] * rj[k];
      a[i * n + j] = s * inv;
    }
  }
  return true;
}

inline void chol_solve(const double* L, double* x, int n) {
  for (int i = 0; i < n; ++i) {
    double s = x[i];
    const double* ri = L + i * n;
    for (int k = 0; k < i; ++k) s -= ri[k] * x[k];
    x[i] = s / ri[i];
  }
  for (int i = n - 1; i >= 0; --i) {
    double s = x[i];
    for (int k = i + 1; k < n; ++k) s -= L[k * n + i] * x[k];
    x[i] = s / L[i * n + i];
  }
}

// y += alpha * M x   (M row-major rows x cols)
inline void gemv(const double* M, const double* x, double* y, int rows,
                 int cols, double alpha, bool accumulate) {
  for (int i = 0; i < rows; ++i) {
    double s = 0;
    const double* ri = M + (size_t)i * cols;
    for (int j = 0; j < cols; ++j) s += ri[j] * x[j];
    y[i] = (accumulate ? y[i] : 0.0) + alpha * s;
  }
}

// y += alpha * M' x
inline void gemv_t(const double* M, const double* x, double* y, int rows,
                   int cols, double alpha, bool accumulate) {
  if (!accumulate) std::memset(y, 0, sizeof(double) * cols);
  for (int i = 0; i < rows; ++i) {
    const double xi = alpha * x[i];
    if (xi == 0.0) continue;
    const double* ri = M + (size_t)i * cols;
    for (int j = 0; j < cols; ++j) y[j] += xi * ri[j];
  }
}

struct Work {
  int n, n_eq, n_in, m;
  // scaled model
  std::vector<double> H, g, A, b, C, u, l;
  std::vector<double> dx_, dy_, dz_;  // Ruiz scalings
  double cc = 1.0;
  // factorization
  std::vector<double> LP;            // chol(P)
  std::vector<double> Kaa, Kac, Kcc; // Gram blocks
  std::vector<double> S;             // Schur workspace (m x m)
  // iterates and residuals
  std::vector<double> x, y, z, xp, yp, zp;
  std::vector<double> ru, rl, se, dr;
  std::vector<uint8_t> up, low, act;
  std::vector<double> rx, ry, rz, sx, sy, sz, t1, t2, t3, tn;
  std::vector<double> Cdx, Adx, Hdx, ATdy, CTdz;
  std::vector<double> alphas;

  void resize(int n_, int ne, int ni) {
    n = n_; n_eq = ne; n_in = ni; m = ne + ni;
    H.resize((size_t)n * n); g.resize(n);
    A.resize((size_t)ne * n); b.resize(ne);
    C.resize((size_t)ni * n); u.resize(ni); l.resize(ni);
    dx_.assign(n, 1.0); dy_.assign(ne, 1.0); dz_.assign(ni, 1.0); cc = 1.0;
    LP.resize((size_t)n * n);
    Kaa.resize((size_t)ne * ne); Kac.resize((size_t)ne * ni);
    Kcc.resize((size_t)ni * ni); S.resize((size_t)m * m);
    x.assign(n, 0); y.assign(ne, 0); z.assign(ni, 0);
    xp = x; yp = y; zp = z;
    ru.assign(ni, 0); rl.assign(ni, 0); se.assign(ne, 0); dr.assign(n, 0);
    up.assign(ni, 0); low.assign(ni, 0); act.assign(ni, 0);
    rx.resize(n); ry.resize(ne); rz.resize(ni);
    sx.resize(n); sy.resize(ne); sz.resize(ni);
    t1.resize(n); t2.resize(ne); t3.resize(ni); tn.resize(n);
    Cdx.resize(ni); Adx.resize(ne); Hdx.resize(n);
    ATdy.resize(n); CTdz.resize(n);
    alphas.reserve(2 * ni);
  }
};

void ruiz_equilibrate(Work& w, const Settings& st) {
  const int n = w.n, ne = w.n_eq, ni = w.n_in;
  std::vector<double> dx(n), dy(ne), dz(ni);
  for (int it = 0; it < st.preconditioner_max_iter - 1; ++it) {
    double err = 0;
    for (int k = 0; k < n; ++k) {
      double cm = 0;
      for (int i = 0; i < n; ++i) cm = std::max(cm, std::fabs(w.H[(size_t)i * n + k]));
      for (int i = 0; i < ne; ++i) cm = std::max(cm, std::fabs(w.A[(size_t)i * n + k]));
      for (int i = 0; i < ni; ++i) cm = std::max(cm, std::fabs(w.C[(size_t)i * n + k]));
      dx[k] = cm == 0 ? 1.0 : 1.0 / (std::sqrt(cm) + 1e-30);
      err = std::max(err, std::fabs(1.0 - dx[k]));
    }
    for (int i = 0; i < ne; ++i) {
      double rm = inf_norm(w.A.data() + (size_t)i * n, n);
      dy[i] = rm == 0 ? 1.0 : 1.0 / (std::sqrt(rm) + 1e-30);
      err = std::max(err, std::fabs(1.0 - dy[i]));
    }
    for (int i = 0; i < ni; ++i) {
      double rm = inf_norm(w.C.data() + (size_t)i * n, n);
      dz[i] = rm == 0 ? 1.0 : 1.0 / (std::sqrt(rm) + 1e-30);
      err = std::max(err, std::fabs(1.0 - dz[i]));
    }
    for (int i = 0; i < n; ++i)
      for (int j = 0; j < n; ++j) w.H[(size_t)i * n + j] *= dx[i] * dx[j];
    for (int i = 0; i < ne; ++i)
      for (int j = 0; j < n; ++j) w.A[(size_t)i * n + j] *= dy[i] * dx[j];
    for (int i = 0; i < ni; ++i)
      for (int j = 0; j < n; ++j) w.C[(size_t)i * n + j] *= dz[i] * dx[j];
    for (int j = 0; j < n; ++j) w.g[j] *= dx[j];
    for (int i = 0; i < ne; ++i) w.b[i] *= dy[i];
    for (int i = 0; i < ni; ++i) { w.u[i] *= dz[i]; w.l[i] *= dz[i]; }
    // cost normalization
    double mean = 0;
    for (int k = 0; k < n; ++k) {
      double cm = 0;
      for (int i = 0; i < n; ++i) cm = std::max(cm, std::fabs(w.H[(size_t)i * n + k]));
      mean += cm;
    }
    mean = n > 0 ? mean / n : 0.0;
    double gamma = 1.0 / std::max(1.0, mean);
    for (auto& v : w.H) v *= gamma;
    for (auto& v : w.g) v *= gamma;
    w.cc *= gamma;
    for (int k = 0; k < n; ++k) w.dx_[k] *= dx[k];
    for (int i = 0; i < ne; ++i) w.dy_[i] *= dy[i];
    for (int i = 0; i < ni; ++i) w.dz_[i] *= dz[i];
    if (err <= st.preconditioner_accuracy) break;
  }
}

void factorize(Work& w, double rho) {
  const int n = w.n, ne = w.n_eq, ni = w.n_in;
  std::memcpy(w.LP.data(), w.H.data(), sizeof(double) * n * n);
  for (int i = 0; i < n; ++i) w.LP[(size_t)i * n + i] += rho;
  cholesky(w.LP.data(), n);
  // Gram blocks: for each constraint row r, solve P q = r, then dot rows.
  std::vector<double> Q((size_t)(ne + ni) * n);
  for (int i = 0; i < ne; ++i) {
    double* q = Q.data() + (size_t)i * n;
    std::memcpy(q, w.A.data() + (size_t)i * n, sizeof(double) * n);
    chol_solve(w.LP.data(), q, n);
  }
  for (int i = 0; i < ni; ++i) {
    double* q = Q.data() + (size_t)(ne + i) * n;
    std::memcpy(q, w.C.data() + (size_t)i * n, sizeof(double) * n);
    chol_solve(w.LP.data(), q, n);
  }
  auto dot = [&](const double* a, const double* bb) {
    double s = 0;
    for (int k = 0; k < n; ++k) s += a[k] * bb[k];
    return s;
  };
  for (int i = 0; i < ne; ++i)
    for (int j = i; j < ne; ++j)
      w.Kaa[(size_t)i * ne + j] = w.Kaa[(size_t)j * ne + i] =
          dot(w.A.data() + (size_t)i * n, Q.data() + (size_t)j * n);
  for (int i = 0; i < ne; ++i)
    for (int j = 0; j < ni; ++j)
      w.Kac[(size_t)i * ni + j] =
          dot(w.A.data() + (size_t)i * n, Q.data() + (size_t)(ne + j) * n);
  for (int i = 0; i < ni; ++i)
    for (int j = i; j < ni; ++j)
      w.Kcc[(size_t)i * ni + j] = w.Kcc[(size_t)j * ni + i] =
          dot(w.C.data() + (size_t)i * n, Q.data() + (size_t)(ne + j) * n);
}

// Solve masked KKT via Schur complement; S factored in-place each call.
void kkt_solve(Work& w, double rho, double mu_eq, double mu_in,
               const double* r1, const double* r2, const double* r3,
               double* dx, double* dy, double* dz) {
  const int n = w.n, ne = w.n_eq, ni = w.n_in, m = w.m;
  // p1 = P^-1 r1
  std::memcpy(w.t1.data(), r1, sizeof(double) * n);
  chol_solve(w.LP.data(), w.t1.data(), n);
  // t = [A p1 - r2 ; mask C p1 - r3]
  std::vector<double>& t = w.tn;  // reuse; size n >= ? m may exceed n!
  static thread_local std::vector<double> tbuf;
  tbuf.resize(m);
  gemv(w.A.data(), w.t1.data(), tbuf.data(), ne, n, 1.0, false);
  for (int i = 0; i < ne; ++i) tbuf[i] -= r2[i];
  gemv(w.C.data(), w.t1.data(), tbuf.data() + ne, ni, n, 1.0, false);
  for (int i = 0; i < ni; ++i)
    tbuf[ne + i] = w.act[i] ? tbuf[ne + i] - r3[i] : -r3[i];
  // S = D_mu + masked Gram
  for (int i = 0; i < ne; ++i)
    for (int j = 0; j < ne; ++j)
      w.S[(size_t)i * m + j] = w.Kaa[(size_t)i * ne + j] + (i == j ? mu_eq : 0.0);
  for (int i = 0; i < ne; ++i)
    for (int j = 0; j < ni; ++j) {
      double v = w.act[j] ? w.Kac[(size_t)i * ni + j] : 0.0;
      w.S[(size_t)i * m + (ne + j)] = v;
      w.S[(size_t)(ne + j) * m + i] = v;
    }
  for (int i = 0; i < ni; ++i)
    for (int j = 0; j < ni; ++j) {
      double v = (w.act[i] && w.act[j]) ? w.Kcc[(size_t)i * ni + j] : 0.0;
      w.S[(size_t)(ne + i) * m + (ne + j)] = v + (i == j ? mu_in : 0.0);
    }
  cholesky(w.S.data(), m);
  chol_solve(w.S.data(), tbuf.data(), m);
  for (int i = 0; i < ne; ++i) dy[i] = tbuf[i];
  for (int i = 0; i < ni; ++i) dz[i] = tbuf[ne + i];
  // dx = P^-1 (r1 - A' dy - (MC)' dz)
  std::memcpy(dx, r1, sizeof(double) * n);
  gemv_t(w.A.data(), dy, dx, ne, n, -1.0, true);
  for (int i = 0; i < ni; ++i) w.t3[i] = w.act[i] ? dz[i] : 0.0;
  gemv_t(w.C.data(), w.t3.data(), dx, ni, n, -1.0, true);
  chol_solve(w.LP.data(), dx, n);
  (void)t;
}

// residual of the masked KKT: e = rhs - K d
void kkt_residual(Work& w, double rho, double mu_eq, double mu_in,
                  const double* r1, const double* r2, const double* r3,
                  const double* dx, const double* dy, const double* dz,
                  double* e1, double* e2, double* e3) {
  const int n = w.n, ne = w.n_eq, ni = w.n_in;
  gemv(w.H.data(), dx, e1, n, n, 1.0, false);
  for (int i = 0; i < n; ++i) e1[i] += rho * dx[i];
  gemv_t(w.A.data(), dy, e1, ne, n, 1.0, true);
  for (int i = 0; i < ni; ++i) w.t3[i] = w.act[i] ? dz[i] : 0.0;
  gemv_t(w.C.data(), w.t3.data(), e1, ni, n, 1.0, true);
  for (int i = 0; i < n; ++i) e1[i] = r1[i] - e1[i];
  gemv(w.A.data(), dx, e2, ne, n, 1.0, false);
  for (int i = 0; i < ne; ++i) e2[i] = r2[i] - (e2[i] - mu_eq * dy[i]);
  gemv(w.C.data(), dx, e3, ni, n, 1.0, false);
  for (int i = 0; i < ni; ++i) {
    double cdx = w.act[i] ? e3[i] : 0.0;
    e3[i] = r3[i] - (cdx - mu_in * dz[i]);
  }
}

void solve_refined(Work& w, const Settings& st, double rho, double mu_eq,
                   double mu_in, const double* r1, const double* r2,
                   const double* r3, double* dx, double* dy, double* dz,
                   double eps) {
  const int n = w.n, ne = w.n_eq, ni = w.n_in;
  kkt_solve(w, rho, mu_eq, mu_in, r1, r2, r3, dx, dy, dz);
  std::vector<double> e1(n), e2(ne), e3(ni), c1(n), c2(ne), c3(ni);
  kkt_residual(w, rho, mu_eq, mu_in, r1, r2, r3, dx, dy, dz,
               e1.data(), e2.data(), e3.data());
  double err = std::max({inf_norm(e1.data(), n), inf_norm(e2.data(), ne),
                         inf_norm(e3.data(), ni)});
  int strikes = 0;
  for (int it = 1; it < st.nb_iterative_refinement && err >= eps && strikes < 2;
       ++it) {
    kkt_solve(w, rho, mu_eq, mu_in, e1.data(), e2.data(), e3.data(),
              c1.data(), c2.data(), c3.data());
    for (int i = 0; i < n; ++i) dx[i] += c1[i];
    for (int i = 0; i < ne; ++i) dy[i] += c2[i];
    for (int i = 0; i < ni; ++i) dz[i] += c3[i];
    kkt_residual(w, rho, mu_eq, mu_in, r1, r2, r3, dx, dy, dz,
                 e1.data(), e2.data(), e3.data());
    double ne_ = std::max({inf_norm(e1.data(), n), inf_norm(e2.data(), ne),
                           inf_norm(e3.data(), ni)});
    strikes = ne_ > err ? strikes + 1 : 0;
    err = ne_;
  }
}

struct MeritCoef { double a, b; };

MeritCoef merit_derivative(Work& w, const Settings& st, double rho,
                           double mu_eq, double mu_in, const double* dx,
                           const double* dy, const double* dz, double alpha) {
  const int n = w.n, ne = w.n_eq, ni = w.n_in;
  const bool gpdal = st.alpha_gpdal < 1.0;
  const double ag = st.alpha_gpdal;
  double a = 0, b = 0;
  double dxHdx = 0, dxdx = 0, adx2 = 0;
  for (int i = 0; i < n; ++i) dxHdx += dx[i] * w.Hdx[i];
  for (int i = 0; i < n; ++i) dxdx += dx[i] * dx[i];
  for (int i = 0; i < ne; ++i) adx2 += w.Adx[i] * w.Adx[i];
  a = dxHdx + adx2 / mu_eq + rho * dxdx;
  double e2 = 0, b_eq = 0, b_eq2 = 0;
  for (int i = 0; i < ne; ++i) {
    double e = w.Adx[i] - mu_eq * dy[i];
    e2 += e * e;
    b_eq += w.Adx[i] * (w.se[i] + mu_eq * w.y[i]);
    b_eq2 += e * w.se[i];
  }
  a += e2 / mu_eq;
  double xHdx = 0, gdx = 0;
  for (int i = 0; i < n; ++i) {
    xHdx += w.x[i] * w.Hdx[i];
    gdx += (rho * (w.x[i] - w.xp[i]) + w.g[i]) * dx[i];
  }
  b = xHdx + gdx + b_eq / mu_eq + b_eq2 / mu_eq;
  if (gpdal) {
    double dz2 = 0, dzz = 0;
    for (int i = 0; i < ni; ++i) { dz2 += dz[i] * dz[i]; dzz += dz[i] * w.z[i]; }
    a += mu_in * (1 - ag) * dz2;
    b += mu_in * (1 - ag) * dzz;
  }
  double a_in = 0, b_in = 0, a_in2 = 0, b_in2 = 0;
  for (int i = 0; i < ni; ++i) {
    bool upa = w.ru[i] + alpha * w.Cdx[i] > 0;
    bool lowa = w.rl[i] + alpha * w.Cdx[i] < 0;
    double cdx_act = (upa || lowa) ? w.Cdx[i] : 0.0;
    double act_part = (upa ? w.ru[i] : 0.0) + (lowa ? w.rl[i] : 0.0);
    a_in += cdx_act * cdx_act;
    b_in += act_part * cdx_act;
    if (!gpdal) {
      double e = cdx_act - mu_in * dz[i];
      a_in2 += e * e;
      b_in2 += e * (act_part - mu_in * w.z[i]);
    }
  }
  if (gpdal) {
    a += a_in / (mu_in * ag);
    b += b_in / (mu_in * ag);
  } else {
    a += (a_in + a_in2) / mu_in;
    b += (b_in + b_in2) / mu_in;
  }
  return {a, b};
}

double linesearch(Work& w, const Settings& st, double rho, double mu_eq,
                  double mu_in, const double* dx, const double* dy,
                  const double* dz) {
  const int ni = w.n_in;
  const double meps = 2.220446049250313e-16;
  w.alphas.clear();
  for (int i = 0; i < ni; ++i) {
    if (w.Cdx[i] != 0.0) {
      double a1 = -w.ru[i] / (w.Cdx[i] + meps);
      if (a1 > meps) w.alphas.push_back(a1);
      double a2 = -w.rl[i] / (w.Cdx[i] + meps);
      if (a2 > meps) w.alphas.push_back(a2);
    }
  }
  std::sort(w.alphas.begin(), w.alphas.end());
  w.alphas.erase(std::unique(w.alphas.begin(), w.alphas.end()),
                 w.alphas.end());
  if (w.alphas.empty()) {
    MeritCoef c = merit_derivative(w, st, rho, mu_eq, mu_in, dx, dy, dz, 0.0);
    return -c.b / c.a;
  }
  double last_neg_a = 0, last_neg_g = 0, first_pos_a = -1, first_pos_g = 0;
  for (double al : w.alphas) {
    MeritCoef c = merit_derivative(w, st, rho, mu_eq, mu_in, dx, dy, dz, al);
    double gr = c.a * al + c.b;
    if (gr < 0) {
      last_neg_a = al;
      last_neg_g = gr;
    } else {
      first_pos_a = al;
      first_pos_g = gr;
      break;
    }
  }
  if (last_neg_a == 0) {
    MeritCoef c = merit_derivative(w, st, rho, mu_eq, mu_in, dx, dy, dz, 0.0);
    last_neg_g = c.a * 0 + c.b;
  }
  if (first_pos_a < 0) {
    MeritCoef c = merit_derivative(w, st, rho, mu_eq, mu_in, dx, dy, dz,
                                   2 * last_neg_a + 1);
    return -c.b / c.a;
  }
  return std::fabs(last_neg_a - last_neg_g * (first_pos_a - last_neg_a) /
                                    (first_pos_g - last_neg_g));
}

void primal_residual(Work& w, double* pri, double* se_out_norm) {
  const int n = w.n, ne = w.n_eq, ni = w.n_in;
  // unscaled Ax - b, [Cx-u]_+ + [Cx-l]_-
  gemv(w.A.data(), w.x.data(), w.t2.data(), ne, n, 1.0, false);
  double pe = 0;
  for (int i = 0; i < ne; ++i) {
    double v = (w.t2[i] - w.b[i]) / w.dy_[i];
    pe = std::max(pe, std::fabs(v));
  }
  gemv(w.C.data(), w.x.data(), w.t3.data(), ni, n, 1.0, false);
  double pi = 0;
  for (int i = 0; i < ni; ++i) {
    double cx = w.t3[i] / w.dz_[i];
    double uu = w.u[i] / w.dz_[i], ll = w.l[i] / w.dz_[i];
    double v = std::max(cx - uu, 0.0) + std::min(cx - ll, 0.0);
    pi = std::max(pi, std::fabs(v));
  }
  *pri = std::max(pe, pi);
  (void)se_out_norm;
}

double dual_residual(Work& w) {
  const int n = w.n, ne = w.n_eq, ni = w.n_in;
  gemv(w.H.data(), w.x.data(), w.t1.data(), n, n, 1.0, false);
  for (int i = 0; i < n; ++i) w.t1[i] += w.g[i];
  gemv_t(w.A.data(), w.y.data(), w.t1.data(), ne, n, 1.0, true);
  gemv_t(w.C.data(), w.z.data(), w.t1.data(), ni, n, 1.0, true);
  double d = 0;
  for (int i = 0; i < n; ++i)
    d = std::max(d, std::fabs(w.t1[i] / (w.dx_[i] * w.cc)));
  return d;
}

void solve_one(Work& w, const Settings& st, Info& info) {
  const int n = w.n, ne = w.n_eq, ni = w.n_in;
  const double ag = st.alpha_gpdal;
  double rho = st.rho, mu_eq = st.mu_eq, mu_in = st.mu_in;
  double eps_in_min = std::min(st.eps_abs, 1e-9);
  double eta_ext_init = std::pow(0.1, st.alpha_bcl);
  double eta_ext = eta_ext_init, eta_in = 1.0;

  ruiz_equilibrate(w, st);
  factorize(w, rho);

  // equality-constrained initial guess
  std::fill(w.act.begin(), w.act.end(), 0);
  for (int i = 0; i < n; ++i) w.rx[i] = -w.g[i];
  std::memcpy(w.ry.data(), w.b.data(), sizeof(double) * ne);
  std::fill(w.rz.begin(), w.rz.end(), 0.0);
  solve_refined(w, st, rho, mu_eq, mu_in, w.rx.data(), w.ry.data(),
                w.rz.data(), w.x.data(), w.y.data(), w.t3.data(), 1.0);

  std::vector<double> dxv(n), dyv(ne), dzv(ni);
  for (int oi = 0; oi < st.max_iter; ++oi) {
    double pri;
    primal_residual(w, &pri, nullptr);
    double dua = dual_residual(w);
    info.pri_res = pri;
    info.dua_res = dua;
    if (pri <= st.eps_abs && dua <= st.eps_abs) {
      info.status = 0;
      break;
    }
    info.iter_ext++;
    w.xp = w.x; w.yp = w.y; w.zp = w.z;
    // seed shifted residuals (scaled): ru = Cx - u + fac*mu_in*z_prev
    gemv(w.C.data(), w.x.data(), w.t3.data(), ni, n, 1.0, false);
    for (int i = 0; i < ni; ++i) {
      double s = w.t3[i] + ag * mu_in * w.zp[i];
      w.ru[i] = s - w.u[i];
      w.rl[i] = s - w.l[i];
    }
    gemv(w.A.data(), w.x.data(), w.se.data(), ne, n, 1.0, false);
    for (int i = 0; i < ne; ++i) w.se[i] -= w.b[i];
    gemv(w.H.data(), w.x.data(), w.dr.data(), n, n, 1.0, false);
    for (int i = 0; i < n; ++i) w.dr[i] += w.g[i];
    gemv_t(w.A.data(), w.y.data(), w.dr.data(), ne, n, 1.0, true);
    gemv_t(w.C.data(), w.z.data(), w.dr.data(), ni, n, 1.0, true);

    // inner semismooth Newton
    for (int ii = 0; ii < st.max_iter_in; ++ii) {
      for (int i = 0; i < ni; ++i) {
        w.up[i] = w.ru[i] >= 0;
        w.low[i] = w.rl[i] <= 0;
        w.act[i] = w.up[i] || w.low[i];
      }
      for (int i = 0; i < n; ++i) w.rx[i] = -w.dr[i];
      for (int i = 0; i < ni; ++i) w.t3[i] = w.act[i] ? 0.0 : w.z[i];
      gemv_t(w.C.data(), w.t3.data(), w.rx.data(), ni, n, 1.0, true);
      for (int i = 0; i < ne; ++i) w.ry[i] = -w.se[i];
      for (int i = 0; i < ni; ++i) {
        double shift = w.z[i] * mu_in * ag;
        w.rz[i] = w.up[i] ? -w.ru[i] + shift
                          : (w.low[i] ? -w.rl[i] + shift : 0.0);
      }
      solve_refined(w, st, rho, mu_eq, mu_in, w.rx.data(), w.ry.data(),
                    w.rz.data(), dxv.data(), dyv.data(), dzv.data(), eta_in);
      for (int i = 0; i < ni; ++i)
        if (!w.act[i]) dzv[i] = -w.z[i];
      gemv(w.H.data(), dxv.data(), w.Hdx.data(), n, n, 1.0, false);
      gemv(w.A.data(), dxv.data(), w.Adx.data(), ne, n, 1.0, false);
      gemv_t(w.A.data(), dyv.data(), w.ATdy.data(), ne, n, 1.0, false);
      gemv(w.C.data(), dxv.data(), w.Cdx.data(), ni, n, 1.0, false);
      gemv_t(w.C.data(), dzv.data(), w.CTdz.data(), ni, n, 1.0, false);
      if (ag < 1.0)
        for (int i = 0; i < ni; ++i) w.Cdx[i] += (ag - 1.0) * mu_in * dzv[i];
      double alpha = ni > 0 ? linesearch(w, st, rho, mu_eq, mu_in, dxv.data(),
                                         dyv.data(), dzv.data())
                            : 1.0;
      double stepn = 0;
      for (int i = 0; i < n; ++i) stepn = std::max(stepn, std::fabs(alpha * dxv[i]));
      for (int i = 0; i < ne; ++i) stepn = std::max(stepn, std::fabs(alpha * dyv[i]));
      for (int i = 0; i < ni; ++i) stepn = std::max(stepn, std::fabs(alpha * dzv[i]));
      if (stepn < 1e-11 && ii > 0) { info.iter += ii + 1; break; }
      for (int i = 0; i < n; ++i) w.x[i] += alpha * dxv[i];
      for (int i = 0; i < ni; ++i) { w.ru[i] += alpha * w.Cdx[i]; w.rl[i] += alpha * w.Cdx[i]; }
      for (int i = 0; i < ne; ++i) w.se[i] += alpha * (w.Adx[i] - mu_eq * dyv[i]);
      for (int i = 0; i < ne; ++i) w.y[i] += alpha * dyv[i];
      for (int i = 0; i < ni; ++i) w.z[i] += alpha * dzv[i];
      for (int i = 0; i < n; ++i)
        w.dr[i] += alpha * (rho * dxv[i] + w.Hdx[i] + w.ATdy[i] + w.CTdz[i]);
      double err_in = 0;
      for (int i = 0; i < ni; ++i) {
        double v = std::max(w.ru[i], 0.0) + std::min(w.rl[i], 0.0) -
                   ag * mu_in * w.z[i];
        err_in = std::max(err_in, std::fabs(v));
      }
      err_in = std::max(err_in, inf_norm(w.se.data(), ne));
      err_in = std::max(err_in, inf_norm(w.dr.data(), n));
      if (err_in <= eta_in) { info.iter += ii + 1; break; }
      if (ii == st.max_iter_in - 1) info.iter += st.max_iter_in + 1;
    }

    double pri_new;
    primal_residual(w, &pri_new, nullptr);
    // BCL
    double new_mu_eq = mu_eq, new_mu_in = mu_in;
    if (pri_new <= eta_ext) {
      eta_ext *= std::pow(mu_in, st.beta_bcl);
      eta_in = std::max(eta_in * mu_in, eps_in_min);
    } else {
      w.y = w.yp; w.z = w.zp;
      new_mu_in = std::max(mu_in * st.mu_update_factor, st.mu_min_in);
      new_mu_eq = std::max(mu_eq * st.mu_update_factor, st.mu_min_eq);
      eta_ext = eta_ext_init * std::pow(new_mu_in, st.alpha_bcl);
      eta_in = std::max(new_mu_in, eps_in_min);
    }
    double dua_new = dual_residual(w);
    if (pri_new >= info.pri_res && dua_new >= info.dua_res && mu_in <= 1e-5) {
      new_mu_eq = st.cold_reset_mu_eq;
      new_mu_in = st.cold_reset_mu_in;
    }
    mu_eq = new_mu_eq;
    mu_in = new_mu_in;
  }
  // unscale solution
  for (int i = 0; i < n; ++i) w.x[i] *= w.dx_[i];
  for (int i = 0; i < ne; ++i) w.y[i] *= w.dy_[i] / w.cc;
  for (int i = 0; i < ni; ++i) w.z[i] *= w.dz_[i] / w.cc;
}

}  // namespace

extern "C" {

// Solve a batch of dense QPs (row-major data, contiguous per problem).
// Returns number solved. Threads <= 0 means OpenMP default.
int proxqp_cpu_solve_batch(
    int batch, int n, int n_eq, int n_in,
    const double* H, const double* g, const double* A, const double* b,
    const double* C, const double* u, const double* l,
    double eps_abs, int max_iter, int max_iter_in, double rho,
    double mu_eq, double mu_in, int n_threads,
    double* x_out, double* y_out, double* z_out,
    int* status_out, int* iter_out) {
  Settings st;
  st.eps_abs = eps_abs;
  if (max_iter > 0) st.max_iter = max_iter;
  if (max_iter_in > 0) st.max_iter_in = max_iter_in;
  if (rho > 0) st.rho = rho;
  if (mu_eq > 0) st.mu_eq = mu_eq;
  if (mu_in > 0) st.mu_in = mu_in;
#ifdef _OPENMP
  if (n_threads > 0) omp_set_num_threads(n_threads);
#endif
  int solved = 0;
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic) reduction(+ : solved)
#endif
  for (int bi = 0; bi < batch; ++bi) {
    Work w;
    w.resize(n, n_eq, n_in);
    std::memcpy(w.H.data(), H + (size_t)bi * n * n, sizeof(double) * n * n);
    std::memcpy(w.g.data(), g + (size_t)bi * n, sizeof(double) * n);
    std::memcpy(w.A.data(), A + (size_t)bi * n_eq * n,
                sizeof(double) * n_eq * n);
    std::memcpy(w.b.data(), b + (size_t)bi * n_eq, sizeof(double) * n_eq);
    std::memcpy(w.C.data(), C + (size_t)bi * n_in * n,
                sizeof(double) * n_in * n);
    std::memcpy(w.u.data(), u + (size_t)bi * n_in, sizeof(double) * n_in);
    std::memcpy(w.l.data(), l + (size_t)bi * n_in, sizeof(double) * n_in);
    for (auto& v : w.u) v = std::min(v, kInfBound);
    for (auto& v : w.l) v = std::max(v, -kInfBound);
    Info info;
    solve_one(w, st, info);
    std::memcpy(x_out + (size_t)bi * n, w.x.data(), sizeof(double) * n);
    std::memcpy(y_out + (size_t)bi * n_eq, w.y.data(), sizeof(double) * n_eq);
    std::memcpy(z_out + (size_t)bi * n_in, w.z.data(), sizeof(double) * n_in);
    status_out[bi] = info.status;
    iter_out[bi] = info.iter;
    solved += info.status == 0;
  }
  return solved;
}

}  // extern "C"
