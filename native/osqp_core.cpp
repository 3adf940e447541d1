// Native CPU QP core: the OSQP algorithm (ADMM + LDL^T KKT factorization).
//
// Reference parity (SURVEY.md §2 "Native components", §2.1): the only
// native code in the reference stack is the OSQP C solver core (ADMM with
// sparse LDL^T). This is the rebuild's native-tier equivalent for the host
// side: dense LDL^T of the quasi-definite KKT matrix
//
//     [ P + sigma*I      A^T        ]
//     [ A           -diag(1/rho_i)  ]
//
// (LDL^T without pivoting exists because the KKT matrix is symmetric
// quasi-definite for sigma>0, rho>0 — the same property OSQP exploits),
// per-row rho with equality scaling, over-relaxation, adaptive rho with
// refactorization, and OSQP's eps_abs/eps_rel termination. Solves the MPC
// instances of this framework (a few hundred variables) ~10x faster than
// the numpy oracle; used as the CPU fallback solver and as a second,
// independent implementation for cross-checking the TPU solver.
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).

#include <cmath>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

// LDL^T factorization of a symmetric (quasi-definite) matrix K (k x k),
// in-place into L (unit lower, strictly lower part) and D (diagonal).
bool ldlt_factor(int k, const double* K, double* L, double* D) {
  std::vector<double> v(k);
  for (int j = 0; j < k; ++j) {
    double d = K[j * k + j];
    for (int s = 0; s < j; ++s) {
      const double lv = L[j * k + s] * D[s];
      v[s] = lv;
      d -= L[j * k + s] * lv;
    }
    if (std::fabs(d) < 1e-300) return false;
    D[j] = d;
    for (int i = j + 1; i < k; ++i) {
      double acc = K[i * k + j];
      for (int s = 0; s < j; ++s) acc -= L[i * k + s] * v[s];
      L[i * k + j] = acc / d;
    }
  }
  return true;
}

void ldlt_solve(int k, const double* L, const double* D, double* b) {
  for (int i = 0; i < k; ++i) {       // forward: L z = b
    double acc = b[i];
    for (int s = 0; s < i; ++s) acc -= L[i * k + s] * b[s];
    b[i] = acc;
  }
  for (int i = 0; i < k; ++i) b[i] /= D[i];
  for (int i = k - 1; i >= 0; --i) {  // backward: L^T x = z
    double acc = b[i];
    for (int s = i + 1; s < k; ++s) acc -= L[s * k + i] * b[s];
    b[i] = acc;
  }
}

void build_kkt(int n, int m, const double* P, const double* A, double sigma,
               const double* rho_vec, std::vector<double>& K) {
  const int k = n + m;
  std::fill(K.begin(), K.end(), 0.0);
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < n; ++j) K[i * k + j] = P[i * n + j];
  for (int i = 0; i < n; ++i) K[i * k + i] += sigma;
  for (int r = 0; r < m; ++r)
    for (int c = 0; c < n; ++c) {
      K[(n + r) * k + c] = A[r * n + c];
      K[c * k + (n + r)] = A[r * n + c];
    }
  for (int r = 0; r < m; ++r) K[(n + r) * k + (n + r)] = -1.0 / rho_vec[r];
}

inline double inf_norm(int k, const double* v) {
  double mx = 0.0;
  for (int i = 0; i < k; ++i) mx = std::fmax(mx, std::fabs(v[i]));
  return mx;
}

}  // namespace

extern "C" {

// Returns 0 on convergence, 1 on max_iter, -1 on factorization failure.
int osqp_core_solve(int n, int m, const double* P, const double* q,
                    const double* A, const double* l, const double* u,
                    double rho, double sigma, double alpha, int max_iter,
                    double eps_abs, double eps_rel, int adaptive_interval,
                    double rho_eq_scale, double* x_out, double* y_out,
                    double* z_out, int* iters_out, double* res_out) {
  const int k = n + m;
  std::vector<double> rho_vec(m), Kmat(k * k), L(k * k, 0.0), D(k),
      rhs(k), x(n, 0.0), y(m, 0.0), z(m), Ax(m), zt(m), zr(m), Px(n), Aty(n);

  std::vector<char> eq(m);
  for (int r = 0; r < m; ++r) {
    eq[r] = std::fabs(u[r] - l[r]) < 1e-12;
    rho_vec[r] = eq[r] ? rho_eq_scale * rho : rho;
  }
  build_kkt(n, m, P, A, sigma, rho_vec.data(), Kmat);
  if (!ldlt_factor(k, Kmat.data(), L.data(), D.data())) return -1;

  // z = clip(Ax, l, u) with x = 0 -> clip(0)
  for (int r = 0; r < m; ++r) z[r] = std::fmin(std::fmax(0.0, l[r]), u[r]);

  double r_prim = 1e30, r_dual = 1e30, eps_p = 0.0, eps_d = 0.0;
  int it = 0;
  for (it = 1; it <= max_iter; ++it) {
    for (int i = 0; i < n; ++i) rhs[i] = sigma * x[i] - q[i];
    for (int r = 0; r < m; ++r) rhs[n + r] = z[r] - y[r] / rho_vec[r];
    ldlt_solve(k, L.data(), D.data(), rhs.data());
    // x~ = rhs[:n], nu = rhs[n:]
    for (int r = 0; r < m; ++r)
      zt[r] = z[r] + (rhs[n + r] - y[r]) / rho_vec[r];
    for (int i = 0; i < n; ++i) x[i] = alpha * rhs[i] + (1 - alpha) * x[i];
    for (int r = 0; r < m; ++r) {
      zr[r] = alpha * zt[r] + (1 - alpha) * z[r];
      double znew = zr[r] + y[r] / rho_vec[r];
      znew = std::fmin(std::fmax(znew, l[r]), u[r]);
      y[r] += rho_vec[r] * (zr[r] - znew);
      z[r] = znew;
    }

    // residuals
    for (int r = 0; r < m; ++r) {
      double acc = 0.0;
      for (int c = 0; c < n; ++c) acc += A[r * n + c] * x[c];
      Ax[r] = acc;
    }
    for (int i = 0; i < n; ++i) {
      double accp = 0.0, acca = 0.0;
      for (int j = 0; j < n; ++j) accp += P[i * n + j] * x[j];
      for (int r = 0; r < m; ++r) acca += A[r * n + i] * y[r];
      Px[i] = accp;
      Aty[i] = acca;
    }
    r_prim = 0.0;
    for (int r = 0; r < m; ++r)
      r_prim = std::fmax(r_prim, std::fabs(Ax[r] - z[r]));
    r_dual = 0.0;
    for (int i = 0; i < n; ++i)
      r_dual = std::fmax(r_dual, std::fabs(Px[i] + q[i] + Aty[i]));
    eps_p = eps_abs + eps_rel * std::fmax(inf_norm(m, Ax.data()),
                                          inf_norm(m, z.data()));
    eps_d = eps_abs + eps_rel * std::fmax(inf_norm(n, Px.data()),
                 std::fmax(inf_norm(n, q), inf_norm(n, Aty.data())));
    if (r_prim <= eps_p && r_dual <= eps_d) break;

    if (adaptive_interval > 0 && it % adaptive_interval == 0) {
      const double ratio = std::sqrt((r_prim / std::fmax(eps_p, 1e-15)) /
                                     std::fmax(r_dual / std::fmax(eps_d, 1e-15),
                                               1e-15));
      if (ratio > 5.0 || ratio < 0.2) {
        rho = std::fmin(std::fmax(rho * ratio, 1e-6), 1e6);
        for (int r = 0; r < m; ++r)
          rho_vec[r] = eq[r] ? rho_eq_scale * rho : rho;
        build_kkt(n, m, P, A, sigma, rho_vec.data(), Kmat);
        if (!ldlt_factor(k, Kmat.data(), L.data(), D.data())) return -1;
      }
    }
  }

  std::memcpy(x_out, x.data(), n * sizeof(double));
  std::memcpy(y_out, y.data(), m * sizeof(double));
  std::memcpy(z_out, z.data(), m * sizeof(double));
  *iters_out = it > max_iter ? max_iter : it;
  res_out[0] = r_prim;
  res_out[1] = r_dual;
  return (r_prim <= eps_p && r_dual <= eps_d) ? 0 : 1;
}

}  // extern "C"
