// Direct / specialized solvers for the classic GLM families.
//
// The ADMM runtime solves every graph-form objective through one
// generic split; for the three families below a specialized classical
// algorithm is one to two orders of magnitude less arithmetic, so the
// native runtime routes them here (pogs_tpu/native/__init__.py
// _glm_shape).  The reference has none of these (every problem runs
// its ADMM loop, src/cpu/pogs.cpp).
//
//   ridge_direct        min 1/2||Ax-b||^2 + 1/2 sum_j l2_j x_j^2
//                       -> one Gram + Cholesky solve (the textbook
//                          normal-equations answer; min-dim dual form
//                          for wide A with uniform l2).
//   svm_dual_cd         min sum_i max(0, 1 - y_i a_i'x) + (l/2)||x||^2
//                       -> dual coordinate descent (the liblinear
//                          algorithm: Hsieh et al., ICML'08 class).
//   logistic_prox_newton
//                       min sum_i log(1+exp(-y_i a_i'x)) + l1||x||_1
//                       -> outer IRLS quadratic approximation, inner
//                          weighted lasso via cd_elastic_net (the
//                          glmnet scheme), damped on the true loss.

#pragma once

#include <algorithm>
#include <cmath>
#include <cstddef>
#include <vector>

#include "cd.hpp"
#include "linalg.hpp"
#include "qp_polish.hpp"

namespace pogs_native {

struct GlmResult {
  int iters = 0;
  double kkt = 0.0;
  double optval = 0.0;
  bool converged = false;
};

// ---------------------------------------------------------------------------
// Ridge: closed form.
// ---------------------------------------------------------------------------

inline GlmResult ridge_direct(size_t m, size_t n, const double* A,
                              const double* b, const double* l2, double* x) {
  GlmResult res;
  bool uniform = true;
  for (size_t j = 1; j < n; ++j)
    if (l2[j] != l2[0]) {
      uniform = false;
      break;
    }
  if (uniform && m < n && l2[0] > 0.0) {
    // Wide A: solve the m x m dual system (AA' + l2 I) u = b, x = A'u.
    std::vector<double> K(m * m);
    gram(m, n, A, /*trans=*/false, K.data());
    for (size_t i = 0; i < m; ++i) K[i * m + i] += l2[0];
    if (!cholesky(m, K.data())) return res;
    std::vector<double> u(m);
    cholesky_solve(m, K.data(), b, u.data());
    gemv_t(m, n, A, u.data(), x);
  } else {
    std::vector<double> K(n * n);
    gram(m, n, A, /*trans=*/true, K.data());
    for (size_t j = 0; j < n; ++j) K[j * n + j] += l2[j];
    std::vector<double> rhs(n);
    gemv_t(m, n, A, b, rhs.data());
    if (!cholesky(n, K.data())) return res;
    cholesky_solve(n, K.data(), rhs.data(), x);
  }
  std::vector<double> r(m);
  gemv(m, n, A, x, r.data());
  double fit = 0.0, reg = 0.0, kkt = 0.0;
  for (size_t i = 0; i < m; ++i) {
    r[i] = b[i] - r[i];
    fit += r[i] * r[i];
  }
  std::vector<double> g(n);
  gemv_t(m, n, A, r.data(), g.data());  // g = A'(b - Ax)
  for (size_t j = 0; j < n; ++j) {
    reg += 0.5 * l2[j] * x[j] * x[j];
    kkt = std::max(kkt, std::fabs(-g[j] + l2[j] * x[j]));
  }
  res.iters = 1;
  res.kkt = kkt;
  res.optval = 0.5 * fit + reg;
  res.converged = std::isfinite(res.optval);
  return res;
}

// ---------------------------------------------------------------------------
// SVM: dual coordinate descent.
// ---------------------------------------------------------------------------

inline GlmResult svm_dual_cd(size_t m, size_t n, const double* A,
                             const double* y, double lambda, double tol,
                             int max_epochs, double* x) {
  // Dual:  max_alpha  sum_i alpha_i - 1/(2 lambda) || sum_i alpha_i y_i a_i ||^2
  //        s.t. 0 <= alpha_i <= 1.
  // Maintain v = sum alpha_i y_i a_i; primal x = v / lambda.
  GlmResult res;
  std::vector<double> alpha(m, 0.0), v(n, 0.0), qii(m);
  for (size_t i = 0; i < m; ++i) qii[i] = dot(n, A + i * n, A + i * n);
  double last_pg = 0.0;
  for (res.iters = 1; res.iters <= max_epochs; ++res.iters) {
    double max_pg = 0.0;
    for (size_t i = 0; i < m; ++i) {
      if (qii[i] <= 0.0) continue;
      const double* ai = A + i * n;
      // gradient of the (negated, minimized) dual wrt alpha_i
      const double G = y[i] * dot(n, ai, v.data()) / lambda - 1.0;
      double pg = G;  // projected gradient
      if (alpha[i] <= 0.0)
        pg = std::min(G, 0.0);
      else if (alpha[i] >= 1.0)
        pg = std::max(G, 0.0);
      if (std::fabs(pg) > max_pg) max_pg = std::fabs(pg);
      if (pg == 0.0) continue;
      const double a_old = alpha[i];
      const double a_new =
          std::min(1.0, std::max(0.0, a_old - G * lambda / qii[i]));
      if (a_new != a_old) {
        axpy(n, (a_new - a_old) * y[i], ai, v.data());
        alpha[i] = a_new;
      }
    }
    last_pg = max_pg;
    if (max_pg <= tol) {
      res.converged = true;
      break;
    }
  }
  if (res.iters > max_epochs) res.iters = max_epochs;
  for (size_t j = 0; j < n; ++j) x[j] = v[j] / lambda;
  double hinge = 0.0;
  std::vector<double> z(m);
  gemv(m, n, A, x, z.data());
  for (size_t i = 0; i < m; ++i)
    hinge += std::max(0.0, 1.0 - y[i] * z[i]);
  res.optval = hinge + 0.5 * lambda * dot(n, x, x);
  res.kkt = last_pg;  // max projected dual gradient at exit
  return res;
}

// ---------------------------------------------------------------------------
// Huber regression (+ optional l1): IRLS / majorize-minimize.
// ---------------------------------------------------------------------------

inline GlmResult huber_irls(size_t m, size_t n, const double* A,
                            const double* b, double delta, const double* l1,
                            double tol, int max_irls, int max_cd_sweeps,
                            double* x) {
  // min sum_i huber_delta(a_i'x - b_i) + sum_j l1_j|x_j|.
  // The standard MM bound: at residual r0, (w/2)(r - r0)^2 + ... with
  // w = 1 (|r0| <= delta) else delta/|r0| majorizes huber, so each
  // weighted-lasso subproblem (solved by the CD core on a sqrt(w)-scaled
  // copy) monotonically decreases the true objective — no line search.
  GlmResult res;
  std::vector<double> Ac = cd_colmajor(m, n, A);
  std::vector<double> Acw(m * n), bw(m), r(m);
  double l1_max = 0.0;
  for (size_t j = 0; j < n; ++j) l1_max = std::max(l1_max, l1[j]);
  gemv(m, n, A, x, r.data());
  for (size_t i = 0; i < m; ++i) r[i] -= b[i];
  for (res.iters = 1; res.iters <= max_irls; ++res.iters) {
    // True-problem KKT: grad = A' psi(r), psi = clip(r, +-delta).
    {
      std::vector<double> psi(m), g(n);
      for (size_t i = 0; i < m; ++i)
        psi[i] = std::min(delta, std::max(-delta, r[i]));
      gemv_t(m, n, A, psi.data(), g.data());
      double kkt = 0.0;
      for (size_t j = 0; j < n; ++j) {
        double v;
        if (x[j] > 0.0)
          v = std::fabs(g[j] + l1[j]);
        else if (x[j] < 0.0)
          v = std::fabs(g[j] - l1[j]);
        else
          v = std::max(std::fabs(g[j]) - l1[j], 0.0);
        kkt = std::max(kkt, v);
      }
      res.kkt = kkt;
      if (kkt <= tol) {
        res.converged = true;
        break;
      }
    }
    for (size_t i = 0; i < m; ++i) {
      const double ar = std::fabs(r[i]);
      const double sw = std::sqrt(ar <= delta ? 1.0 : delta / ar);
      bw[i] = sw * b[i];
      for (size_t j = 0; j < n; ++j) Acw[j * m + i] = sw * Ac[j * m + i];
    }
    std::vector<double> l2z(n, 0.0);
    cd_core(m, n, Acw.data(), bw.data(), l1, l2z.data(),
            /*tol_move=*/1e-6, /*tol_kkt=*/0.1 * tol, max_cd_sweeps, x,
            nullptr);
    gemv(m, n, A, x, r.data());
    for (size_t i = 0; i < m; ++i) r[i] -= b[i];
  }
  if (res.iters > max_irls) res.iters = max_irls;
  double loss = 0.0;
  for (size_t i = 0; i < m; ++i) {
    const double ar = std::fabs(r[i]);
    loss += (ar <= delta) ? 0.5 * r[i] * r[i]
                          : delta * ar - 0.5 * delta * delta;
  }
  for (size_t j = 0; j < n; ++j) loss += l1[j] * std::fabs(x[j]);
  res.optval = loss;
  return res;
}

// ---------------------------------------------------------------------------
// L1-regularized logistic regression: prox-Newton (glmnet scheme).
// ---------------------------------------------------------------------------

inline double logistic_loss(size_t m, const double* z, const double* y) {
  // sum_i log(1 + exp(-y_i z_i)), stable for large |z|.
  double s = 0.0;
  for (size_t i = 0; i < m; ++i) {
    const double t = -y[i] * z[i];
    s += (t > 0.0) ? t + std::log1p(std::exp(-t)) : std::log1p(std::exp(t));
  }
  return s;
}

inline GlmResult logistic_prox_newton(size_t m, size_t n, const double* A,
                                      const double* y, const double* l1,
                                      double tol, int max_newton,
                                      int max_cd_sweeps, double* x) {
  GlmResult res;
  std::vector<double> z(m), mu(m), w(m), sw(m), bw(m);
  // Column-major copy built ONCE; each Newton iteration scales it by
  // sqrt(w) into a reused buffer so the inner CD runs the cheap
  // unweighted core (weighted three-stream dots measured ~40% slower
  // per sweep than one bandwidth-bound rescale pass).
  std::vector<double> Ac = cd_colmajor(m, n, A);
  std::vector<double> Acw(m * n);
  double l1_max = 0.0;
  for (size_t j = 0; j < n; ++j) l1_max = std::max(l1_max, l1[j]);
  gemv(m, n, A, x, z.data());
  double loss = logistic_loss(m, z.data(), y);
  auto l1_term = [&]() {
    double s = 0.0;
    for (size_t j = 0; j < n; ++j) s += l1[j] * std::fabs(x[j]);
    return s;
  };
  for (res.iters = 1; res.iters <= max_newton; ++res.iters) {
    // Quadratic approximation at x: weights and working response.
    for (size_t i = 0; i < m; ++i) {
      const double s = 1.0 / (1.0 + std::exp(y[i] * z[i]));  // sigma(-y z)
      mu[i] = s;
      w[i] = std::max(s * (1.0 - s), 1e-6);
    }
    // KKT of the TRUE problem: grad = -A'(y .* mu).
    double kkt = 0.0;
    {
      std::vector<double> ym(m), g(n);
      for (size_t i = 0; i < m; ++i) ym[i] = y[i] * mu[i];
      gemv_t(m, n, A, ym.data(), g.data());
      for (size_t j = 0; j < n; ++j) {
        const double gj = -g[j];
        double v;
        if (x[j] > 0.0)
          v = std::fabs(gj + l1[j]);
        else if (x[j] < 0.0)
          v = std::fabs(gj - l1[j]);
        else
          v = std::max(std::fabs(gj) - l1[j], 0.0);
        kkt = std::max(kkt, v);
      }
      res.kkt = kkt;
      if (kkt <= tol) {
        res.converged = true;
        break;
      }
    }
    // Weighted lasso subproblem: min 1/2||W^(1/2)(A x' - t)||^2 + l1|x'|
    // with t_i = z_i + y_i mu_i / w_i, solved warm-started at x.
    for (size_t i = 0; i < m; ++i) {
      sw[i] = std::sqrt(w[i]);
      bw[i] = sw[i] * (z[i] + y[i] * mu[i] / w[i]);
    }
    for (size_t j = 0; j < n; ++j) {
      const double* src = &Ac[j * m];
      double* dst = &Acw[j * m];
      for (size_t i = 0; i < m; ++i) dst[i] = sw[i] * src[i];
    }
    std::vector<double> x_new(x, x + n), l2z(n, 0.0);
    cd_core(m, n, Acw.data(), bw.data(), l1, l2z.data(),
            /*tol_move=*/1e-6, /*tol_kkt=*/0.1 * tol * (1.0 + l1_max),
            max_cd_sweeps, x_new.data(), nullptr);
    // Damped acceptance on the true objective.
    const double f_cur = loss + l1_term();
    double step = 1.0;
    std::vector<double> z_try(m), x_try(n);
    for (int bt = 0; bt < 12; ++bt) {
      for (size_t j = 0; j < n; ++j)
        x_try[j] = x[j] + step * (x_new[j] - x[j]);
      gemv(m, n, A, x_try.data(), z_try.data());
      double l1_try = 0.0;
      for (size_t j = 0; j < n; ++j) l1_try += l1[j] * std::fabs(x_try[j]);
      const double f_try = logistic_loss(m, z_try.data(), y) + l1_try;
      if (f_try <= f_cur + 1e-12 * (1.0 + std::fabs(f_cur))) break;
      step *= 0.5;
    }
    std::copy(x_try.begin(), x_try.end(), x);
    std::copy(z_try.begin(), z_try.end(), z.begin());
    loss = logistic_loss(m, z.data(), y);
  }
  if (res.iters > max_newton) res.iters = max_newton;
  res.optval = loss + l1_term();
  return res;
}


// ---------------------------------------------------------------------------
// Nonnegative least squares: active-set (PDAS) on the normal equations.
// ---------------------------------------------------------------------------

inline GlmResult nnls_pdas(size_t m, size_t n, const double* A,
                                const double* b, double tol, double* x) {
  //   min 1/2||Ax - b||^2  s.t.  x >= 0
  // as the box QP  min 1/2 x'Px + c'x, P = A'A, c = -A'b, with the
  // nonnegativity rows fed to the shared PDAS machinery (qp_polish.hpp)
  // seeded at the clipped regularized least-squares solution.  The
  // classic Lawson-Hanson active set, in the codebase's own terms.
  GlmResult res;
  std::vector<double> P(n * n), c(n);
  gram(m, n, A, /*trans=*/true, P.data());
  gemv_t(m, n, A, b, c.data());
  for (size_t j = 0; j < n; ++j) c[j] = -c[j];
  // Seed: (P + dI)x = -c, clipped at zero.
  std::vector<double> K(P), seed(n);
  double dmax = 0.0;
  for (size_t j = 0; j < n; ++j) dmax = std::max(dmax, K[j * n + j]);
  for (size_t j = 0; j < n; ++j) K[j * n + j] += 1e-10 * (1.0 + dmax);
  if (!cholesky(n, K.data())) return res;
  std::vector<double> rhs(n);
  for (size_t j = 0; j < n; ++j) rhs[j] = -c[j];
  cholesky_solve(n, K.data(), rhs.data(), seed.data());
  for (size_t j = 0; j < n; ++j) seed[j] = std::max(seed[j], 0.0);
  // Constraint rows: b_qp - (-I)x = x >= 0 (NonNeg kind = +1).
  std::vector<double> Aq(n * n, 0.0), bq(n, 0.0), lam0(n, 0.0);
  for (size_t j = 0; j < n; ++j) Aq[j * n + j] = -1.0;
  std::vector<std::int8_t> kind(n, 1);
  std::vector<double> x_out, lam_out;
  QpKktResiduals rr;
  if (!qp_active_set_polish(n, n, P.data(), c.data(), Aq.data(), bq.data(),
                            kind, seed.data(), lam0.data(), tol, x_out,
                            lam_out, rr)) {
    return res;  // caller falls back to the ADMM runtime
  }
  std::copy(x_out.begin(), x_out.end(), x);
  std::vector<double> r(m);
  gemv(m, n, A, x, r.data());
  double fit = 0.0;
  for (size_t i = 0; i < m; ++i) {
    r[i] = b[i] - r[i];
    fit += r[i] * r[i];
  }
  res.optval = 0.5 * fit;
  res.kkt = rr.score();
  res.iters = 1;
  res.converged = true;
  return res;
}

}  // namespace pogs_native

