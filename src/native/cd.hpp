// Coordinate descent for elastic-net-regularized least squares.
//
//   minimize  (1/2)||A x - b||^2 + sum_j l1_j |x_j| + (1/2) sum_j l2_j x_j^2
//
// Residual-form cyclic CD (the algorithm class behind sklearn/glmnet):
// maintain r = b - A x; each coordinate update is one dot and one axpy
// against the column a_j, so a full sweep costs 2mn flops and no Gram
// matrix is ever formed.  For host-size lasso problems this is the
// right algorithm: the ADMM runtime pays ~90 iterations x (2 gemv) for
// the same answer, an order of magnitude more arithmetic.
//
// This is a pogs_tpu-only fast path; the reference has no coordinate
// descent anywhere (its lasso benchmark runs the ADMM solver,
// run_pogs_comparison.py:245-291).
//
// Convergence: sweeps run until the max coordinate move is below
// tol_move * max|x|, then the exact subgradient-KKT residual
//   x_j != 0:  |g_j + l1_j sign(x_j)|      g = -A'r + l2 x
//   x_j == 0:  max(|g_j| - l1_j, 0)
// decides SUCCESS against tol_kkt (both absolute, caller scales).

#pragma once

#include <cmath>
#include <cstddef>
#include <vector>

#include "linalg.hpp"

namespace pogs_native {

struct CdResult {
  int sweeps = 0;
  double kkt = 0.0;
  double optval = 0.0;
  bool converged = false;
};

inline std::vector<double> cd_colmajor(size_t m, size_t n,
                                       const double* A_rm) {
  // Column-major copy: the j-loop needs unit-stride columns for the
  // multi-accumulator dot to vectorize.  Built once per matrix; the
  // weighted core reuses it across prox-Newton iterations.
  std::vector<double> Ac(m * n);
  for (size_t i = 0; i < m; ++i)
    for (size_t j = 0; j < n; ++j) Ac[j * m + i] = A_rm[i * n + j];
  return Ac;
}

// Core cyclic CD on a PREBUILT column-major matrix for
//   min (1/2)||A x - b||^2 + sum_j l1_j|x_j| + (l2_j/2)x_j^2.
// Callers with row weights (the logistic prox-Newton) scale sqrt(w)
// into the matrix/rhs once per outer iteration instead: a bandwidth-
// bound rescale pass measured cheaper than weighted three-stream dots
// in every sweep.  x holds the start point and receives the result;
// r_out, if non-null, receives b - A x.
inline CdResult cd_core(size_t m, size_t n, const double* Ac,
                        const double* b, const double* l1,
                        const double* l2, double tol_move, double tol_kkt,
                        int max_sweeps, double* x, double* r_out) {
  std::vector<double> r(b, b + m);  // r = b - A x
  for (size_t j = 0; j < n; ++j)
    if (x[j] != 0.0) axpy(m, -x[j], &Ac[j * m], r.data());

  std::vector<double> col_sq(n);
  for (size_t j = 0; j < n; ++j)
    col_sq[j] = dot(m, &Ac[j * m], &Ac[j * m]);

  CdResult res;
  auto kkt_residual = [&]() {
    double kkt = 0.0;
    for (size_t j = 0; j < n; ++j) {
      const double g = -dot(m, &Ac[j * m], r.data()) + l2[j] * x[j];
      double v;
      if (x[j] > 0.0)
        v = std::fabs(g + l1[j]);
      else if (x[j] < 0.0)
        v = std::fabs(g - l1[j]);
      else
        v = std::max(std::fabs(g) - l1[j], 0.0);
      if (v > kkt) kkt = v;
    }
    return kkt;
  };
  for (res.sweeps = 1; res.sweeps <= max_sweeps; ++res.sweeps) {
    double max_move = 0.0, max_x = 0.0;
    for (size_t j = 0; j < n; ++j) {
      const double* aj = &Ac[j * m];
      const double denom = col_sq[j] + l2[j];
      if (denom <= 0.0) {  // structurally zero column: x_j stays put
        continue;
      }
      const double x_old = x[j];
      // rho = a_j'(r + a_j x_j) = a_j'r + ||a_j||^2 x_j
      const double rho = dot(m, aj, r.data()) + col_sq[j] * x_old;
      double x_new;
      if (rho > l1[j])
        x_new = (rho - l1[j]) / denom;
      else if (rho < -l1[j])
        x_new = (rho + l1[j]) / denom;
      else
        x_new = 0.0;
      if (x_new != x_old) {
        axpy(m, x_old - x_new, aj, r.data());
        x[j] = x_new;
      }
      const double mv = std::fabs(x_new - x_old);
      if (mv > max_move) max_move = mv;
      const double ax = std::fabs(x_new);
      if (ax > max_x) max_x = ax;
    }
    if (max_move <= tol_move * std::max(max_x, 1e-12)) {
      // Candidate stop: confirm with the exact KKT residual (cheap:
      // n dots = one implicit gemv).
      res.kkt = kkt_residual();
      if (res.kkt <= tol_kkt) {
        res.converged = true;
        break;
      }
      // Not there yet: tighten the sweep tolerance and keep going.
      tol_move *= 0.1;
    }
  }
  if (res.sweeps > max_sweeps) {
    res.sweeps = max_sweeps;
    res.kkt = kkt_residual();
    res.converged = res.kkt <= tol_kkt;
  }
  double fit = 0.5 * dot(m, r.data(), r.data());
  double reg = 0.0;
  for (size_t j = 0; j < n; ++j)
    reg += l1[j] * std::fabs(x[j]) + 0.5 * l2[j] * x[j] * x[j];
  res.optval = fit + reg;
  if (r_out)
    for (size_t i = 0; i < m; ++i) r_out[i] = r[i];
  return res;
}

// A_rm is row-major (m x n).  x must hold the start point (zeros for a
// cold solve; a previous solution for warm starts) and receives the
// result.  r_out (size m), if non-null, receives the final residual
// b - A x (callers derive y/duals from it without another gemv).
inline CdResult cd_elastic_net(size_t m, size_t n, const double* A_rm,
                               const double* b, const double* l1,
                               const double* l2, double tol_move,
                               double tol_kkt, int max_sweeps, double* x,
                               double* r_out) {
  std::vector<double> Ac = cd_colmajor(m, n, A_rm);
  return cd_core(m, n, Ac.data(), b, l1, l2, tol_move, tol_kkt,
                 max_sweeps, x, r_out);
}

}  // namespace pogs_native
