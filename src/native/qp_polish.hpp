// Primal-dual active-set (PDAS) polish for box/polyhedral QPs — native
// twin of pogs_tpu/solver/qp_polish.py (independent implementation; same
// scheme: Hintermüller–Ito–Kunisch semismooth Newton seeded at the ADMM
// iterate, best-iterate acceptance so a rejected polish never degrades
// the result).  The reference has no QP polish at all — its QP path
// stops at ADMM accuracy (reference src/cpu/pogs.cpp:1935-1944).
//
// Reach: the polish converges when the ADMM seed roughly identifies the
// active set (measured: the HS/Maros toys and moderate QPs land at
// machine precision).  On CVXQP-class conditioning (cond(P) ~ 1e18) the
// graph-form cone-ADMM seed itself stalls at O(1e-1) residuals — there
// the polish is correctly rejected and the solve reports MAX_ITER
// honestly; the Python epigraph-SOC HSDE route (ConeSolver qp_via=
// "socp", the default) is the robust path for those.
#pragma once

#include <cmath>
#include <cstdint>
#include <cstring>
#include <set>
#include <string>
#include <vector>

#include "cone.hpp"
#include "linalg.hpp"

namespace pogs_native {

// ---------------------------------------------------------------------------
// Dense LU with partial pivoting (the KKT matrix is symmetric indefinite,
// so Cholesky does not apply; LU + iterative refinement is robust at the
// dims this polish handles).
// ---------------------------------------------------------------------------

inline bool lu_factor(std::size_t n, double* A, int* piv) {
  for (std::size_t k = 0; k < n; ++k) {
    std::size_t p = k;
    double best = std::abs(A[k * n + k]);
    for (std::size_t i = k + 1; i < n; ++i) {
      const double v = std::abs(A[i * n + k]);
      if (v > best) { best = v; p = i; }
    }
    if (best == 0.0 || !std::isfinite(best)) return false;
    piv[k] = int(p);
    if (p != k)
      for (std::size_t j = 0; j < n; ++j)
        std::swap(A[k * n + j], A[p * n + j]);
    const double inv = 1.0 / A[k * n + k];
    for (std::size_t i = k + 1; i < n; ++i) {
      const double l = A[i * n + k] * inv;
      A[i * n + k] = l;
      if (l != 0.0)
        for (std::size_t j = k + 1; j < n; ++j)
          A[i * n + j] -= l * A[k * n + j];
    }
  }
  return true;
}

inline void lu_solve(std::size_t n, const double* LU, const int* piv,
                     const double* b, double* x) {
  for (std::size_t i = 0; i < n; ++i) x[i] = b[i];
  for (std::size_t k = 0; k < n; ++k) {
    if (std::size_t(piv[k]) != k) std::swap(x[k], x[piv[k]]);
    for (std::size_t i = k + 1; i < n; ++i) x[i] -= LU[i * n + k] * x[k];
  }
  for (std::size_t ii = n; ii-- > 0;) {
    for (std::size_t j = ii + 1; j < n; ++j) x[ii] -= LU[ii * n + j] * x[j];
    x[ii] /= LU[ii * n + ii];
  }
}

// ---------------------------------------------------------------------------
// Row classification: 0 = equality (Zero cone), +1 = NonNeg slack, -1 =
// NonPos slack.  Returns false when any row sits in a non-polyhedral
// cone (or outside every cone) — the polish only applies to linear cones.
// ---------------------------------------------------------------------------

inline bool qp_row_kinds(const ConeSetNative& Ky, std::size_t m,
                         std::vector<std::int8_t>& kind) {
  kind.assign(m, 2);
  for (const auto& cc : Ky.constraints) {
    std::int8_t k;
    if (cc.cone == kConeZero) k = 0;
    else if (cc.cone == kConeNonNeg) k = 1;
    else if (cc.cone == kConeNonPos) k = -1;
    else return false;
    for (std::size_t i : cc.indices) kind[i] = k;
  }
  for (std::size_t i = 0; i < m; ++i)
    if (kind[i] == 2) return false;
  return true;
}

struct QpKktResiduals {
  double stat = 0.0, pri = 0.0, sign = 0.0, comp = 0.0;
  double score() const {
    return std::max(std::max(stat, pri), std::max(sign, comp));
  }
};

// Relative inf-norm KKT residuals of (x, lam) for
//   min ½xᵀPx + cᵀx  s.t. rows of (A, b) with the kind classes above.
inline QpKktResiduals qp_kkt_residuals(
    std::size_t m, std::size_t n, const double* P, const double* c,
    const double* A, const double* b, const std::vector<std::int8_t>& kind,
    const double* x, const double* lam) {
  std::vector<double> Px(n), Atl(n, 0.0), s(m);
  gemv(n, n, P, x, Px.data());
  gemv_t(m, n, A, lam, Atl.data());
  gemv(m, n, A, x, s.data());
  for (std::size_t i = 0; i < m; ++i) s[i] = b[i] - s[i];
  double mx_px = 0, mx_c = 0, mx_atl = 0, mx_b = 0, mx_l = 0, mx_s = 0;
  for (std::size_t j = 0; j < n; ++j) {
    mx_px = std::max(mx_px, std::abs(Px[j]));
    mx_c = std::max(mx_c, std::abs(c[j]));
    mx_atl = std::max(mx_atl, std::abs(Atl[j]));
  }
  for (std::size_t i = 0; i < m; ++i) {
    mx_b = std::max(mx_b, std::abs(b[i]));
    mx_l = std::max(mx_l, std::abs(lam[i]));
    mx_s = std::max(mx_s, std::abs(s[i]));
  }
  QpKktResiduals r;
  double stat = 0;
  for (std::size_t j = 0; j < n; ++j)
    stat = std::max(stat, std::abs(Px[j] + c[j] + Atl[j]));
  r.stat = stat / (1.0 + std::max(mx_px, std::max(mx_c, mx_atl)));
  double pri = 0, sgn = 0, comp = 0;
  for (std::size_t i = 0; i < m; ++i) {
    if (kind[i] == 0) {
      pri = std::max(pri, std::abs(s[i]));
    } else {
      pri = std::max(pri, std::max(-double(kind[i]) * s[i], 0.0));
      sgn = std::max(sgn, std::max(-double(kind[i]) * lam[i], 0.0));
      comp = std::max(comp, std::abs(lam[i] * s[i]));
    }
  }
  r.pri = pri / (1.0 + mx_b);
  r.sign = sgn / (1.0 + mx_l);
  r.comp = comp / (1.0 + mx_l * mx_s);
  return r;
}

// Regularized KKT solve with iterative refinement against the
// unregularized system (quasi-definite regularization ±delta).
inline bool qp_kkt_solve(std::size_t n, std::size_t k, const double* P,
                         const double* A_act, const double* c,
                         const double* b_act, double* x, double* lam_act) {
  const double kDelta = 1e-9;
  const int kRefine = 4;
  const std::size_t dim = n + k;
  std::vector<double> K(dim * dim, 0.0), K_reg, rhs(dim), z(dim), r(dim),
      dz(dim);
  for (std::size_t i = 0; i < n; ++i)
    for (std::size_t j = 0; j < n; ++j) K[i * dim + j] = P[i * n + j];
  for (std::size_t i = 0; i < k; ++i)
    for (std::size_t j = 0; j < n; ++j) {
      K[(n + i) * dim + j] = A_act[i * n + j];
      K[j * dim + n + i] = A_act[i * n + j];
    }
  K_reg = K;
  for (std::size_t i = 0; i < n; ++i) K_reg[i * dim + i] += kDelta;
  for (std::size_t i = n; i < dim; ++i) K_reg[i * dim + i] -= kDelta;
  for (std::size_t j = 0; j < n; ++j) rhs[j] = -c[j];
  for (std::size_t i = 0; i < k; ++i) rhs[n + i] = b_act[i];
  std::vector<int> piv(dim);
  if (!lu_factor(dim, K_reg.data(), piv.data())) return false;
  lu_solve(dim, K_reg.data(), piv.data(), rhs.data(), z.data());
  for (int it = 0; it < kRefine; ++it) {
    gemv(dim, dim, K.data(), z.data(), r.data());
    for (std::size_t i = 0; i < dim; ++i) r[i] = rhs[i] - r[i];
    lu_solve(dim, K_reg.data(), piv.data(), r.data(), dz.data());
    for (std::size_t i = 0; i < dim; ++i) z[i] += dz[i];
  }
  for (std::size_t i = 0; i < dim; ++i)
    if (!std::isfinite(z[i])) return false;
  for (std::size_t j = 0; j < n; ++j) x[j] = z[j];
  for (std::size_t i = 0; i < k; ++i) lam_act[i] = z[n + i];
  return true;
}

// Sign-constrained least-squares dual on the active rows (deletion-loop
// NNLS: solve the unconstrained LS over the working set via regularized
// normal equations, drop wrong-signed inequality multipliers, repeat).
// Used to repair the non-unique duals a degenerate active set produces:
// the KKT LU can return wrong-signed multipliers at the exact primal
// optimum, which must not block acceptance.
inline bool qp_repair_duals(std::size_t m, std::size_t n, const double* P,
                            const double* c, const double* A,
                            const std::vector<std::int8_t>& kind,
                            const double* x, const std::vector<char>& act,
                            std::vector<double>& lam_out) {
  std::vector<double> g(n);
  gemv(n, n, P, x, g.data());
  for (std::size_t j = 0; j < n; ++j) g[j] += c[j];
  std::vector<std::size_t> W;
  for (std::size_t i = 0; i < m; ++i)
    if (act[i]) W.push_back(i);
  lam_out.assign(m, 0.0);
  if (W.empty()) return false;
  const double kDelta = 1e-10;
  for (int pass = 0; pass < 30; ++pass) {
    const std::size_t k = W.size();
    // Normal equations  (A_W A_Wᵀ + δI) λ_W = −A_W g.
    std::vector<double> M(k * k), rhs(k), lamW(k);
    for (std::size_t a = 0; a < k; ++a) {
      const double* ra = &A[W[a] * n];
      rhs[a] = -dot(n, ra, g.data());
      for (std::size_t bb = a; bb < k; ++bb) {
        const double v = dot(n, ra, &A[W[bb] * n]);
        M[a * k + bb] = v;
        M[bb * k + a] = v;
      }
      M[a * k + a] += kDelta * (1.0 + M[a * k + a]);
    }
    if (!cholesky(k, M.data())) return false;
    cholesky_solve(k, M.data(), rhs.data(), lamW.data());
    // Drop wrong-signed inequality multipliers.
    std::vector<std::size_t> W2;
    for (std::size_t a = 0; a < k; ++a) {
      const std::int8_t kd = kind[W[a]];
      if (kd != 0 && double(kd) * lamW[a] < 0.0) continue;
      W2.push_back(W[a]);
    }
    if (W2.size() == W.size() || W2.empty()) {
      for (std::size_t a = 0; a < k; ++a) {
        const std::int8_t kd = kind[W[a]];
        lam_out[W[a]] =
            (kd != 0 && double(kd) * lamW[a] < 0.0) ? 0.0 : lamW[a];
      }
      return true;
    }
    W.swap(W2);
  }
  return false;
}

// The PDAS loop.  On success writes the polished (x, lam) and residuals.
inline bool qp_active_set_polish(
    std::size_t m, std::size_t n, const double* P, const double* c,
    const double* A, const double* b, const std::vector<std::int8_t>& kind,
    const double* x_seed, const double* lam_seed, double tol,
    std::vector<double>& x_out, std::vector<double>& lam_out,
    QpKktResiduals& res_out) {
  const std::size_t kMaxKktDim = 4000;
  const int kMaxIter = 40;
  for (std::size_t j = 0; j < n; ++j)
    if (!std::isfinite(x_seed[j])) return false;
  for (std::size_t i = 0; i < m; ++i)
    if (!std::isfinite(lam_seed[i])) return false;

  const QpKktResiduals base = qp_kkt_residuals(m, n, P, c, A, b, kind,
                                               x_seed, lam_seed);
  std::vector<double> s(m), s0(m);
  gemv(m, n, A, x_seed, s0.data());
  for (std::size_t i = 0; i < m; ++i) s0[i] = b[i] - s0[i];
  s = s0;

  // Multiple PDAS starts: the standard primal-dual seed, then (when the
  // duals are unreliable — a stalled ADMM) slack-only seeds at widening
  // activity thresholds.  All attempts share the visited-set cycle
  // guard, so later attempts only explore new active sets.
  std::vector<char> act(m);
  double s_scale = 1.0;
  for (std::size_t i = 0; i < m; ++i)
    s_scale = std::max(s_scale, std::abs(b[i]));
  const double slack_eps[] = {1e-6, 1e-4, 1e-2};

  bool have_best = false;
  double best_score = base.score();
  std::set<std::string> seen;
  std::vector<double> x_p(n), lam_p(m), A_act, b_act, lam_act;
  for (int attempt = 0; attempt < 4 && !have_best; ++attempt) {
  for (std::size_t i = 0; i < m; ++i) {
    if (attempt == 0)
      act[i] = (kind[i] == 0) ||
               (double(kind[i]) * (lam_seed[i] - s0[i]) > 0.0);
    else
      act[i] = (kind[i] == 0) ||
               (double(kind[i]) * s0[i] < slack_eps[attempt - 1] * s_scale);
  }
  for (int it = 0; it < kMaxIter; ++it) {
    std::string key(act.begin(), act.end());
    if (!seen.insert(key).second) break;  // cycle
    std::size_t k = 0;
    for (std::size_t i = 0; i < m; ++i) k += act[i] ? 1 : 0;
    if (n + k > kMaxKktDim) break;
    A_act.assign(k * n, 0.0);
    b_act.resize(k);
    lam_act.resize(k);
    std::vector<std::size_t> rows;
    rows.reserve(k);
    for (std::size_t i = 0; i < m; ++i)
      if (act[i]) rows.push_back(i);
    for (std::size_t t = 0; t < k; ++t) {
      std::memcpy(&A_act[t * n], &A[rows[t] * n], n * sizeof(double));
      b_act[t] = b[rows[t]];
    }
    if (!qp_kkt_solve(n, k, P, A_act.data(), c, b_act.data(), x_p.data(),
                      lam_act.data()))
      break;
    std::fill(lam_p.begin(), lam_p.end(), 0.0);
    for (std::size_t t = 0; t < k; ++t) lam_p[rows[t]] = lam_act[t];
    QpKktResiduals res =
        qp_kkt_residuals(m, n, P, c, A, b, kind, x_p.data(), lam_p.data());
    // Degenerate active sets have non-unique duals: the LU can return
    // wrong-signed multipliers at the exact primal optimum.  Repair the
    // ACCEPTANCE CANDIDATE with the sign-constrained LS dual over the
    // point's TIGHT rows (slack-identified — the PDAS working set may
    // exclude tight rows the sign-feasible dual needs); the raw LU
    // duals keep driving the PDAS update (a repaired trajectory cycles
    // early — matches qp_polish.py).
    std::vector<double> lam_cand(lam_p);
    if (res.sign > tol && res.stat <= tol && res.pri <= tol &&
        res.comp <= tol) {
      gemv(m, n, A, x_p.data(), s.data());
      std::vector<char> act_r(m);
      for (std::size_t i = 0; i < m; ++i) {
        const double sl = b[i] - s[i];
        act_r[i] = (kind[i] == 0) || (std::abs(sl) <= 1e-8 * s_scale);
      }
      std::vector<double> lam_r;
      if (qp_repair_duals(m, n, P, c, A, kind, x_p.data(), act_r, lam_r)) {
        const QpKktResiduals res_r = qp_kkt_residuals(
            m, n, P, c, A, b, kind, x_p.data(), lam_r.data());
        if (res_r.score() < res.score()) {
          lam_cand = lam_r;
          res = res_r;
        }
      }
    }
    // ALL four residuals must meet tolerance: small stat+pri with bad
    // dual sign/complementarity is the KKT point of the WRONG active
    // set (an over-constrained subproblem), not the QP optimum.
    if (res.score() < best_score && res.score() <= tol) {
      best_score = res.score();
      x_out.assign(x_p.begin(), x_p.end());
      lam_out.assign(lam_cand.begin(), lam_cand.end());
      res_out = res;
      have_best = true;
    }
    gemv(m, n, A, x_p.data(), s.data());
    for (std::size_t i = 0; i < m; ++i) s[i] = b[i] - s[i];
    std::vector<char> new_act(m);
    for (std::size_t i = 0; i < m; ++i)
      new_act[i] = (kind[i] == 0) ||
                   (double(kind[i]) * (lam_p[i] - s[i]) > 0.0);
    if (new_act == act) break;
    act.swap(new_act);
  }
  }
  return have_best;
}

}  // namespace pogs_native
