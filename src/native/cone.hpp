// Cone library — native host runtime.
//
// Euclidean projections onto the product cone (Zero / NonNeg / NonPos /
// SOC / ExpPrimal / ExpDual) and the graph-form cone objective, mirroring
// the Python layer (pogs_tpu/cones/, pogs_tpu/solver/cone.py) and the
// reference semantics (reference: src/include/prox_lib_cone.h:23-66
// cone types/validation, :311-346 separable+SOC, :94-294 exp cones;
// cone objective src/cpu/pogs.cpp:642-785).
//
// The SDP cone IS implemented natively (beyond the reference GPU backend,
// which omits it, prox_lib_cone.h:599-603; parity with reference CPU's
// LAPACK-syevd path, prox_lib_cone.h:349-435) via a dependency-free
// cyclic-Jacobi eigensolver (linalg.hpp::jacobi_eigh).  Packing is
// column-major lower-triangular in the SVEC convention: off-diagonal
// entries carry a sqrt(2) weight so the packed l2 norm equals the matrix
// Frobenius norm and the eigenvalue clamp is the exact Euclidean
// projection (the Python layer documents the same choice,
// pogs_tpu/cones/projections.py::project_sdp_packed).
#pragma once

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <limits>
#include <vector>

#include "linalg.hpp"

namespace pogs_native {

enum ConeKind : std::int32_t {
  kConeZero = 0,
  kConeNonNeg = 1,
  kConeNonPos = 2,
  kConeSoc = 3,
  kConeSdp = 4,        // svec-packed lower-tri, column-major
  kConeExpPrimal = 5,
  kConeExpDual = 6,
};

struct ConeConstraintNative {
  std::int32_t cone = kConeZero;
  std::vector<std::size_t> indices;
};

// --------------------------------------------------------------------------
// Exponential-cone projection: KKT reduction to a 1-D root find in
// u = x*/y* (same equation as the Python implementation,
// pogs_tpu/cones/projections.py:87-189):
//   sign F(u) = sign(G(u)) * sign(e^{2u} + u),
//   G(u) = e^{2u}(s - r(1-u)) + u(s + t e^u (1-u)) - t e^u - r
// bisected on each side of the pole of e^{2u}+u, then the answer is the
// nearest *feasible* candidate among {v if in-cone, the ray point, 0,
// boundary points from the roots}.
// --------------------------------------------------------------------------

namespace detail {

constexpr double kExpPole = -0.4263027510068963;
constexpr double kExpU = 50.0;

inline double safe_exp(double x) {
  return std::exp(std::clamp(x, -3.0 * kExpU, 3.0 * kExpU));
}

inline double sign_F(double u, double r, double s, double t) {
  const double w = safe_exp(u);
  const double w2 = w * w;
  const double G =
      w2 * (s - r * (1.0 - u)) + u * (s + t * w * (1.0 - u)) - t * w - r;
  const double den = w2 + u;
  return (G > 0 ? 1.0 : G < 0 ? -1.0 : 0.0) * (den > 0 ? 1.0 : -1.0);
}

inline double bisect_F(double lo, double hi, double r, double s, double t) {
  const double slo = sign_F(lo, r, s, t);
  for (int it = 0; it < 80; ++it) {
    const double mid = 0.5 * (lo + hi);
    if (sign_F(mid, r, s, t) == slo) lo = mid; else hi = mid;
  }
  return 0.5 * (lo + hi);
}

// G can have SEVERAL roots per branch and only the KKT-valid one
// (lambda >= 0) is the projection: a single whole-branch bisection can
// land on an invalid root while missing the valid one (same fix as
// cones/projections.py — grid-scan, bisect every sign-change bracket).
inline int scan_branch_roots(double lo0, double hi0, double r, double s,
                             double t, double* roots, int n_keep) {
  constexpr int kGrid = 65;
  const double step = (hi0 - lo0) / (kGrid - 1);
  double prev_u = lo0;
  double prev_s = sign_F(prev_u, r, s, t);
  int count = 0;
  for (int i = 1; i < kGrid && count < n_keep; ++i) {
    const double cur_u = lo0 + step * i;
    const double cur_s = sign_F(cur_u, r, s, t);
    if (prev_s * cur_s <= 0)
      roots[count++] = bisect_F(prev_u, cur_u, r, s, t);
    prev_u = cur_u;
    prev_s = cur_s;
  }
  return count;
}

}  // namespace detail

inline void project_exp_primal(const double* v, double* out) {
  const double r = v[0], s = v[1], t = v[2];
  const double tol = 1e-9;

  double best[3];
  double best_d2 = std::numeric_limits<double>::max();
  auto consider = [&](double a, double b, double c) {
    const double d2 = (a - r) * (a - r) + (b - s) * (b - s) + (c - t) * (c - t);
    if (d2 < best_d2) { best_d2 = d2; best[0] = a; best[1] = b; best[2] = c; }
  };

  // v already in the cone.
  const double spos = std::max(s, 1e-300);
  if ((s > tol && spos * detail::safe_exp(r / spos) <= t + tol) ||
      (std::abs(s) <= tol && r <= tol && t >= -tol)) {
    consider(r, s, t);
  }
  // The boundary ray {r <= 0, s = 0, t >= 0} and the origin.
  consider(std::min(r, 0.0), 0.0, std::max(t, 0.0));
  consider(0.0, 0.0, 0.0);

  // Boundary points from EVERY bracketed root of both branches, using
  // the cancellation-free forms z* = w(r + t w)/(w^2 + u), y* = z*/w
  // (stable as w -> 0 near the z = 0 edge), filtered by lambda >= 0 —
  // lambda < 0 roots are KKT-invalid and can otherwise win the
  // nearest-candidate selection with a feasible but suboptimal point.
  double roots[6];
  int n_roots = detail::scan_branch_roots(
      -detail::kExpU, detail::kExpPole - 1e-9, r, s, t, roots, 3);
  n_roots += detail::scan_branch_roots(
      detail::kExpPole + 1e-9, detail::kExpU, r, s, t, roots + n_roots, 3);
  for (int k = 0; k < n_roots; ++k) {
    const double u = roots[k];
    const double w = detail::safe_exp(u);
    double den = w * w + u;
    if (std::abs(den) < 1e-30) den = 1e-30;
    const double num = (r + t * w) / den;
    const double z_star = w * num;
    if (z_star > 0 && z_star - t >= -tol * (1.0 + std::abs(t)))
      consider(u * num, num, z_star);
  }
  out[0] = best[0]; out[1] = best[1]; out[2] = best[2];
}

// --------------------------------------------------------------------------
// PSD cone projection in svec coordinates.
//
// packed: length L = d(d+1)/2, column-major lower triangle, off-diagonals
// scaled by sqrt(2).  Unpack -> symmetric d x d, eigendecompose (cyclic
// Jacobi), clamp eigenvalues at 0, reconstruct, repack.  L -> d via the
// triangular-number inverse.
// --------------------------------------------------------------------------

inline std::size_t sdp_side_from_packed(std::size_t L) {
  const std::size_t d =
      std::size_t((std::sqrt(8.0 * double(L) + 1.0) - 1.0) / 2.0 + 0.5);
  return d * (d + 1) / 2 == L ? d : 0;
}

inline void project_sdp_svec(double* packed, std::size_t L) {
  const std::size_t d = sdp_side_from_packed(L);
  if (d == 0) return;
  const double inv_rt2 = 1.0 / std::sqrt(2.0);
  std::vector<double> S(d * d), V(d * d), lam(d);
  // Unpack (column-major lower tri): [a11, a21, .., ad1, a22, a32, ...].
  std::size_t idx = 0;
  for (std::size_t col = 0; col < d; ++col) {
    for (std::size_t row = col; row < d; ++row, ++idx) {
      const double v = row == col ? packed[idx] : packed[idx] * inv_rt2;
      S[row * d + col] = v;
      S[col * d + row] = v;
    }
  }
  jacobi_eigh(d, S.data(), V.data(), lam.data());
  for (auto& l : lam) l = std::max(l, 0.0);
  // Repack X+ = V diag(lam) V^T, lower tri only.
  idx = 0;
  for (std::size_t col = 0; col < d; ++col) {
    for (std::size_t row = col; row < d; ++row, ++idx) {
      double acc = 0.0;
      for (std::size_t k = 0; k < d; ++k)
        acc += V[row * d + k] * lam[k] * V[col * d + k];
      packed[idx] = row == col ? acc : acc * std::sqrt(2.0);
    }
  }
}

// Moreau decomposition: Pi_{K*}(v) = v + Pi_K(-v) (prox_lib_cone.h:282-294).
inline void project_exp_dual(const double* v, double* out) {
  double neg[3] = {-v[0], -v[1], -v[2]};
  double p[3];
  project_exp_primal(neg, p);
  out[0] = v[0] + p[0]; out[1] = v[1] + p[1]; out[2] = v[2] + p[2];
}

// --------------------------------------------------------------------------
// Product-cone projection over a constraint list (free coords = identity).
// --------------------------------------------------------------------------

struct ConeSetNative {
  std::vector<ConeConstraintNative> constraints;
  std::size_t dim = 0;

  bool has_sdp() const {
    for (const auto& c : constraints)
      if (c.cone == kConeSdp) return true;
    return false;
  }

  bool empty() const { return constraints.empty(); }

  // In-place projection of v (length dim).
  void project(double* v) const {
    for (const auto& c : constraints) {
      switch (c.cone) {
        case kConeZero:
          for (auto i : c.indices) v[i] = 0.0;
          break;
        case kConeNonNeg:
          for (auto i : c.indices) v[i] = std::max(v[i], 0.0);
          break;
        case kConeNonPos:
          for (auto i : c.indices) v[i] = std::min(v[i], 0.0);
          break;
        case kConeSoc: {
          // (p, x): ||x|| <= p (prox_lib_cone.h:330-346).
          const double p = v[c.indices[0]];
          double nrm2_ = 0.0;
          for (std::size_t k = 1; k < c.indices.size(); ++k)
            nrm2_ += v[c.indices[k]] * v[c.indices[k]];
          const double nrm = std::sqrt(nrm2_);
          if (nrm <= -p) {
            for (auto i : c.indices) v[i] = 0.0;
          } else if (nrm > std::abs(p)) {
            const double scale = 0.5 * (1.0 + p / std::max(nrm, 1e-300));
            v[c.indices[0]] = scale * nrm;
            for (std::size_t k = 1; k < c.indices.size(); ++k)
              v[c.indices[k]] *= scale;
          }
          break;
        }
        case kConeExpPrimal: {
          double in[3] = {v[c.indices[0]], v[c.indices[1]], v[c.indices[2]]};
          double outp[3];
          project_exp_primal(in, outp);
          for (int k = 0; k < 3; ++k) v[c.indices[k]] = outp[k];
          break;
        }
        case kConeExpDual: {
          double in[3] = {v[c.indices[0]], v[c.indices[1]], v[c.indices[2]]};
          double outp[3];
          project_exp_dual(in, outp);
          for (int k = 0; k < 3; ++k) v[c.indices[k]] = outp[k];
          break;
        }
        case kConeSdp: {
          std::vector<double> packed(c.indices.size());
          for (std::size_t k = 0; k < c.indices.size(); ++k)
            packed[k] = v[c.indices[k]];
          project_sdp_svec(packed.data(), packed.size());
          for (std::size_t k = 0; k < c.indices.size(); ++k)
            v[c.indices[k]] = packed[k];
          break;
        }
        default:
          break;  // unreachable: kinds validated at load
      }
    }
  }

  // Equilibration hook: average scalings within each non-separable cone
  // (pogs.cpp:758-782; Python ConeSet.constrain_average).
  void constrain_average(std::vector<double>& w) const {
    for (const auto& c : constraints) {
      if (c.cone == kConeZero || c.cone == kConeNonNeg ||
          c.cone == kConeNonPos || c.indices.empty())
        continue;
      double mean = 0.0;
      for (auto i : c.indices) mean += w[i];
      mean /= double(c.indices.size());
      for (auto i : c.indices) w[i] = mean;
    }
  }
};

}  // namespace pogs_native
