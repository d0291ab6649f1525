// Native compute core: Wigner small-d tables and great-circle path matrices.
//
// This is the TPU build's C++ replacement for the roles the SSHT/S2LET C
// libraries and the greatcirclepaths package play in the reference
// (SURVEY.md 2a): heavy host-side precompute feeding the device matmul
// tables, parallelised with OpenMP.  The Python fallbacks in
// pxmcmc_tpu/ops/{wigner,paths}.py implement identical maths and act as the
// correctness oracle (tests/test_native.py checks bit-level agreement).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

// log( C(j,k) ) = 0.5*( lgamma(2j+1) - lgamma(j+k+1) - lgamma(j-k+1) )
inline double log_binom_norm(double j, double k) {
  return 0.5 * (std::lgamma(2.0 * j + 1.0) - std::lgamma(j + k + 1.0) -
                std::lgamma(j - k + 1.0));
}

}  // namespace

extern "C" {

// d^l_{m,n}(theta) for all l < L, |m| < L at T angles.
// out layout: [mi][t][l] with mi = m + L - 1, size (2L-1)*T*L doubles.
void wigner_d_table(int L, int n, const double* thetas, int T, double* out) {
  const int M = 2 * L - 1;
  const int an = n < 0 ? -n : n;
  std::memset(out, 0, sizeof(double) * (size_t)M * T * L);

#if defined(_OPENMP)
#pragma omp parallel for schedule(dynamic)
#endif
  for (int mi = 0; mi < M; ++mi) {
    const int m = mi - (L - 1);
    const int a = m < 0 ? -m : m;
    const int l0 = a > an ? a : an;
    if (l0 >= L) continue;

    std::vector<double> d_lm1(T, 0.0), d_l(T), d_next(T);

    // Seed d^{l0}_{m,n} in log space (see ops/wigner.py for the four cases).
    double jj, kk;
    int pc, ps;
    double sgn;
    if (a >= an) {
      jj = a;
      kk = n;
      if (m >= 0) {
        pc = a + n;
        ps = a - n;
        sgn = ((a - n) % 2 == 0) ? 1.0 : -1.0;
      } else {
        pc = a - n;
        ps = a + n;
        sgn = 1.0;
      }
    } else {
      jj = an;
      kk = m;
      if (n >= 0) {
        pc = an + m;
        ps = an - m;
        sgn = 1.0;
      } else {
        pc = an - m;
        ps = an + m;
        sgn = ((an + m) % 2 == 0) ? 1.0 : -1.0;
      }
    }
    const double logC = log_binom_norm(jj, kk);
    for (int t = 0; t < T; ++t) {
      const double c = std::cos(thetas[t] / 2.0);
      const double sb = std::sin(thetas[t] / 2.0);
      const double logc = std::log(std::fmax(std::fabs(c), 1e-300));
      const double logsb = std::log(std::fmax(std::fabs(sb), 1e-300));
      d_l[t] = sgn * std::exp(logC + pc * logc + ps * logsb);
    }

    // Upward three-term recursion in l.
    for (int l = l0; l < L; ++l) {
      double* row = out + ((size_t)mi * T) * L;
      for (int t = 0; t < T; ++t) row[(size_t)t * L + l] = d_l[t];
      if (l == L - 1) break;

      if (l == 0) {
        // only (m=0,n=0) reaches here; d^1_{00} = cos(theta) d^0_{00}
        for (int t = 0; t < T; ++t) d_next[t] = std::cos(thetas[t]) * d_l[t];
      } else {
        const double lf = l;
        const double b_num = (lf + 1.0) *
                             std::sqrt(std::fmax(lf * lf - (double)m * m, 0.0)) *
                             std::sqrt(std::fmax(lf * lf - (double)n * n, 0.0));
        const double denom =
            lf * std::sqrt(std::fmax((lf + 1) * (lf + 1) - (double)m * m, 0.0)) *
            std::sqrt((lf + 1) * (lf + 1) - (double)n * n);
        for (int t = 0; t < T; ++t) {
          const double x = std::cos(thetas[t]);
          const double a_num =
              (2.0 * lf + 1.0) * (lf * (lf + 1.0) * x - (double)m * n);
          d_next[t] = (a_num * d_l[t] - b_num * d_lm1[t]) / denom;
        }
      }
      std::swap(d_lm1, d_l);
      std::swap(d_l, d_next);
    }
  }
}

// Great-circle "average"-weighted path rows on the MW grid.
// start/stop: [npaths][2] (lat, lon) degrees; out: [npaths][L*(2L-1)].
void path_matrix(const double* start_latlon, const double* stop_latlon,
                 int npaths, int L, int points_per_rad, double* out) {
  const int npix = L * (2 * L - 1);
  const double pi = 3.14159265358979323846;
  std::memset(out, 0, sizeof(double) * (size_t)npaths * npix);

#if defined(_OPENMP)
#pragma omp parallel for schedule(dynamic)
#endif
  for (int p = 0; p < npaths; ++p) {
    const double lat1 = start_latlon[2 * p] * pi / 180.0;
    const double lon1 = start_latlon[2 * p + 1] * pi / 180.0;
    const double lat2 = stop_latlon[2 * p] * pi / 180.0;
    const double lon2 = stop_latlon[2 * p + 1] * pi / 180.0;
    const double ax = std::cos(lat1) * std::cos(lon1);
    const double ay = std::cos(lat1) * std::sin(lon1);
    const double az = std::sin(lat1);
    const double bx = std::cos(lat2) * std::cos(lon2);
    const double by = std::cos(lat2) * std::sin(lon2);
    const double bz = std::sin(lat2);
    double dot = ax * bx + ay * by + az * bz;
    dot = std::fmin(std::fmax(dot, -1.0), 1.0);
    const double alpha = std::acos(dot);
    int npts = (int)std::ceil(points_per_rad * alpha);
    if (npts < 2) npts = 2;
    const double salpha = alpha > 1e-12 ? std::sin(alpha) : 1.0;

    double* row = out + (size_t)p * npix;
    for (int i = 0; i < npts; ++i) {
      const double t = (double)i / (npts - 1);
      const double sa = std::sin((1.0 - t) * alpha) / salpha;
      const double sb = std::sin(t * alpha) / salpha;
      double x = ax * sa + bx * sb;
      double y = ay * sa + by * sb;
      double z = az * sa + bz * sb;
      const double r = std::sqrt(x * x + y * y + z * z);
      x /= r;
      y /= r;
      z /= r;
      double zz = std::fmin(std::fmax(z, -1.0), 1.0);
      const double theta = std::acos(zz);
      double phi = std::atan2(y, x);
      if (phi < 0) phi += 2.0 * pi;
      int t_idx = (int)std::llround((theta * (2 * L - 1) / pi - 1.0) / 2.0);
      if (t_idx < 0) t_idx = 0;
      if (t_idx > L - 1) t_idx = L - 1;
      long p_idx = std::llround(phi * (2 * L - 1) / (2.0 * pi));
      p_idx = ((p_idx % (2 * L - 1)) + (2 * L - 1)) % (2 * L - 1);
      row[(size_t)t_idx * (2 * L - 1) + p_idx] += 1.0;
    }
    const double inv = 1.0 / npts;
    for (int i = 0; i < npix; ++i) row[i] *= inv;
  }
}

int pxtpu_num_threads() {
#if defined(_OPENMP)
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
