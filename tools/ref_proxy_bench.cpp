// Reference-proxy benchmark: single-core sequential likelihood loops.
//
// The reference (TheoMichelot/smoothSDE) evaluates its likelihoods as
// sequential AD-taped C++ loops on one CPU core (nllk_ctcrw.hpp:195-247,
// tr_dens.hpp:53-67), shipped compiled -O0 (src/Makefile:4). It
// publishes no benchmark numbers (BASELINE.md), so this program provides
// a measured *optimistic* stand-in: the same sequential math, plain
// double C++ at -O2, value only (no AD tape, whose replay typically
// costs several times the plain function, and no gradient, which in TMB
// pays a further reverse sweep). Any speedup measured against this
// proxy is therefore a LOWER bound on the speedup over the actual
// reference engine.
//
//   1. 1M-step 2-D CTCRW Kalman filter nllk (per-dim 2x2 blocks — the
//      block-diagonal structure of nllk_ctcrw.hpp:49-75, exploited here
//      even though the reference runs dense Eigen (2d x 2d) ops).
//   2. 1M-step CIR transition nllk via the noncentral-chi^2 density
//      with std::cyl_bessel_i in log form (tr_dens.hpp:53-67).
//
// Build & run:  g++ -O2 -march=native -o /tmp/ref_proxy tools/ref_proxy_bench.cpp
//               /tmp/ref_proxy
// Prints one JSON line per workload.

#include <chrono>
#include <cmath>
#include <cstdio>
#include <random>
#include <vector>

static double now_ms() {
  using namespace std::chrono;
  return duration<double, std::milli>(steady_clock::now().time_since_epoch())
      .count();
}

// 2-D CTCRW: two independent (position, velocity) 2x2 filters sharing
// parameters; mirrors makeT/makeQ/makeB of nllk_ctcrw.hpp:46-91.
static double ctcrw_nllk(const std::vector<double>& dt,
                         const std::vector<double>& obs,  // n x 2
                         double mu1, double mu2, double tau, double nu,
                         double sigma_obs) {
  const size_t n = dt.size();
  const double beta = 1.0 / tau;
  const double sigma = 2.0 * nu / std::sqrt(M_PI * tau);
  const double s2 = sigma * sigma;
  const double H = sigma_obs * sigma_obs;
  const double mu[2] = {mu1, mu2};

  double nllk = 0.0;
  for (int d = 0; d < 2; ++d) {
    // state a = (z, v), covariance P (2x2 symmetric)
    double a0 = obs[d], a1 = 0.0;
    double P00 = 1.0, P01 = 0.0, P11 = 10.0;
    for (size_t i = 1; i < n; ++i) {
      const double h = dt[i];
      const double e = std::exp(-beta * h);
      // T = [[1, (1-e)/beta], [0, e]]
      const double T01 = (1.0 - e) / beta;
      // B*mu drift
      const double b0 = mu[d] * (h - T01);
      const double b1 = mu[d] * (1.0 - e);
      // Q (exact CTCRW integrals, nllk_ctcrw.hpp:64-75)
      const double q11 = s2 / (2.0 * beta) * (1.0 - e * e);
      const double q01 = s2 / (2.0 * beta * beta) * (1.0 - 2.0 * e + e * e);
      const double q00 =
          s2 / (beta * beta) *
          (h - 2.0 / beta * (1.0 - e) + 1.0 / (2.0 * beta) * (1.0 - e * e));
      // predict
      const double pa0 = a0 + T01 * a1 + b0;
      const double pa1 = e * a1 + b1;
      const double PP00 =
          P00 + T01 * (P01 + P01 + T01 * P11) + q00;
      const double PP01 = e * (P01 + T01 * P11) + q01;
      const double PP11 = e * e * P11 + q11;
      // update with scalar observation of position
      const double F = PP00 + H;
      const double y = obs[2 * i + d] - pa0;
      nllk += 0.5 * (std::log(2.0 * M_PI * F) + y * y / F);
      const double K0 = PP00 / F, K1 = PP01 / F;
      a0 = pa0 + K0 * y;
      a1 = pa1 + K1 * y;
      P00 = PP00 * (1.0 - K0);
      P01 = PP01 * (1.0 - K0);
      P11 = PP11 - K1 * PP01;
    }
  }
  return nllk;
}

// CIR transition nllk via noncentral chi^2 (tr_dens.hpp:53-67).
static double cir_nllk(const std::vector<double>& z, double dt, double mu,
                       double beta, double sigma) {
  const size_t n = z.size();
  const double q = 2.0 * beta * mu / (sigma * sigma) - 1.0;
  double nllk = 0.0;
  for (size_t i = 1; i < n; ++i) {
    const double c =
        2.0 * beta / (sigma * sigma * (1.0 - std::exp(-beta * dt)));
    const double u = c * z[i - 1] * std::exp(-beta * dt);
    const double v = c * z[i];
    const double logI =
        std::log(std::cyl_bessel_i(q, 2.0 * std::sqrt(u * v)));
    nllk -= std::log(c) - u - v + 0.5 * q * std::log(v / u) + logI;
  }
  return nllk;
}

int main() {
  const size_t n = 1000000;
  std::mt19937_64 gen(0);
  std::uniform_real_distribution<double> U(0.4, 0.6);
  std::normal_distribution<double> N(0.0, 1.0);

  std::vector<double> dt(n), obs(2 * n);
  double z1 = 0.0, z2 = 0.0;
  for (size_t i = 0; i < n; ++i) {
    dt[i] = U(gen);
    z1 += 0.3 * N(gen);
    z2 += 0.3 * N(gen);
    obs[2 * i] = z1;
    obs[2 * i + 1] = z2;
  }

  {
    volatile double sink = 0.0;
    double best = 1e30;
    for (int r = 0; r < 5; ++r) {
      const double t0 = now_ms();
      sink = ctcrw_nllk(dt, obs, 0.0, 0.0, 2.0, 1.0, 0.1);
      const double el = now_ms() - t0;
      if (el < best) best = el;
    }
    std::printf(
        "{\"metric\": \"ref_proxy_ctcrw_1m_nllk_ms\", \"value\": %.2f, "
        "\"nllk\": %.2f, \"note\": \"single-core -O2 value-only, no AD\"}\n",
        best, (double)sink);
  }

  {
    std::vector<double> zc(n);
    for (size_t i = 0; i < n; ++i) zc[i] = 2.0 + 0.3 * N(gen);
    volatile double sink = 0.0;
    double best = 1e30;
    for (int r = 0; r < 3; ++r) {
      const double t0 = now_ms();
      sink = cir_nllk(zc, 0.1, 2.0, 0.8, 0.5);
      const double el = now_ms() - t0;
      if (el < best) best = el;
    }
    std::printf(
        "{\"metric\": \"ref_proxy_cir_1m_nllk_ms\", \"value\": %.2f, "
        "\"nllk\": %.2f, \"note\": \"single-core -O2 value-only, no AD\"}\n",
        best, (double)sink);
  }
  return 0;
}
