// Single-core C++ FIT-LOOP baseline for the end-to-end ratio
// (VERDICT r3 item 4): a full BFGS fit — value + central-finite-
// difference gradient per iteration, Armijo backtracking line search —
// over the same per-step nllk math as tools/ref_proxy_bench.cpp
// (which deliberately mirrors the reference's scalar recursions:
// nllk_ctcrw.hpp:46-91 for the Kalman step, tr_dens.hpp:53-67 for the
// CIR transition; the smoothSDE reference's own fit loop is R
// optim(BFGS) over TMB's AD objective, R/sde.R:694-697 — central FD
// at p<=5 costs 2p evals/gradient, comparable to one reverse-AD sweep
// with TMB's tape-replay overhead, so this is an optimistic stand-in).
//
// Build:  g++ -O2 -march=native -o /tmp/ref_fit_bench tools/ref_fit_bench.cpp
// Run:    /tmp/ref_fit_bench <config>   with config in {3, 5a, 5b}
// Appends one JSON line to stdout (redirect into tools/ref_fit.jsonl).

#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <random>
#include <vector>

static double now_ms() {
  return std::chrono::duration<double, std::milli>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

// ---- CTCRW per-dim scalar Kalman nllk (nllk_ctcrw.hpp:46-91) ----
static double ctcrw_nllk(const std::vector<double>& dt,
                         const std::vector<double>& obs, double mu1,
                         double mu2, double tau, double nu,
                         double sigma_obs) {
  const size_t n = dt.size();
  const double beta = 1.0 / tau;
  const double sigma = 2.0 * nu / std::sqrt(M_PI * tau);
  const double s2 = sigma * sigma;
  const double H = sigma_obs * sigma_obs;
  const double mu[2] = {mu1, mu2};

  double nllk = 0.0;
  for (int d = 0; d < 2; ++d) {
    double a0 = obs[d], a1 = 0.0;
    double P00 = 1.0, P01 = 0.0, P11 = 10.0;
    for (size_t i = 1; i < n; ++i) {
      const double h = dt[i - 1];
      const double e = std::exp(-beta * h);
      const double T01 = (1.0 - e) / beta;
      const double b0 = mu[d] * (h - T01);
      const double b1 = mu[d] * (1.0 - e);
      const double q11 = s2 / (2.0 * beta) * (1.0 - e * e);
      const double q01 = s2 / (2.0 * beta * beta) * (1.0 - 2.0 * e + e * e);
      const double q00 =
          s2 / (beta * beta) *
          (h - 2.0 * (1.0 - e) / beta + (1.0 - e * e) / (2.0 * beta));
      const double pa0 = a0 + T01 * a1 + b0;
      const double pa1 = e * a1 + b1;
      const double PP00 = P00 + 2.0 * T01 * P01 + T01 * T01 * P11 + q00;
      const double PP01 = e * (P01 + T01 * P11) + q01;
      const double PP11 = e * e * P11 + q11;
      const double F = PP00 + H;
      const double y = obs[2 * i + d] - pa0;
      const double K0 = PP00 / F, K1 = PP01 / F;
      nllk += 0.5 * (std::log(2.0 * M_PI * F) + y * y / F);
      a0 = pa0 + K0 * y;
      a1 = pa1 + K1 * y;
      P00 = (1.0 - K0) * PP00;
      P01 = (1.0 - K0) * PP01;
      P11 = PP11 - K1 * PP01;
    }
  }
  return nllk;
}

// ---- CIR transition nllk via noncentral chi^2 (tr_dens.hpp:53-67),
// log-scaled Bessel for 1M-step stability ----
static double log_bessel_i(double nu, double x) {
  // exact where the library function is safe; UNIFORM large-order
  // (Debye, DLMF 10.41.3) expansion with the u1 correction elsewhere
  // — a plain large-x asymptotic is wrong when nu^2 ~ x (it biased a
  // CIR fit's beta by 2x before this branch was fixed)
  if (x < 30.0 && nu < 30.0) {
    return std::log(std::cyl_bessel_i(nu, x));
  }
  const double s = std::sqrt(nu * nu + x * x);
  const double p = nu / s;
  double logI = s + nu * std::log(x / (nu + s)) -
                0.5 * std::log(2.0 * M_PI * s);
  // u1(p)/nu in the s-parametrization: (3/s - 5 nu^2 / s^3) / 24
  logI += std::log1p((3.0 / s - 5.0 * nu * nu / (s * s * s)) / 24.0);
  (void)p;
  return logI;
}

static double cir_nllk(const std::vector<double>& z, double dt, double mu,
                       double beta, double sigma) {
  const size_t n = z.size();
  const double q = 2.0 * beta * mu / (sigma * sigma) - 1.0;
  const double c =
      2.0 * beta / (sigma * sigma * (1.0 - std::exp(-beta * dt)));
  const double ebd = std::exp(-beta * dt);
  double nllk = 0.0;
  for (size_t i = 1; i < n; ++i) {
    const double u = c * z[i - 1] * ebd;
    const double v = c * z[i];
    const double x = 2.0 * std::sqrt(u * v);
    nllk -= std::log(c) - u - v + 0.5 * q * std::log(v / u) +
            log_bessel_i(q, x);
  }
  return nllk;
}

// ---- dense BFGS with Armijo backtracking + central-FD gradient ----
struct FitStats {
  int n_iter = 0;
  long n_evals = 0;
  int n_grads = 0;
  double f = 0.0;
  bool converged = false;
};

template <typename F>
static FitStats bfgs_fit(F&& fn, std::vector<double>& x, int maxiter,
                         double gtol) {
  const int p = (int)x.size();
  FitStats st;
  auto eval = [&](const std::vector<double>& xx) {
    ++st.n_evals;
    return fn(xx);
  };
  auto grad = [&](const std::vector<double>& xx, std::vector<double>& g) {
    ++st.n_grads;
    std::vector<double> xp = xx;
    for (int j = 0; j < p; ++j) {
      const double h = 1e-5 * std::max(1.0, std::fabs(xx[j]));
      xp[j] = xx[j] + h;
      const double fp = eval(xp);
      xp[j] = xx[j] - h;
      const double fm = eval(xp);
      xp[j] = xx[j];
      g[j] = (fp - fm) / (2.0 * h);
    }
  };

  std::vector<double> H(p * p, 0.0);  // inverse-Hessian approx
  for (int i = 0; i < p; ++i) H[i * p + i] = 1.0;
  std::vector<double> g(p), gn(p), d(p), xn(p), s(p), y(p), Hy(p);
  double f = eval(x);
  grad(x, g);
  for (st.n_iter = 0; st.n_iter < maxiter; ++st.n_iter) {
    double gmax = 0.0;
    for (int i = 0; i < p; ++i) gmax = std::max(gmax, std::fabs(g[i]));
    if (gmax < gtol) {
      st.converged = true;
      break;
    }
    // d = -H g
    double dg = 0.0;
    for (int i = 0; i < p; ++i) {
      double acc = 0.0;
      for (int j = 0; j < p; ++j) acc += H[i * p + j] * g[j];
      d[i] = -acc;
      dg += d[i] * g[i];
    }
    if (!(dg < 0.0)) {  // reset to steepest descent
      for (int i = 0; i < p; ++i) d[i] = -g[i];
      dg = 0.0;
      for (int i = 0; i < p; ++i) dg += d[i] * g[i];
    }
    // Armijo backtracking
    double alpha = 1.0, fn_v = 0.0;
    bool ok = false;
    for (int t = 0; t < 30; ++t) {
      for (int i = 0; i < p; ++i) xn[i] = x[i] + alpha * d[i];
      fn_v = eval(xn);
      if (std::isfinite(fn_v) && fn_v <= f + 1e-4 * alpha * dg) {
        ok = true;
        break;
      }
      alpha *= 0.5;
    }
    if (!ok) break;
    grad(xn, gn);
    double sy = 0.0;
    for (int i = 0; i < p; ++i) {
      s[i] = xn[i] - x[i];
      y[i] = gn[i] - g[i];
      sy += s[i] * y[i];
    }
    if (sy > 1e-12) {  // BFGS inverse update (Sherman-Morrison form)
      const double rho = 1.0 / sy;
      for (int i = 0; i < p; ++i) {
        double acc = 0.0;
        for (int j = 0; j < p; ++j) acc += H[i * p + j] * y[j];
        Hy[i] = acc;
      }
      double yHy = 0.0;
      for (int i = 0; i < p; ++i) yHy += y[i] * Hy[i];
      for (int i = 0; i < p; ++i)
        for (int j = 0; j < p; ++j)
          H[i * p + j] += rho * rho * (sy + yHy) * s[i] * s[j] -
                          rho * (Hy[i] * s[j] + s[i] * Hy[j]);
    }
    x = xn;
    f = fn_v;
    g = gn;
  }
  st.f = f;
  return st;
}

int main(int argc, char** argv) {
  const char* cfg = argc > 1 ? argv[1] : "3";
  const double gtol = argc > 2 ? std::atof(argv[2]) : 1e-3;
  std::mt19937_64 gen(2);
  std::normal_distribution<double> N(0.0, 1.0);

  if (std::strcmp(cfg, "3") == 0 || std::strcmp(cfg, "5a") == 0) {
    // CTCRW: config 3 = 1.5k irregular steps; 5a = 1M at dt = 0.1
    const bool big = std::strcmp(cfg, "5a") == 0;
    const size_t n = big ? 1000000 : 1500;
    std::vector<double> dt(n), obs(2 * n);
    // exact CTCRW simulation (per dim): v AR(1), z integrates v
    const double tau_t = 3.0, nu_t = 1.0, sobs = 0.1;
    const double beta = 1.0 / tau_t;
    const double sigma = 2.0 * nu_t / std::sqrt(M_PI * tau_t);
    const double s2 = sigma * sigma;
    std::uniform_real_distribution<double> U(0.2, 1.5);
    for (size_t i = 0; i < n; ++i) dt[i] = big ? 0.1 : U(gen);
    for (int d = 0; d < 2; ++d) {
      double v = 0.0, z = 0.0;
      for (size_t i = 0; i < n; ++i) {
        if (i) {
          const double h = dt[i - 1];
          const double e = std::exp(-beta * h);
          const double q11 = s2 / (2.0 * beta) * (1.0 - e * e);
          const double q01 =
              s2 / (2.0 * beta * beta) * (1.0 - 2.0 * e + e * e);
          const double q00 =
              s2 / (beta * beta) *
              (h - 2.0 * (1.0 - e) / beta + (1.0 - e * e) / (2.0 * beta));
          const double mz = z + v / beta * (1.0 - e);
          const double mv = e * v;
          const double ez = N(gen), ev = N(gen);
          z = mz + std::sqrt(q00) * ez;
          const double rho01 = q01 / std::sqrt(q00 * q11);
          v = mv + std::sqrt(q11) *
                       (rho01 * ez + std::sqrt(1.0 - rho01 * rho01) * ev);
        }
        obs[2 * i + d] = z + sobs * N(gen);
      }
    }
    // par = (mu1, mu2, log tau, log nu, log sigma_obs)
    std::vector<double> x = {0.0, 0.0, std::log(2.0), std::log(0.8),
                             std::log(0.2)};
    auto fn = [&](const std::vector<double>& p) {
      return ctcrw_nllk(dt, obs, p[0], p[1], std::exp(p[2]),
                        std::exp(p[3]), std::exp(p[4]));
    };
    const double t0 = now_ms();
    FitStats st = bfgs_fit(fn, x, 200, gtol);
    const double wall = (now_ms() - t0) / 1e3;
    std::printf(
        "{\"metric\": \"ref_fit_ctcrw_%s\", \"n\": %zu, "
        "\"fit_wall_s\": %.2f, \"n_evals\": %ld, \"n_grads\": %d, "
        "\"n_iter\": %d, \"converged\": %s, \"nllk\": %.2f, "
        "\"par\": [%.3f, %.3f, %.3f, %.3f, %.3f], "
        "\"note\": \"single-core -O2 BFGS, central-FD gradient "
        "(2p evals/grad), Armijo backtracking\"}\n",
        cfg, n, wall, st.n_evals, st.n_grads, st.n_iter,
        st.converged ? "true" : "false", st.f, x[0], x[1],
        std::exp(x[2]), std::exp(x[3]), std::exp(x[4]));
  } else if (std::strcmp(cfg, "5b") == 0) {
    const size_t n = 1000000;
    const double dt = 0.1, mu_t = 2.0, beta_t = 0.8, sigma_t = 0.5;
    const double c =
        2.0 * beta_t / (sigma_t * sigma_t * (1.0 - std::exp(-beta_t * dt)));
    const double df = 4.0 * beta_t * mu_t / (sigma_t * sigma_t);
    const double ebd = std::exp(-beta_t * dt);
    std::vector<double> z(n);
    z[0] = mu_t;
    std::gamma_distribution<double> G0;
    std::poisson_distribution<long> P0;
    for (size_t i = 1; i < n; ++i) {
      // exact noncentral chi^2 draw: chi2(df + 2K), K ~ Pois(nc/2)
      const double nc = 2.0 * c * z[i - 1] * ebd;
      std::poisson_distribution<long> P(nc / 2.0);
      const long K = P(gen);
      std::gamma_distribution<double> G((df + 2.0 * K) / 2.0, 2.0);
      z[i] = G(gen) / (2.0 * c);
    }
    // par = (log mu, log beta, log sigma)
    std::vector<double> x = {std::log(1.5), std::log(1.0), std::log(0.7)};
    auto fn = [&](const std::vector<double>& p) {
      return cir_nllk(z, dt, std::exp(p[0]), std::exp(p[1]),
                      std::exp(p[2]));
    };
    const double t0 = now_ms();
    FitStats st = bfgs_fit(fn, x, 200, gtol);
    const double wall = (now_ms() - t0) / 1e3;
    std::printf(
        "{\"metric\": \"ref_fit_cir_5b\", \"n\": %zu, "
        "\"fit_wall_s\": %.2f, \"n_evals\": %ld, \"n_grads\": %d, "
        "\"n_iter\": %d, \"converged\": %s, \"nllk\": %.2f, "
        "\"par\": [%.3f, %.3f, %.3f], "
        "\"note\": \"single-core -O2 BFGS, central-FD gradient, "
        "Armijo backtracking\"}\n",
        n, wall, st.n_evals, st.n_grads, st.n_iter,
        st.converged ? "true" : "false", st.f, std::exp(x[0]),
        std::exp(x[1]), std::exp(x[2]));
  } else {
    std::fprintf(stderr, "unknown config %s\n", cfg);
    return 2;
  }
  return 0;
}
