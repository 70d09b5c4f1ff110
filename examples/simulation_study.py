"""Simulation-recovery study (port of the reference's inst/driver.R).

Simulates Brownian motion with smoothly varying mu(x1) and sigma(x1),
fits (a) a spline model and (b) a constant-parameter model, and compares
conditional/marginal AIC — the spline model should win.

Run: python examples/simulation_study.py [n_obs]
"""

import sys

import numpy as np

sys.path.insert(0, ".")
from smoothsde_tpu import SDE  # noqa: E402


def simulate(n=5000, seed=1):
    rng = np.random.default_rng(seed)
    times = np.cumsum(rng.uniform(0.2, 0.6, size=n))
    x1 = np.linspace(0, 1, n)
    mu_true = 2.0 * np.cos(2.0 * np.pi * x1)
    sigma_true = np.exp(0.5 * np.sin(2.0 * np.pi * x1))
    dt = np.diff(times)
    z = np.concatenate(
        [[0.0], np.cumsum(
            mu_true[:-1] * dt + sigma_true[:-1] * np.sqrt(dt) * rng.normal(size=n - 1)
        )]
    )
    return {
        "ID": np.zeros(n, int), "time": times, "z": z, "x1": x1,
    }, mu_true, sigma_true


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    data, mu_true, sigma_true = simulate(n)

    print("== spline model: mu ~ s(x1), sigma ~ s(x1)")
    spline = SDE(
        formulas={
            "mu": "~s(x1, k=10, bs='cs')",
            "sigma": "~s(x1, k=10, bs='cs')",
        },
        data=data, type="BM", response="z",
    )
    res = spline.fit()
    print(f"  converged={res.convergence == 0}  nllk={res.value:.2f}  "
          f"time={res.systime:.1f}s")

    print("== constant model: mu ~ 1, sigma ~ 1")
    const = SDE(data=data, type="BM", response="z")
    res_c = const.fit()
    print(f"  converged={res_c.convergence == 0}  nllk={res_c.value:.2f}")

    print("\nModel comparison (lower is better):")
    print(f"  conditional AIC: spline {spline.AIC_conditional():.1f}  "
          f"constant {const.AIC_conditional():.1f}")
    print(f"  marginal AIC:    spline {spline.AIC_marginal():.1f}  "
          f"constant {const.AIC_marginal():.1f}")

    par = spline.par(
        t="all", X_fe=spline.mats()["X_fe"], X_re=spline.mats()["X_re"]
    )
    err_mu = np.sqrt(np.mean((par[:, 0] - mu_true) ** 2))
    err_sg = np.mean(np.abs(par[:, 1] - sigma_true) / sigma_true)
    print(f"\nRecovery: RMSE(mu) = {err_mu:.3f}, "
          f"mean rel err(sigma) = {err_sg:.3f}")

    fig = spline.plot_par("x1", show_CI="pointwise", n_post=200)
    fig.savefig("examples/simulation_study_fit.png", dpi=120)
    print("Wrote examples/simulation_study_fit.png")


if __name__ == "__main__":
    main()
