"""End-to-end fit benchmarks for the BASELINE.md configs on the current
backend.

Usage: python tools/bench_configs.py <config> [optimizer] [--warm|--populate]
  config in {1, 2, 3, 4, 5a, 5b}; optimizer in {scipy, device, auto}.
  --warm: keep the persistent XLA compile cache enabled, recording the
  wall-clock a user sees on the SECOND fit of a model shape (the
  R/TMB-comparable number — TMB compiles its objective at install
  time). --populate: same cache-enabled fit but does NOT append a row
  (use once to prime the cache, then --warm to record). Default (cold)
  disables the cache so fresh-process numbers stay reproducible.

Appends a JSON line to tools/bench_configs.jsonl.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def config1():
    """BM, constant parameters, elephant-scale track (~1k steps)."""
    from smoothsde_tpu import SDE

    rng = np.random.default_rng(0)
    n = 1000
    times = np.cumsum(rng.uniform(0.4, 0.6, size=n))
    dt = np.diff(times)
    z = np.concatenate([[0.0], np.cumsum(0.4 * dt + 0.8 * np.sqrt(dt) * rng.normal(size=n - 1))])
    data = {"ID": np.zeros(n, int), "time": times, "z": z}
    sde = SDE(data=data, type="BM", response="z", par0=[0.0, 1.0])
    return sde, {"mu": 0.4, "sigma": 0.8}


def config2():
    """OU with spline-varying mean/diffusion via s(time)."""
    from smoothsde_tpu import SDE

    rng = np.random.default_rng(1)
    n = 3000
    dt = 0.3
    times = np.arange(n) * dt
    mu_t = 1.0 + 0.8 * np.sin(2 * np.pi * times / times[-1])
    kap_t = np.exp(0.5 * np.cos(2 * np.pi * times / times[-1]))
    tau = 2.0
    x = np.empty(n)
    x[0] = mu_t[0]
    for i in range(1, n):
        e = np.exp(-dt / tau)
        x[i] = mu_t[i - 1] + e * (x[i - 1] - mu_t[i - 1]) + rng.normal() * np.sqrt(
            kap_t[i - 1] * (1 - e * e)
        )
    data = {"ID": np.zeros(n, int), "time": times, "z": x}
    sde = SDE(
        formulas={
            "mu": "~s(time, k=8, bs='cs')",
            "tau": "~1",
            "kappa": "~s(time, k=8, bs='cs')",
        },
        data=data, type="OU", response="z", par0=[1.0, 1.0, 1.0],
    )
    return sde, {"tau": 2.0}


def config3():
    """CTCRW Kalman on a 2-D GPS track with irregular time steps."""
    from smoothsde_tpu import SDE
    from smoothsde_tpu.utils.misc import ctcrw_cov

    rng = np.random.default_rng(2)
    n = 1500
    times = np.cumsum(rng.uniform(0.2, 1.5, size=n))
    tau_t, nu_t, sobs = 3.0, 1.0, 0.1
    beta = 1 / tau_t
    sigma = 2 * nu_t / np.sqrt(np.pi * tau_t)
    v = np.zeros(2); z = np.zeros(2)
    obs = np.empty((n, 2)); obs[0] = 0
    for i in range(1, n):
        dt = times[i] - times[i - 1]
        e = np.exp(-beta * dt)
        V = ctcrw_cov(beta, sigma, dt)
        for d in range(2):
            mv, mz = e * v[d], z[d] + v[d] / beta * (1 - e)
            v[d], z[d] = rng.multivariate_normal([mv, mz], V)
        obs[i] = z + rng.normal(size=2) * sobs
    data = {"ID": np.zeros(n, int), "time": times,
            "y1": obs[:, 0], "y2": obs[:, 1]}
    sde = SDE(data=data, type="CTCRW", response=["y1", "y2"],
              par0=[0.0, 0.0, 2.0, 0.8])
    return sde, {"tau": 3.0, "nu": 1.0}


def config4():
    """Multi-animal CTCRW with an individual random effect on tau."""
    from smoothsde_tpu import SDE
    from smoothsde_tpu.utils.misc import ctcrw_cov

    rng = np.random.default_rng(3)
    n_id, n_per = 8, 250
    n = n_id * n_per
    rows = {"ID": [], "time": [], "y1": [], "y2": []}
    for k in range(n_id):
        tau_k = 3.0 * np.exp(rng.normal() * 0.3)
        nu_k = 1.0
        beta = 1 / tau_k
        sigma = 2 * nu_k / np.sqrt(np.pi * tau_k)
        times = np.cumsum(rng.uniform(0.3, 0.8, size=n_per))
        v = np.zeros(2); z = np.zeros(2)
        obs = np.empty((n_per, 2)); obs[0] = 0
        for i in range(1, n_per):
            dt = times[i] - times[i - 1]
            e = np.exp(-beta * dt)
            V = ctcrw_cov(beta, sigma, dt)
            for d in range(2):
                mv, mz = e * v[d], z[d] + v[d] / beta * (1 - e)
                v[d], z[d] = rng.multivariate_normal([mv, mz], V)
            obs[i] = z + rng.normal(size=2) * 0.1
        rows["ID"].extend([f"a{k}"] * n_per)
        rows["time"].extend(times.tolist())
        rows["y1"].extend(obs[:, 0].tolist())
        rows["y2"].extend(obs[:, 1].tolist())
    data = {k: np.asarray(v) for k, v in rows.items()}
    sde = SDE(
        formulas={
            "mu1": "~1", "mu2": "~1",
            "tau": "~s(ID, bs='re')",
            "nu": "~1",
        },
        data=data, type="CTCRW", response=["y1", "y2"],
        par0=[0.0, 0.0, 2.0, 0.8],
    )
    return sde, {"tau_pop": 3.0}


def config5_ctcrw(n=1_000_000):
    """1M-step high-frequency 2-D CTCRW track, single chip (fused
    Pallas associative Kalman; BASELINE config 5 part 1).

    Exact simulation, vectorized: the velocity is AR(1)
    (scipy.signal.lfilter), the position a cumulative sum of exact
    per-step increments with the correct joint (V, Z) noise."""
    from scipy.signal import lfilter

    from smoothsde_tpu import SDE
    from smoothsde_tpu.utils.misc import ctcrw_cov

    rng = np.random.default_rng(5)
    dt = 0.1
    tau_t, nu_t, sobs = 3.0, 1.0, 0.1
    beta = 1 / tau_t
    sigma = 2 * nu_t / np.sqrt(np.pi * tau_t)
    e = np.exp(-beta * dt)
    V = ctcrw_cov(beta, sigma, dt)  # 2x2 per-step joint (V, Z) noise
    Lc = np.linalg.cholesky(V)
    obs = np.empty((n, 2))
    for d in range(2):
        eps = rng.normal(size=(n - 1, 2)) @ Lc.T
        v = lfilter([1.0], [1.0, -e], eps[:, 0])  # v_i = e v_{i-1} + eps_v
        v_prev = np.concatenate([[0.0], v[:-1]])
        dz = v_prev / beta * (1 - e) + eps[:, 1]
        z = np.concatenate([[0.0], np.cumsum(dz)])
        obs[:, d] = z + rng.normal(size=n) * sobs
    data = {
        "ID": np.zeros(n, np.int32),
        "time": np.arange(n) * dt,
        "y1": obs[:, 0],
        "y2": obs[:, 1],
    }
    sde = SDE(data=data, type="CTCRW", response=["y1", "y2"],
              par0=[0.0, 0.0, 2.0, 0.8])
    return sde, {"tau": 3.0, "nu": 1.0}


def config5_cir(n=1_000_000):
    """1M-step CIR variance SDE, single chip (vectorized noncentral-chi^2
    transition densities via the stable log-Bessel-I; BASELINE config 5
    part 2)."""
    from smoothsde_tpu import SDE

    rng = np.random.default_rng(6)
    dt = 0.1
    mu_t, beta_t, sigma_t = 2.0, 0.8, 0.5
    c = 2 * beta_t / (sigma_t**2 * (1 - np.exp(-beta_t * dt)))
    df = 4 * beta_t * mu_t / sigma_t**2
    ebd = np.exp(-beta_t * dt)
    z = np.empty(n)
    z[0] = mu_t
    draws = rng.noncentral_chisquare  # exact transition (tr_dens.hpp:53-67)
    for i in range(1, n):
        z[i] = draws(df, 2 * c * z[i - 1] * ebd) / (2 * c)
    data = {"ID": np.zeros(n, np.int32), "time": np.arange(n) * dt, "z": z}
    sde = SDE(data=data, type="CIR", response="z",
              par0=[1.5, 1.0, 0.7])
    return sde, {"mu": 2.0, "beta": 0.8, "sigma": 0.5}


def main():
    import os

    import jax

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    warm = "--warm" in sys.argv
    populate = "--populate" in sys.argv
    if not (warm or populate):
        # cold rows record fresh-process fits (the number a new user
        # sees on the very first fit); fit()'s auto-enabled persistent
        # compile cache would silently make every re-record warm
        os.environ.setdefault("SMOOTHSDE_NO_COMPILE_CACHE", "1")

    cfg = args[0]
    optimizer = args[1] if len(args) > 1 else "scipy"
    builders = {
        "1": config1, "2": config2, "3": config3, "4": config4,
        "5a": config5_ctcrw, "5b": config5_cir,
    }
    sde, truth = builders[cfg]()
    t0 = time.time()
    res = sde.fit(optimizer=optimizer)
    wall = time.time() - t0
    timings = res.timings.get(
        "marginal_nllk_grad", res.timings.get("device_lbfgs", {})
    )
    steady = timings.get("steady_s", 0.0)
    first = timings.get("first_s", 0.0)
    out = {
        "config": cfg if len(cfg) > 1 else int(cfg),
        "backend": jax.default_backend(),
        "optimizer": optimizer,
        "optimizer_resolved": res.optimizer,
        "mode": "warm" if warm else "cold",
        "n_obs": sde.n_obs(),
        "converged": res.convergence == 0,
        "convergence_via": res.convergence_via,
        "nllk": round(res.value, 3),
        "fit_wall_s": round(wall, 2),
        "nllk_grad_steady_ms": round(steady * 1e3, 3),
        "nllk_grad_first_s": round(first, 2),
        "n_evals": res.counts,
        "par_t0": np.round(sde.par(t=0)[0], 3).tolist(),
        "truth": truth,
    }
    print(json.dumps(out), flush=True)
    if not populate:
        with open("tools/bench_configs.jsonl", "a") as f:
            f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
