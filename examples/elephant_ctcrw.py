"""Vignette-style analysis: CTCRW movement model with covariate smooths
(the workflow of the reference's elephant analysis,
vignettes/smoothSDE.rmd:427-519, on simulated GPS data since the real
dataset is not redistributable).

A 2-D CTCRW track with temperature-dependent speed (nu) and persistence
(tau), measurement error, and irregular sampling; fit with
tau ~ s(temp), nu ~ s(temp), then plot the temperature response curves
with simultaneous confidence bands.

Data ingestion goes through the native (C++) CSV reader when the
shared library is built (`make -C native`; utils/native.py falls back
to NumPy otherwise) — the tokenizer + R-factor ID coder measured 4x
faster than the NumPy path at 1M rows (tools/native_pipeline.jsonl).

Run: python examples/elephant_ctcrw.py
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")
from smoothsde_tpu import SDE  # noqa: E402
from smoothsde_tpu.utils import native  # noqa: E402
from smoothsde_tpu.utils.misc import ctcrw_cov  # noqa: E402


def simulate_track(n=1200, seed=7):
    rng = np.random.default_rng(seed)
    times = np.cumsum(rng.uniform(0.3, 1.2, size=n))
    temp = 20 + 8 * np.sin(2 * np.pi * times / (times[-1] / 3)) + rng.normal(
        size=n
    )
    tau_true = np.exp(1.0 + 0.03 * (temp - 20))
    nu_true = np.exp(0.5 - 0.04 * (temp - 20))
    v = np.zeros(2)
    z = np.zeros(2)
    obs = np.empty((n, 2))
    obs[0] = z
    for i in range(1, n):
        dt = times[i] - times[i - 1]
        beta = 1.0 / tau_true[i - 1]
        sigma = 2.0 * nu_true[i - 1] / np.sqrt(np.pi * tau_true[i - 1])
        e = np.exp(-beta * dt)
        V = ctcrw_cov(beta, sigma, dt)
        for d in range(2):
            mean_v = e * v[d]
            mean_z = z[d] + v[d] / beta * (1 - e)
            v[d], z[d] = rng.multivariate_normal([mean_v, mean_z], V)
        obs[i] = z + rng.normal(size=2) * 0.1
    return {
        "ID": np.zeros(n, int), "time": times,
        "x": obs[:, 0], "y": obs[:, 1], "temp": temp,
    }


def write_csv(data, path):
    cols = ["ID", "time", "x", "y", "temp"]
    with open(path, "w") as f:
        f.write(",".join(cols) + "\n")
        for i in range(len(data["time"])):
            f.write(
                f"e{data['ID'][i]},{data['time'][i]:.6f},"
                f"{data['x'][i]:.6f},{data['y'][i]:.6f},"
                f"{data['temp'][i]:.4f}\n"
            )


def main():
    # Simulate once, round-trip through CSV like a real GPS workflow:
    # the ingestion path is the native tokenizer when available.
    path = os.path.join(tempfile.gettempdir(), "elephant_track.csv")
    write_csv(simulate_track(), path)
    t0 = time.perf_counter()
    data = native.read_csv(path)  # native .so if built, NumPy otherwise
    load_s = time.perf_counter() - t0
    print(
        f"loaded {len(data['time'])} rows in {load_s * 1e3:.1f} ms "
        f"(native={native.native_available()})"
    )
    data["ID"] = data.pop("__ID_codes__")
    sde = SDE(
        formulas={
            "mu1": "~1",
            "mu2": "~1",
            "tau": "~s(temp, k=6, bs='cs')",
            "nu": "~s(temp, k=6, bs='cs')",
        },
        data=data, type="CTCRW", response=["x", "y"],
        par0=[0.0, 0.0, 2.0, 1.5],
    )
    res = sde.fit(silent=False)
    print(f"converged={res.convergence == 0}  nllk={res.value:.1f}  "
          f"wall={res.systime:.1f}s")
    sde.print_par()

    fig = sde.plot_par(
        "temp", par_names=["tau", "nu"], show_CI="simultaneous", n_post=150
    )
    fig.savefig("examples/elephant_ctcrw_response.png", dpi=120)
    print("Wrote examples/elephant_ctcrw_response.png")


if __name__ == "__main__":
    main()
