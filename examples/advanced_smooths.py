"""Advanced smooths and fitting options beyond the reference's surface:

  - cyclic cubic basis (bs='cc') with user-supplied knots fixing the
    period (a 24 h diurnal cycle);
  - anisotropic tensor-product smooth te(x, z) with one smoothing
    parameter per margin (the reference's TMB penalty cannot express
    multi-penalty blocks at all);
  - REML criterion (TMB's random=c('coeff_fe', 'coeff_re')
    construction) vs the reference's ML;
  - fully on-device L-BFGS fitting (one device dispatch per fit).

Run: python examples/advanced_smooths.py
"""

import sys

import numpy as np

sys.path.insert(0, ".")
from smoothsde_tpu import SDE  # noqa: E402

rng = np.random.default_rng(1)
n = 1500
dt = 0.5
hour = rng.uniform(0, 24, n)
depth = rng.uniform(0, 100, n)

# True diffusion: a diurnal cycle modulated (weakly) by depth.
sig = np.exp(0.35 * np.sin(2 * np.pi * hour / 24) - 0.002 * depth)
z = np.concatenate(
    [[0.0], np.cumsum(sig[:-1] * np.sqrt(dt) * rng.normal(size=n - 1))]
)
data = {
    "ID": np.zeros(n, int),
    "time": np.arange(n) * dt,
    "z": z,
    "hour": hour,
    "depth": depth,
}

# ---- 1. cyclic smooth with a pinned 24 h period ----
sde_cc = SDE(
    data=data,
    type="BM",
    response="z",
    formulas={"mu": "~1", "sigma": "~s(hour, k=8, bs='cc')"},
    par0=[0.0, 1.0],
    knots={"hour": np.linspace(0.0, 24.0, 8)},
)
res = sde_cc.fit()
grid = {
    "ID": np.zeros(25, int), "time": np.zeros(25), "z": np.zeros(25),
    "hour": np.linspace(0, 24, 25), "depth": np.full(25, 50.0),
}
sig_hat = sde_cc.par(new_data=grid)[:, 1]
print("1. cyclic sigma(hour), conv =", res.convergence)
print("   sigma(0) == sigma(24):",
      np.isclose(sig_hat[0], sig_hat[-1]))

# ---- 2. tensor-product smooth, one lambda per margin ----
sde_te = SDE(
    data=data,
    type="BM",
    response="z",
    formulas={"mu": "~1", "sigma": "~te(hour, depth, k=5, bs='cs')"},
    par0=[0.0, 1.0],
)
res_te = sde_te.fit()
print("2. te(hour, depth): conv =", res_te.convergence,
      " lambdas (hour, depth margins) =", np.round(sde_te.lambda_(), 3))

# ---- 3. REML vs ML ----
sde_reml = SDE(
    data=data,
    type="BM",
    response="z",
    formulas={"mu": "~1", "sigma": "~s(hour, k=8, bs='cc')"},
    par0=[0.0, 1.0],
    knots={"hour": np.linspace(0.0, 24.0, 8)},
)
res_reml = sde_reml.fit(criterion="REML")
print("3. REML: conv =", res_reml.convergence,
      " lambda ML =", np.round(sde_cc.lambda_(), 3),
      " lambda REML =", np.round(sde_reml.lambda_(), 3))

# ---- 4. on-device L-BFGS (one dispatch for the whole outer loop) ----
sde_dev = SDE(
    data=data,
    type="BM",
    response="z",
    formulas={"mu": "~1", "sigma": "~s(hour, k=8, bs='cc')"},
    par0=[0.0, 1.0],
    knots={"hour": np.linspace(0.0, 24.0, 8)},
)
res_dev = sde_dev.fit(optimizer="device")
# signed: negative means the device loop found the LOWER optimum (it
# does here, by ~0.18 along the flat log-lambda direction)
print("4. device L-BFGS: conv =", res_dev.convergence,
      " nllk - host =",
      round(res_dev.value - res.value, 4))
