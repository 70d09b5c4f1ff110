"""Gradient check for the Laplace marginal on a CTCRW-with-splines model
(the configuration where BFGS stalled)."""
import sys, numpy as np
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from smoothsde_tpu import SDE
from smoothsde_tpu.infer.laplace import make_laplace
from smoothsde_tpu.utils.misc import ctcrw_cov

rng = np.random.default_rng(7)
n = 800
times = np.cumsum(rng.uniform(0.3, 1.2, size=n))
temp = 20 + 8 * np.sin(2 * np.pi * times / (times[-1] / 3)) + rng.normal(size=n)
tau_true = np.exp(1.0 + 0.03 * (temp - 20))
nu_true = np.exp(0.5 - 0.04 * (temp - 20))
v = np.zeros(2); z = np.zeros(2); obs = np.empty((n, 2)); obs[0] = z
for i in range(1, n):
    dt = times[i] - times[i-1]
    beta = 1.0 / tau_true[i-1]; sigma = 2.0*nu_true[i-1]/np.sqrt(np.pi*tau_true[i-1])
    e = np.exp(-beta*dt); V = ctcrw_cov(beta, sigma, dt)
    for d in range(2):
        mv = e*v[d]; mz = z[d] + v[d]/beta*(1-e)
        v[d], z[d] = rng.multivariate_normal([mv, mz], V)
    obs[i] = z + rng.normal(size=2)*0.1
data = {"ID": np.zeros(n,int), "time": times, "x": obs[:,0], "y": obs[:,1], "temp": temp}
sde = SDE(formulas={"mu1":"~1","mu2":"~1","tau":"~s(temp, k=8, bs='cs')","nu":"~s(temp, k=8, bs='cs')"},
          data=data, type="CTCRW", response=["x","y"], par0=[0.0,0.0,2.0,1.5])
bundle = sde.setup()
marginal = make_laplace(bundle.joint_nllk, bundle.packer)
x0 = jnp.asarray(bundle.packer.outer_init())
b0 = jnp.asarray(bundle.packer.inner_init())
(v0, bhat), g = jax.value_and_grad(marginal, has_aux=True)(x0, b0)
print("value at init:", float(v0), flush=True)
# inner gradient norm at bhat (is the Newton converged?)
gb = jax.grad(lambda b: bundle.joint_nllk(bundle.packer.unpack(x0, b)))(bhat)
print("inner grad max:", float(jnp.max(jnp.abs(gb))), flush=True)
names = bundle.packer.outer_names()
bad = 0
for i in range(len(np.asarray(x0))):
    h = 1e-5
    xp = np.asarray(x0).copy(); xp[i] += h
    xm = np.asarray(x0).copy(); xm[i] -= h
    fp = float(marginal(jnp.asarray(xp), bhat)[0])
    fm = float(marginal(jnp.asarray(xm), bhat)[0])
    fd = (fp - fm) / (2*h)
    ok = np.isclose(fd, float(g[i]), rtol=2e-3, atol=1e-5)
    bad += (not ok)
    print(f"{i:2d} {names[i]:14s} AD={float(g[i]):+.5f} FD={fd:+.5f} {'OK' if ok else 'MISMATCH'}", flush=True)
print("mismatches:", bad)
