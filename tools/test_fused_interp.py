import os
os.environ["SMOOTHSDE_PALLAS_INTERPRET"] = "1"
import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from smoothsde_tpu.ops.kalman_soa import ctcrw_loglik_soa
from smoothsde_tpu.models.ssm import ctcrw_steps
from smoothsde_tpu.ops.kalman import kalman_loglik_sequential

rng = np.random.default_rng(0)
n = 700
times = np.cumsum(rng.uniform(0.2, 0.8, size=n))
ids = np.sort(rng.integers(0, 3, size=n))
obs = np.cumsum(rng.normal(size=(n, 2)) * 0.3, axis=0)
obs[40] = np.nan
par = jnp.asarray(np.column_stack([
    rng.normal(size=n)*0.2, rng.normal(size=n)*0.2,
    np.log(2.0)+rng.normal(size=n)*0.1, np.log(1.0)+rng.normal(size=n)*0.1]))
steps = ctcrw_steps(par, jnp.asarray(obs), jnp.asarray(times), ids, sigma_obs=0.2)
llk_ref = float(kalman_loglik_sequential(steps)[0])

llk_f = float(ctcrw_loglik_soa(par, obs, times, ids, sigma_obs=0.2, scan="fused"))
print("value ref:", llk_ref, " fused:", llk_f, " match:", np.isclose(llk_ref, llk_f, rtol=1e-10), flush=True)

theta = jnp.asarray([0.05, -0.1, np.log(2.0), np.log(1.0)])
def nll_fused(th):
    p = jnp.broadcast_to(th, (n, 4))
    return -ctcrw_loglik_soa(p, obs, times, ids, sigma_obs=0.2, scan="fused", analytic_grad=True)
def nll_seq(th):
    p = jnp.broadcast_to(th, (n, 4))
    st = ctcrw_steps(p, jnp.asarray(obs), jnp.asarray(times), ids, sigma_obs=0.2)
    return -kalman_loglik_sequential(st)[0]
v_f, g_f = jax.value_and_grad(nll_fused)(theta)
v_s, g_s = jax.value_and_grad(nll_seq)(theta)
print("grad value match:", np.isclose(float(v_f), float(v_s), rtol=1e-10), flush=True)
print("g fused:", np.asarray(g_f), flush=True)
print("g seq:  ", np.asarray(g_s), flush=True)
print("max rel err:", float(np.max(np.abs(np.asarray(g_f)-np.asarray(g_s))/(np.abs(np.asarray(g_s))+1e-8))), flush=True)
