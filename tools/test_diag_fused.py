import os
os.environ["SMOOTHSDE_PALLAS_INTERPRET"] = "1"
import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from smoothsde_tpu.ops.diag_fused import diag_ssm_loglik_fused
from smoothsde_tpu.models.ssm import bm_ssm_steps, ou_ssm_steps
from smoothsde_tpu.ops.kalman import kalman_loglik_sequential

for type, n_par, n in (("BM_SSM", 3, 300), ("OU_SSM", 4, 1200)):
    rng = np.random.default_rng(1)
    times = np.cumsum(rng.uniform(0.2, 0.8, size=n))
    ids = np.sort(rng.integers(0, 3, size=n))
    obs = np.cumsum(rng.normal(size=(n, 2)) * 0.3, axis=0)
    obs[50] = np.nan
    theta = jnp.asarray(np.concatenate([[0.05, -0.1], 0.2*np.ones(n_par-2)]))
    def nll_f(th, type=type):
        par = jnp.broadcast_to(th, (n, n_par))
        return -diag_ssm_loglik_fused(type, par, obs, times, ids, sigma_obs=0.3)
    def nll_s(th, type=type):
        par = jnp.broadcast_to(th, (n, n_par))
        builder = bm_ssm_steps if type == "BM_SSM" else ou_ssm_steps
        st = builder(par, jnp.asarray(obs), jnp.asarray(times), ids, sigma_obs=0.3)
        return -kalman_loglik_sequential(st)[0]
    vf, gf = jax.value_and_grad(nll_f)(theta)
    vs, gs = jax.value_and_grad(nll_s)(theta)
    rel = np.max(np.abs(np.asarray(gf)-np.asarray(gs))/(np.abs(np.asarray(gs))+1e-8))
    print(f"{type}: value match {np.isclose(float(vf), float(vs), rtol=1e-10)}  grad maxrel {rel:.2e}", flush=True)
