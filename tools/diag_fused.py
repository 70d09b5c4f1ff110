import time, sys, numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from smoothsde_tpu.ops.kalman_soa import ctcrw_loglik_soa

print("backend:", jax.default_backend(), flush=True)
n = 1_000_000
rng = np.random.default_rng(0)
times = np.cumsum(rng.uniform(0.4, 0.6, size=n)).astype(np.float32)
obs = np.cumsum(rng.normal(size=(n, 2)).astype(np.float32) * 0.3, axis=0)
ids = np.zeros(n, np.int32)
theta0 = jnp.asarray([0.0, 0.0, np.log(2.0), np.log(1.0)], jnp.float32)
obs_j, times_j = jnp.asarray(obs), jnp.asarray(times)

def mk(analytic):
    def nllk(theta):
        par = jnp.broadcast_to(theta, (n, 4))
        return -ctcrw_loglik_soa(par, obs_j, times_j, ids,
                                 sigma_obs=jnp.float32(0.1),
                                 scan="fused", analytic_grad=analytic)
    return nllk

f_val = jax.jit(mk(False))
t0 = time.time(); v = f_val(theta0); v.block_until_ready()
print(f"fused value compile+run {time.time()-t0:.1f}s val={float(v):.1f}", flush=True)
t0 = time.time()
for _ in range(20): v = f_val(theta0)
v.block_until_ready()
print(f"fused value steady {(time.time()-t0)/20*1e3:.2f} ms", flush=True)

f_g = jax.jit(jax.value_and_grad(mk(True)))
t0 = time.time(); v, g = f_g(theta0); v.block_until_ready()
print(f"fused analytic grad compile+run {time.time()-t0:.1f}s g0={float(g[0]):.2f}", flush=True)
t0 = time.time()
for _ in range(20): v, g = f_g(theta0)
g.block_until_ready()
print(f"fused analytic nllk+grad steady {(time.time()-t0)/20*1e3:.2f} ms val={float(v):.1f}", flush=True)
