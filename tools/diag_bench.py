"""Staged TPU timing diagnostic for the 1M-step CTCRW kernel."""
import time, sys, numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from smoothsde_tpu.models.ssm import ctcrw_steps_perdim
from smoothsde_tpu.ops.kalman import kalman_loglik_batched

print("backend:", jax.default_backend(), flush=True)
sizes = [int(s) for s in (sys.argv[1:] or ["100000", "1000000"])]
for n in sizes:
    rng = np.random.default_rng(0)
    times = np.cumsum(rng.uniform(0.4, 0.6, size=n)).astype(np.float32)
    obs = np.cumsum(rng.normal(size=(n, 2)).astype(np.float32) * 0.3, axis=0)
    ids = np.zeros(n, np.int32)
    theta0 = jnp.asarray([0.0, 0.0, np.log(2.0), np.log(1.0)], jnp.float32)
    obs_j, times_j = jnp.asarray(obs), jnp.asarray(times)

    def nllk(theta):
        par = jnp.broadcast_to(theta, (n, 4))
        steps = ctcrw_steps_perdim(par, obs_j, times_j, ids, sigma_obs=jnp.float32(0.1))
        return -kalman_loglik_batched(steps, impl="parallel")

    f_val = jax.jit(nllk)
    t0 = time.time(); v = f_val(theta0); v.block_until_ready()
    print(f"n={n} value compile+run {time.time()-t0:.1f}s  val={float(v):.1f}", flush=True)
    t0 = time.time()
    for _ in range(5): v = f_val(theta0)
    v.block_until_ready()
    print(f"n={n} value steady {(time.time()-t0)/5*1e3:.2f} ms", flush=True)

    f_grad = jax.jit(jax.value_and_grad(nllk))
    t0 = time.time(); v, g = f_grad(theta0); v.block_until_ready()
    print(f"n={n} grad compile+run {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(5): v, g = f_grad(theta0)
    g.block_until_ready()
    print(f"n={n} grad steady {(time.time()-t0)/5*1e3:.2f} ms", flush=True)
