import time, sys, numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import smoothsde_tpu.ops.scan_utils as su
from smoothsde_tpu.ops import kalman_soa
from functools import partial

n = 1_000_000
rng = np.random.default_rng(0)
times = np.cumsum(rng.uniform(0.4, 0.6, size=n)).astype(np.float32)
obs = np.cumsum(rng.normal(size=(n, 2)).astype(np.float32) * 0.3, axis=0)
ids = np.zeros(n, np.int32)
theta0 = jnp.asarray([0.0, 0.0, np.log(2.0), np.log(1.0)], jnp.float32)
obs_j, times_j = jnp.asarray(obs), jnp.asarray(times)

orig = su.blocked_associative_scan
for NB in (4096, 8192, 16384, 32768, 65536):
    su_patch = partial(orig, block_count=NB, unroll=4)
    kalman_soa_scan = kalman_soa._scan_elements
    def patched_scan(combine, identity, elem, scan, _p=su_patch):
        return _p(combine, identity, elem)
    kalman_soa._scan_elements = patched_scan

    def nllk(theta):
        par = jnp.broadcast_to(theta, (n, 4))
        return -kalman_soa.ctcrw_loglik_soa(par, obs_j, times_j, ids, sigma_obs=jnp.float32(0.1))
    f = jax.jit(jax.value_and_grad(nllk))
    t0 = time.time(); v, g = f(theta0); v.block_until_ready()
    ct = time.time() - t0
    t0 = time.time()
    for _ in range(10): v, g = f(theta0)
    g.block_until_ready()
    st = (time.time()-t0)/10*1e3
    fv = jax.jit(nllk)
    vv = fv(theta0); vv.block_until_ready()
    t0 = time.time()
    for _ in range(10): vv = fv(theta0)
    vv.block_until_ready()
    sv = (time.time()-t0)/10*1e3
    print(f"NB={NB}: grad compile {ct:.0f}s, grad steady {st:.2f} ms, value steady {sv:.2f} ms, val={float(vv):.1f} g0={float(g[0]):.2f}", flush=True)
