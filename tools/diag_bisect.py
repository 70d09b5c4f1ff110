"""Bisect the real SoA CTCRW kernel: element build / phase1 / full scan / llk."""
import time, sys, numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from smoothsde_tpu.ops import kalman_soa as K
from smoothsde_tpu.ops.scan_utils import blocked_associative_scan

n = 1_000_000
rng = np.random.default_rng(0)
times = np.cumsum(rng.uniform(0.4, 0.6, size=n)).astype(np.float32)
obs = np.cumsum(rng.normal(size=(n, 2)).astype(np.float32) * 0.3, axis=0)
ids = np.zeros(n, np.int32)
theta0 = jnp.asarray([0.0, 0.0, np.log(2.0), np.log(1.0)], jnp.float32)
obs_j, times_j = jnp.asarray(obs), jnp.asarray(times)

# replicate the element build from ctcrw_loglik_soa by monkey-extraction:
# easiest: temporarily patch _scan_elements to capture/return early.
def make_fn(stage):
    def patched(combine, identity, elem, scan):
        if stage == "build":
            return elem
        out = blocked_associative_scan(combine, identity, elem)
        return out
    return patched

def timeit(f, reps=10):
    v = f(theta0); jax.tree.leaves(v)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps): v = f(theta0)
    jax.tree.leaves(v)[0].block_until_ready()
    return (time.perf_counter() - t0) / reps * 1e3

orig = K._scan_elements
for stage in ("build", "scan", "full"):
    if stage == "full":
        K._scan_elements = orig
    else:
        K._scan_elements = make_fn(stage)
    if stage == "build":
        # element build only: sum all leaves (scan skipped)
        def f(theta):
            par = jnp.broadcast_to(theta, (n, 4))
            K2 = K._scan_elements
            # run loglik but scanned elements are raw elements -> the
            # downstream math is wrong but shapes match; just sum leaves
            try:
                return K.ctcrw_loglik_soa(par, obs_j, times_j, ids, sigma_obs=jnp.float32(0.1))
            except Exception:
                raise
        fn = jax.jit(f)
    else:
        def f(theta):
            par = jnp.broadcast_to(theta, (n, 4))
            return K.ctcrw_loglik_soa(par, obs_j, times_j, ids, sigma_obs=jnp.float32(0.1))
        fn = jax.jit(f)
    print(f"stage={stage}: {timeit(fn):.2f} ms", flush=True)
K._scan_elements = orig
