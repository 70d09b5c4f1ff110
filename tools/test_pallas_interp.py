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
n = 300  # not divisible by nice powers -> exercises padding
times = np.cumsum(rng.uniform(0.2, 0.8, size=n))
ids = np.sort(rng.integers(0, 3, size=n))
obs = np.cumsum(rng.normal(size=(n, 2)) * 0.3, axis=0)
obs[40] = np.nan
par = jnp.asarray(np.column_stack([
    rng.normal(size=n)*0.2, rng.normal(size=n)*0.2,
    np.log(2.0)+rng.normal(size=n)*0.1, np.log(1.0)+rng.normal(size=n)*0.1]))

steps = ctcrw_steps(par, jnp.asarray(obs), jnp.asarray(times), ids, sigma_obs=0.2)
llk_ref = float(kalman_loglik_sequential(steps)[0])
# pallas path with small NB so lanes = 2*NB = 1024 exactly
import smoothsde_tpu.ops.scan_utils as su
orig = su.blocked_associative_scan
def patched(combine, identity, elems, block_count=512, unroll=4, phase1="pallas"):
    return orig(combine, identity, elems, block_count=512, phase1="pallas")
import smoothsde_tpu.ops.kalman_soa as K
K.blocked_associative_scan = patched  # module-level name used in _scan_elements? check
# _scan_elements imports inside function from scan_utils; patch there instead
su_orig = su.blocked_associative_scan
su.blocked_associative_scan = patched

llk_p = float(ctcrw_loglik_soa(par, obs, times, ids, sigma_obs=0.2, scan="pallas"))
su.blocked_associative_scan = su_orig
print("ref:", llk_ref)
print("pallas(interp):", llk_p)
print("match:", np.isclose(llk_ref, llk_p, rtol=1e-10))
