"""Micro-bench: isolate phase-1 scan cost vs transposes vs full kernel."""
import time, sys, numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp

n = 1_000_000
NB, L = 2048, -(-n // 2048)
key = jax.random.PRNGKey(0)
# 16 leaves shaped (L, 2, NB) like the blocked elements
leaves = [jax.random.normal(jax.random.fold_in(key, i), (L, 2, NB), jnp.float32) * 0.01 for i in range(16)]

def combine(c, x):
    # arithmetic load comparable to _combine2 (~60 mul/add per lane)
    a = c
    out = []
    acc = x[0]
    for i in range(16):
        acc = acc * a[i] + x[i]
        out.append(acc)
    return out

def timeit(f, *args, reps=10):
    v = f(*args); jax.tree.leaves(v)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps): v = f(*args)
    jax.tree.leaves(v)[0].block_until_ready()
    return (time.perf_counter() - t0) / reps * 1e3

for unroll in (1, 4, 16, 64):
    @jax.jit
    def scan_only(leaves, unroll=unroll):
        init = [jnp.zeros((2, NB), jnp.float32) for _ in range(16)]
        def step(c, x):
            nc = combine(c, x)
            return nc, nc
        tot, within = jax.lax.scan(step, init, leaves, unroll=unroll)
        return within
    print(f"phase1-like scan unroll={unroll}: {timeit(scan_only, leaves):.2f} ms", flush=True)

@jax.jit
def transpose_only(leaves):
    return [jnp.moveaxis(jnp.moveaxis(x, 0, -1), -1, 0) + 1.0 for x in leaves]
print(f"double transpose of 16 leaves: {timeit(transpose_only, leaves):.2f} ms", flush=True)

from smoothsde_tpu.ops.kalman_soa import ctcrw_loglik_soa
rng = np.random.default_rng(0)
times = np.cumsum(rng.uniform(0.4, 0.6, size=n)).astype(np.float32)
obs = np.cumsum(rng.normal(size=(n, 2)).astype(np.float32) * 0.3, axis=0)
ids = np.zeros(n, np.int32)
theta0 = jnp.asarray([0.0, 0.0, np.log(2.0), np.log(1.0)], jnp.float32)
obs_j, times_j = jnp.asarray(obs), jnp.asarray(times)
@jax.jit
def full(theta):
    par = jnp.broadcast_to(theta, (n, 4))
    return -ctcrw_loglik_soa(par, obs_j, times_j, ids, sigma_obs=jnp.float32(0.1))
print(f"full kernel value: {timeit(full, theta0):.2f} ms", flush=True)
