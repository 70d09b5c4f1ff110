"""A/B: element-space vs parameter-space fused backward at 1M steps.

Old path: llk2_analytic(sys, "fused") — element-space custom_vjp with
the XLA par->element transpose chain. New path: ctcrw_loglik_soa
(scan="fused", analytic_grad=True) — par-space custom_vjp with
in-kernel chain rule (fused_backward_par). Run on an otherwise idle
machine; prints both wall-times.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import os

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from smoothsde_tpu.ops.kalman_smooth import llk2_analytic
    from smoothsde_tpu.ops.kalman_soa import (
        _ctcrw_system,
        ctcrw_loglik_soa,
        precompute_dt,
    )

    dtype = jnp.float32
    rng = np.random.default_rng(0)
    n = 1_000_000
    times = np.cumsum(rng.uniform(0.4, 0.6, size=n))
    obs = np.cumsum(rng.normal(size=(n, 2)).astype(np.float32) * 0.3, axis=0)
    ids = np.zeros(n, np.int32)
    theta0 = jnp.asarray([0.0, 0.0, np.log(2.0), np.log(1.0)], dtype)
    obs_j = jnp.asarray(obs)
    times_j = jnp.asarray(times, dtype)
    dt_j = jnp.asarray(precompute_dt(times, ids), dtype)
    sobs = jnp.asarray(0.1, dtype)

    def nllk_new(theta):
        par = jnp.broadcast_to(theta, (n, 4))
        return -ctcrw_loglik_soa(
            par, obs_j, times_j, ids, sigma_obs=sobs,
            scan="fused", analytic_grad=True, dt=dt_j,
        )

    def nllk_old(theta):
        par = jnp.broadcast_to(theta, (n, 4))
        sys = _ctcrw_system(
            par, obs_j, times_j, ids, sobs, 1.0, 10.0, dt=dt_j
        )
        return -llk2_analytic(sys, "fused")

    for name, f in (("old-elem", nllk_old), ("new-par", nllk_new)):
        fn = jax.jit(jax.value_and_grad(f))
        v, g = fn(theta0)
        v.block_until_ready()
        best = np.inf
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(30):
                v, g = fn(theta0)
            v.block_until_ready()
            g.block_until_ready()
            best = min(best, (time.perf_counter() - t0) / 30)
        print(f"{name}: {best * 1e3:.3f} ms  v={float(v):.4f} "
              f"g={np.asarray(g)}")


if __name__ == "__main__":
    main()
