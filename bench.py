"""Headline benchmark: nllk + gradient of a 1M-step 2-D CTCRW Kalman
filter on one TPU chip (BASELINE.json north star: < 10 ms).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N}
vs_baseline = (10 ms north-star) / measured — values > 1 beat the target.
"""

import json
import sys
import time

import numpy as np

N_STEPS = 1_000_000
TARGET_MS = 10.0


def main():
    import os

    import jax
    import jax.numpy as jnp

    # persistent compile cache: the blocked-scan kernels compile slowly
    # through the TPU tunnel; cache across bench invocations
    cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    # AOT executable layer on top (utils/cache.py): a warm bench run
    # skips Python tracing / StableHLO lowering of the Pallas graphs
    # too, not just the XLA compile — this was the bulk of the round-3
    # 30 s cold start. Blobs live next to the XLA cache in the repo.
    os.environ.setdefault("SMOOTHSDE_CACHE_DIR", cache_dir)

    backend = jax.default_backend()
    dtype = jnp.float32

    from smoothsde_tpu.ops.kalman_soa import ctcrw_loglik_soa, precompute_dt

    rng = np.random.default_rng(0)
    n = N_STEPS
    times = np.cumsum(rng.uniform(0.4, 0.6, size=n))
    obs = np.cumsum(rng.normal(size=(n, 2)).astype(np.float32) * 0.3, axis=0)
    ids = np.zeros(n, np.int32)
    # working-scale parameters (mu1, mu2, log tau, log nu)
    theta0 = jnp.asarray([0.0, 0.0, np.log(2.0), np.log(1.0)], dtype)

    obs_j = jnp.asarray(obs)
    times_j = jnp.asarray(times, dtype)
    # host-f64 intervals, the production pipeline (objective.py)
    dt_j = jnp.asarray(precompute_dt(times, ids), dtype)

    def nllk(theta):
        par = jnp.broadcast_to(theta, (n, 4))
        # fused Pallas filter + Fisher-identity analytic gradient
        return -ctcrw_loglik_soa(
            par, obs_j, times_j, ids, sigma_obs=jnp.asarray(0.1, dtype),
            scan="fused", analytic_grad=True, dt=dt_j,
        )

    from smoothsde_tpu.utils.cache import aot_cached, source_digest

    token = (
        f"n{N_STEPS}-{backend}-{jax.__version__}-{source_digest()}"
    )
    fn = aot_cached(
        "bench_val_grad", token,
        lambda: jax.value_and_grad(nllk), (theta0,),
    )

    # compile + first call (reported as cold_ms alongside the headline:
    # the steady-state number below is a best-of-rounds measurement and
    # the two are not comparable — see "methodology" in the output)
    t0 = time.perf_counter()
    v, g = fn(theta0)
    jax.block_until_ready((v, g))
    cold_ms = (time.perf_counter() - t0) * 1e3

    # untimed warmup: a fresh process pays ~1 ms/call of tunnel/server
    # warmup for the first several dozen calls, which otherwise leaks
    # into every timing round (docs/BENCH_DETAILS.md)
    warmup = 60
    for _ in range(warmup):
        v, g = fn(theta0)
    jax.block_until_ready((v, g))

    # cycle distinct inputs (defeats any repeat-dispatch memoization in
    # the experimental tunnel backend — an identical-call round was
    # once observed to "complete" in 11 us, far below the ~0.3 ms HBM
    # bandwidth floor) and take the MEDIAN round mean, which a single
    # anomalous round cannot drag down the way best-of did
    rng2 = np.random.default_rng(1)
    thetas = [
        jnp.asarray(
            np.asarray(theta0) + 0.01 * rng2.normal(size=4), dtype
        )
        for _ in range(8)
    ]
    reps, rounds = 30, 10
    round_ms = []
    for r in range(rounds):
        t0 = time.perf_counter()
        for i in range(reps):
            v, g = fn(thetas[(r * reps + i) % len(thetas)])
        jax.block_until_ready((v, g))
        round_ms.append((time.perf_counter() - t0) / reps * 1e3)
    ms = float(np.median(round_ms))

    print(
        json.dumps(
            {
                "metric": (
                    "nllk+grad wall-time, 1M-step 2-D CTCRW fused-Pallas "
                    f"Kalman + Fisher-identity gradient, {backend} f32"
                ),
                "value": round(ms, 3),
                "unit": "ms",
                "vs_baseline": round(TARGET_MS / ms, 3),
                "cold_ms": round(cold_ms, 1),
                "methodology": {
                    "warmup_calls": warmup,
                    "rounds": rounds,
                    "reps_per_round": reps,
                    "statistic": "median round mean, cycled inputs",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
