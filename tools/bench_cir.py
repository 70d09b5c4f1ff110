"""1M-step CIR nllk+grad kernel benchmark (BASELINE config-5 scale).

The CIR transition density is a noncentral chi-squared evaluated via
the stable log-Bessel-I (ops/besseli.py, tr_dens.hpp:53-67) — a pure
VPU transcendental workload, complementary to the CTCRW Kalman bench in
bench.py. Appends a JSON line to tools/bench_cir.jsonl.
"""

import json
import time

import numpy as np

import sys
sys.path.insert(0, "/root/repo")


def main(n=1_000_000):
    import jax
    import jax.numpy as jnp

    from smoothsde_tpu.ops.densities import closed_form_loglik

    rng = np.random.default_rng(0)
    dt = 0.1
    times = np.arange(n) * dt
    # simulate CIR exactly: z' | z ~ ncx2 (R/sde.R:1479-1494 semantics,
    # without the reference's two indexing bugs)
    mu_t, beta_t, sigma_t = 2.0, 0.8, 0.5
    c = 2 * beta_t / (sigma_t**2 * (1 - np.exp(-beta_t * dt)))
    df = 4 * beta_t * mu_t / sigma_t**2
    z = np.empty(n)
    z[0] = mu_t
    nc = 2 * c * z[0] * np.exp(-beta_t * dt)
    for i in range(1, n):
        z[i] = rng.noncentral_chisquare(df, 2 * c * z[i - 1] * np.exp(-beta_t * dt)) / (2 * c)
    obs = z[:, None]
    ids = np.zeros(n, np.int32)

    obs_j = jnp.asarray(obs, jnp.float32)
    times_j = jnp.asarray(times, jnp.float32)
    ids_j = jnp.asarray(ids)

    # working-scale parameter rows (mu log-linked for CIR, R/sde.R:76)
    par_row = jnp.asarray(
        [np.log(mu_t), np.log(beta_t), np.log(sigma_t)], jnp.float32
    )

    def nllk(par_row):
        par = jnp.broadcast_to(par_row, (n, 3))
        return -closed_form_loglik("CIR", obs_j, times_j, ids_j, par)

    vg = jax.jit(jax.value_and_grad(nllk))
    t0 = time.time()
    v, g = vg(par_row)
    jax.block_until_ready(v)
    first = time.time() - t0

    reps = 30
    best = np.inf
    for _ in range(4):
        t0 = time.time()
        for _ in range(reps):
            v, g = vg(par_row)
        jax.block_until_ready(g)
        best = min(best, (time.time() - t0) / reps)

    out = {
        "metric": "cir_1m_nllk_grad_ms",
        "n_steps": n,
        "backend": jax.default_backend(),
        "value_ms": round(best * 1e3, 3),
        "first_s": round(first, 2),
        "nllk": float(v),
        "grad_finite": bool(np.all(np.isfinite(np.asarray(g)))),
    }
    print(json.dumps(out), flush=True)
    with open("/root/repo/tools/bench_cir.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
