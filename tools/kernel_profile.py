"""Decompose the 1M-step CTCRW headline benchmark into stages to find
the remaining headroom (VERDICT r2 item 7).

Times, at 1M steps on the current backend (best-of-rounds, same
methodology as bench.py):
  fwd_only        — fused filter, likelihood only (no moments)
  fwd_moments     — fused filter emitting tiled filtered moments
                    (what the custom_vjp forward pass runs)
  val_grad_par    — full value+gradient, par-space custom_vjp
                    (the bench.py headline path)
  val_grad_elem   — full value+gradient, element-space custom_vjp
                    (the pre-round-3 path, for comparison)
  bwd_implied     — val_grad_par minus fwd_moments (backward kernels +
                    cotangent contraction)

Optionally writes an XLA profile trace (--trace DIR).
Appends one JSON line to tools/kernel_profile.jsonl.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def bench(fn, args, reps=30, rounds=8):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(40):
        out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from smoothsde_tpu.ops.ctcrw_fused import fused_filter
    from smoothsde_tpu.ops.kalman_soa import (
        _ctcrw_system,
        ctcrw_loglik_soa,
        precompute_dt,
    )

    backend = jax.default_backend()
    dtype = jnp.float32
    n = 1_000_000
    rng = np.random.default_rng(0)
    times = np.cumsum(rng.uniform(0.4, 0.6, size=n))
    obs = np.cumsum(
        rng.normal(size=(n, 2)).astype(np.float32) * 0.3, axis=0
    )
    ids = np.zeros(n, np.int32)
    theta0 = jnp.asarray([0.0, 0.0, np.log(2.0), 0.0], dtype)
    obs_j = jnp.asarray(obs)
    times_j = jnp.asarray(times, dtype)
    dt_j = jnp.asarray(precompute_dt(times, ids), dtype)
    sobs = jnp.asarray(0.1, dtype)

    def fwd_only(theta):
        par = jnp.broadcast_to(theta, (n, 4))
        sys_ = _ctcrw_system(par, obs_j, times_j, ids, sobs, dt=dt_j)
        return fused_filter(sys_, want_moments=False)[0]

    def fwd_moments(theta):
        par = jnp.broadcast_to(theta, (n, 4))
        sys_ = _ctcrw_system(par, obs_j, times_j, ids, sobs, dt=dt_j)
        llk, m_f, _ = fused_filter(
            sys_, want_moments=True, tiled_moments=True
        )
        return llk, jax.tree.map(lambda x: x[0].sum(), m_f)

    def val_grad_par(theta):
        par = jnp.broadcast_to(theta, (n, 4))
        return -ctcrw_loglik_soa(
            par, obs_j, times_j, ids, sigma_obs=sobs,
            scan="fused", analytic_grad=True, dt=dt_j,
        )

    def val_grad_elem(theta):
        par = jnp.broadcast_to(theta, (n, 4))
        return -ctcrw_loglik_soa(
            par, obs_j, times_j, ids, sigma_obs=sobs,
            scan="blocked", analytic_grad=True, dt=dt_j,
        )

    ms = {}
    ms["fwd_only"] = bench(jax.jit(fwd_only), (theta0,))
    ms["fwd_moments"] = bench(jax.jit(fwd_moments), (theta0,))
    ms["val_grad_par"] = bench(
        jax.jit(jax.value_and_grad(val_grad_par)), (theta0,)
    )
    ms["val_grad_elem"] = bench(
        jax.jit(jax.value_and_grad(val_grad_elem)), (theta0,)
    )

    if "--trace" in sys.argv:
        trace_dir = sys.argv[sys.argv.index("--trace") + 1]
        f = jax.jit(jax.value_and_grad(val_grad_par))
        v, g = f(theta0)
        jax.block_until_ready((v, g))
        with jax.profiler.trace(trace_dir):
            for _ in range(10):
                v, g = f(theta0)
            jax.block_until_ready((v, g))
        print("trace written to", trace_dir)

    row = {
        "backend": backend,
        "n_steps": n,
        **{k: round(v, 3) for k, v in ms.items()},
        "bwd_implied_ms": round(ms["val_grad_par"] - ms["fwd_moments"], 3),
    }
    print(json.dumps(row), flush=True)
    with open("tools/kernel_profile.jsonl", "a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
