"""TPU reverse-AD coverage for lax.associative_scan compositions
(VERDICT r2 item 3): the time-sharded builder selects
local_scan='associative' on TPU (parallel/dist.py), a composition whose
gradient previously had zero test coverage on ANY backend (CPU is
blocked by the XLA:CPU miscompile pinned in
tools/cpu_assoc_scan_repro.py; TPU is unaffected — this artifact is the
evidence).

Checks, on the default (TPU) backend with a 1-device mesh:
  1. grad through kalman_loglik(impl='parallel')   vs impl='sequential'
  2. grad through kalman_filter_time_sharded(local_scan='associative')
     vs the sequential filter gradient
  3. grad through the SoA time-sharded path (local_scan='blocked',
     the production TPU selection) vs sequential

Appends one JSON line to tools/assoc_grad_check.jsonl.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def rel_err(a, b):
    a, b = np.asarray(a, float), np.asarray(b, float)
    denom = np.maximum(np.abs(b), 1e-3 * np.max(np.abs(b)) + 1e-30)
    return float(np.max(np.abs(a - b) / denom))


def main():
    import os

    import jax

    # persistent compile cache: the associative-scan gradient graphs
    # compile slowly through the remote-TPU tunnel; cache so a re-run
    # resumes instead of recompiling from scratch
    cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0
        )
    except Exception:
        pass

    import jax.numpy as jnp
    from jax.sharding import Mesh

    from smoothsde_tpu.models.ssm import ctcrw_steps
    from smoothsde_tpu.ops.kalman import kalman_loglik
    from smoothsde_tpu.ops.kalman_soa import precompute_dt
    from smoothsde_tpu.parallel.time_scan import (
        kalman_filter_time_sharded,
    )

    backend = jax.default_backend()
    rng = np.random.default_rng(3)
    n = 4096
    times = np.cumsum(rng.uniform(0.4, 0.6, n))
    obs = np.cumsum(rng.normal(size=(n, 2)) * 0.3, axis=0)
    ids = np.zeros(n, np.int32)
    dt = precompute_dt(times, ids)
    obs_j = jnp.asarray(obs.astype(np.float32))
    times_j = jnp.asarray(times, jnp.float32)
    dt_j = jnp.asarray(dt, jnp.float32)
    theta0 = jnp.asarray([0.0, 0.0, np.log(2.0), 0.0], jnp.float32)

    def nllk(theta, impl):
        par = jnp.broadcast_to(theta, (n, 4))
        steps = ctcrw_steps(
            par, obs_j, times_j, ids, sigma_obs=jnp.float32(0.1),
            dt=dt_j,
        )
        return -kalman_loglik(steps, impl=impl)

    import time as _time

    def _timed(label, f, *a):
        t0 = _time.time()
        out = f(*a)
        jax.block_until_ready(out)
        print(f"{label}: {(_time.time() - t0):.1f}s", flush=True)
        return out

    g_seq = _timed(
        "grad seq", jax.jit(jax.grad(lambda t: nllk(t, "sequential"))),
        theta0,
    )
    g_par = _timed(
        "grad assoc", jax.jit(jax.grad(lambda t: nllk(t, "parallel"))),
        theta0,
    )
    err_parallel = rel_err(g_par, g_seq)

    mesh = Mesh(np.array(jax.devices()[:1]), ("time",))

    def nllk_ts(theta, local_scan):
        par = jnp.broadcast_to(theta, (n, 4))
        steps = ctcrw_steps(
            par, obs_j, times_j, ids, sigma_obs=jnp.float32(0.1),
            dt=dt_j,
        )
        llk, _ = kalman_filter_time_sharded(
            steps, mesh, axis="time", local_scan=local_scan
        )
        return -llk

    g_ts = _timed(
        "grad time-sharded assoc",
        jax.jit(jax.grad(lambda t: nllk_ts(t, "associative"))),
        theta0,
    )
    err_time_sharded_assoc = rel_err(g_ts, g_seq)

    # SoA time-sharded path (production TPU selection: blocked)
    from smoothsde_tpu.ops.kalman_soa import (
        _ID2,
        _combine2,
        _ctcrw_system,
        _llk_from_filtered,
    )
    from smoothsde_tpu.parallel.time_scan import soa_sharded_prefix_scan

    def nllk_soa_ts(theta, local_scan):
        par = jnp.broadcast_to(theta, (n, 4))
        sys = _ctcrw_system(
            par, obs_j, times_j, jnp.asarray(ids), jnp.float32(0.1),
            dt=dt_j,
        )
        scanned = soa_sharded_prefix_scan(
            _combine2, _ID2, sys.elem, mesh, "time", local_scan
        )
        return -_llk_from_filtered(sys, scanned.b, scanned.C)

    g_soa = _timed(
        "grad soa time-sharded blocked",
        jax.jit(jax.grad(lambda t: nllk_soa_ts(t, "blocked"))),
        theta0,
    )
    err_soa_blocked = rel_err(g_soa, g_seq)
    g_soa_a = _timed(
        "grad soa time-sharded assoc",
        jax.jit(jax.grad(lambda t: nllk_soa_ts(t, "associative"))),
        theta0,
    )
    err_soa_assoc = rel_err(g_soa_a, g_seq)

    # f32 tolerance: gradients at n=4096 carry relative roundoff ~1e-4
    tol = 5e-3
    row = {
        "backend": backend,
        "jax": jax.__version__,
        "n": n,
        "grad_seq": np.asarray(g_seq, float).round(5).tolist(),
        "rel_err_parallel_vs_seq": err_parallel,
        "rel_err_time_sharded_assoc_vs_seq": err_time_sharded_assoc,
        "rel_err_soa_time_sharded_blocked_vs_seq": err_soa_blocked,
        "rel_err_soa_time_sharded_assoc_vs_seq": err_soa_assoc,
        "tolerance": tol,
        "pass": bool(
            max(
                err_parallel,
                err_time_sharded_assoc,
                err_soa_blocked,
                err_soa_assoc,
            )
            < tol
        ),
    }
    print(json.dumps(row), flush=True)
    with open("tools/assoc_grad_check.jsonl", "a") as f:
        f.write(json.dumps(row) + "\n")
    sys.exit(0 if row["pass"] else 1)


if __name__ == "__main__":
    main()
