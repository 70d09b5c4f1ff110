"""Prove the mesh-sharded likelihoods ride the single-chip fast kernels
(VERDICT r2 item 1 'done' criterion): on a 1-device TPU mesh — enough
to prove KERNEL SELECTION, the collectives being no-ops — the sharded
per-eval value+grad must be within ~1.3x of the unsharded fused path at
1M steps.

Three columns, 1M-step 2-D CTCRW (8 tracks x 125k for the track axis;
one 1M track for the time axis):
  unsharded    — ctcrw_loglik_soa(scan='fused', analytic_grad=True),
                 the bench.py headline path
  tracks-mesh  — build_sharded_loglik fast path (shard_map -> flatten
                 local tracks -> same fused kernel -> psum)
  time-mesh    — _build_time_sharded_soa_loglik (SoA blocked local scan
                 + prefix stitching)

Appends one JSON line to tools/sharded_kernel_check.jsonl.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timeit(fn, args, reps=20, rounds=5):
    import jax

    v = fn(*args)
    jax.block_until_ready(v)
    for _ in range(20):
        v = fn(*args)
    jax.block_until_ready(v)
    best = np.inf
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(reps):
            v = fn(*args)
        jax.block_until_ready(v)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from smoothsde_tpu.models.registry import get_model_spec
    from smoothsde_tpu.ops.kalman_soa import ctcrw_loglik_soa, precompute_dt
    from smoothsde_tpu.parallel.dist import (
        _build_sharded_soa_loglik,
        _build_time_sharded_soa_loglik,
        pack_layout,
    )

    backend = jax.default_backend()
    dtype = jnp.float32
    n = 1_000_000
    K = 8
    L = n // K

    rng = np.random.default_rng(0)
    times = np.concatenate(
        [np.cumsum(rng.uniform(0.4, 0.6, L)) for _ in range(K)]
    )
    ids = np.repeat(np.arange(K, dtype=np.int32), L)
    obs = np.cumsum(
        rng.normal(size=(n, 2)).astype(np.float32) * 0.3, axis=0
    )
    theta0 = jnp.asarray([0.0, 0.0, np.log(2.0), 0.0], dtype)
    spec = get_model_spec("CTCRW", n_dim=2)

    obs_j = jnp.asarray(obs)
    times_j = jnp.asarray(times, dtype)
    dt_j = jnp.asarray(precompute_dt(times, ids), dtype)

    # ---- unsharded fused (the bench.py headline path) ----
    def nllk_flat(theta):
        par = jnp.broadcast_to(theta, (n, 4))
        return -ctcrw_loglik_soa(
            par, obs_j, times_j, ids, sigma_obs=jnp.asarray(0.1, dtype),
            scan="fused", analytic_grad=True, dt=dt_j,
        )

    f_flat = jax.jit(jax.value_and_grad(nllk_flat))
    ms_flat = timeit(f_flat, (theta0,))
    v_flat, g_flat = f_flat(theta0)

    # ---- tracks-sharded on a 1-device mesh ----
    mesh_tr = Mesh(np.array(jax.devices()[:1]), ("tracks",))
    loglik_tr = _build_sharded_soa_loglik(
        spec, obs, times, ids, mesh_tr, "tracks",
        pack_layout(times, ids, 1),
    )
    full0 = {"log_sigma_obs": jnp.asarray([np.log(0.1)], dtype)}

    def nllk_tracks(theta):
        par = jnp.broadcast_to(theta, (n, 4))
        return -loglik_tr(full0, par)

    f_tr = jax.jit(jax.value_and_grad(nllk_tracks))
    ms_tr = timeit(f_tr, (theta0,))
    v_tr, g_tr = f_tr(theta0)

    # ---- time-sharded on a 1-device mesh ----
    ids1 = np.zeros(n, np.int32)
    times1 = np.cumsum(rng.uniform(0.4, 0.6, n))
    loglik_ti = _build_time_sharded_soa_loglik(
        spec, obs, times1, ids1, Mesh(np.array(jax.devices()[:1]),
                                      ("time",)), "time",
    )

    def nllk_time(theta):
        par = jnp.broadcast_to(theta, (n, 4))
        return -loglik_ti(full0, par)

    f_ti = jax.jit(jax.value_and_grad(nllk_time))
    ms_ti = timeit(f_ti, (theta0,))

    # ---- diag family (BM_SSM): unsharded fused vs time-sharded ----
    from smoothsde_tpu.ops.diag_fused import diag_ssm_loglik_fused

    z1 = np.cumsum(rng.normal(size=n) * 0.3).astype(np.float32)
    obs1_j = jnp.asarray(z1[:, None])
    times1_j = jnp.asarray(times1, dtype)
    dt1_j = jnp.asarray(precompute_dt(times1, ids1), dtype)
    theta_d = jnp.asarray([0.0, np.log(0.8)], dtype)

    def nllk_diag_flat(theta):
        par = jnp.broadcast_to(theta, (n, 2))
        return -diag_ssm_loglik_fused(
            "BM_SSM", par, obs1_j, times1_j, ids1,
            sigma_obs=jnp.asarray(0.1, dtype), dt=dt1_j,
        )

    f_dflat = jax.jit(jax.value_and_grad(nllk_diag_flat))
    ms_dflat = timeit(f_dflat, (theta_d,))
    v_dflat, g_dflat = f_dflat(theta_d)

    spec_d = get_model_spec("BM_SSM", n_dim=1)
    loglik_dt = _build_time_sharded_soa_loglik(
        spec_d, z1[:, None], times1, ids1,
        Mesh(np.array(jax.devices()[:1]), ("time",)), "time",
    )

    def nllk_diag_time(theta):
        par = jnp.broadcast_to(theta, (n, 2))
        return -loglik_dt(full0, par)

    f_dti = jax.jit(jax.value_and_grad(nllk_diag_time))
    ms_dti = timeit(f_dti, (theta_d,))
    v_dti, g_dti = f_dti(theta_d)
    diag_rel_v = abs(float(v_dti) - float(v_dflat)) / (
        1 + abs(float(v_dflat))
    )
    diag_rel_g = float(
        np.max(
            np.abs(np.asarray(g_dti) - np.asarray(g_dflat))
            / (np.abs(np.asarray(g_dflat)) + 1e-3)
        )
    )

    rel_v = abs(float(v_tr) - float(v_flat)) / (1 + abs(float(v_flat)))
    rel_g = float(
        np.max(
            np.abs(np.asarray(g_tr) - np.asarray(g_flat))
            / (np.abs(np.asarray(g_flat)) + 1e-3)
        )
    )
    row = {
        "backend": backend,
        "n_steps": n,
        "unsharded_fused_ms": round(ms_flat, 3),
        "tracks_sharded_ms": round(ms_tr, 3),
        "time_sharded_fused_ms": round(ms_ti, 3),
        "tracks_overhead_x": round(ms_tr / ms_flat, 3),
        "time_overhead_x": round(ms_ti / ms_flat, 3),
        "tracks_value_relerr": rel_v,
        "tracks_grad_relerr": rel_g,
        "diag_unsharded_fused_ms": round(ms_dflat, 3),
        "diag_time_sharded_ms": round(ms_dti, 3),
        "diag_time_overhead_x": round(ms_dti / ms_dflat, 3),
        "diag_value_relerr": diag_rel_v,
        "diag_grad_relerr": diag_rel_g,
        "pass": bool(
            ms_tr / ms_flat < 1.3
            and ms_ti / ms_flat < 1.3
            and ms_dti / ms_dflat < 1.3
            and rel_v < 1e-4
            and diag_rel_v < 1e-4
        ),
    }
    print(json.dumps(row), flush=True)
    with open("tools/sharded_kernel_check.jsonl", "a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
