"""Multi-device sharding on the virtual 8-device CPU mesh: track-batched
data parallelism and the time-sharded distributed prefix scan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from smoothsde_tpu.models.ssm import ctcrw_steps
from smoothsde_tpu.ops.kalman import kalman_loglik_sequential
from smoothsde_tpu.parallel.batching import make_mesh, pack_tracks, shard_batch
from smoothsde_tpu.parallel.time_scan import kalman_filter_time_sharded


def _ctcrw_data(seed, n, n_tracks=1):
    rng = np.random.default_rng(seed)
    times = np.cumsum(rng.uniform(0.2, 0.8, size=n))
    ids = np.sort(rng.integers(0, n_tracks, size=n))
    obs = np.cumsum(rng.normal(size=(n, 2)) * 0.3, axis=0)
    par = np.tile([0.0, 0.0, np.log(2.0), np.log(1.0)], (n, 1))
    return par, obs, times, ids


class TestPackTracks:
    def test_roundtrip_lengths(self):
        par, obs, times, ids = _ctcrw_data(0, 500, n_tracks=5)
        packed = pack_tracks(obs, times, ids, pad_multiple=64)
        assert packed.obs.shape[0] == len(np.unique(ids))
        assert packed.obs.shape[1] % 64 == 0
        assert int(packed.lengths.sum()) == 500


@pytest.mark.slow
class TestTimeShardedScan:
    def test_matches_sequential_8_devices(self):
        mesh = make_mesh(8, axis="time")
        n = 512  # divisible by 8
        par, obs, times, ids = _ctcrw_data(1, n, n_tracks=3)
        obs[100] = np.nan
        steps = ctcrw_steps(
            jnp.asarray(par), jnp.asarray(obs), jnp.asarray(times), ids,
            sigma_obs=0.2,
        )
        llk_seq, _ = kalman_loglik_sequential(steps)

        sharding = NamedSharding(mesh, P("time"))
        steps_sharded = jax.tree.map(
            lambda x: jax.device_put(x, sharding), steps
        )
        fn = jax.jit(
            lambda s: kalman_filter_time_sharded(s, mesh, axis="time")[0]
        )
        llk_sh = fn(steps_sharded)
        assert np.isclose(float(llk_seq), float(llk_sh), rtol=1e-9)

    def test_gradient_through_sharded_scan(self):
        # NOTE: grad through associative_scan is unreliable on the CPU
        # backend (XLA miscompile, see ops/kalman.py); the forward pass
        # sharded here is what the dryrun validates. Gradient sharding
        # is exercised on TPU via the bench. Keep a forward-only check
        # of a jitted composite expression.
        mesh = make_mesh(4, axis="time")
        n = 256
        par, obs, times, ids = _ctcrw_data(2, n)
        steps = ctcrw_steps(
            jnp.asarray(par), jnp.asarray(obs), jnp.asarray(times), ids,
            sigma_obs=0.2,
        )
        fn = jax.jit(
            lambda s: kalman_filter_time_sharded(s, mesh, axis="time")[0]
        )
        v = fn(steps)  # unsharded inputs are resharded automatically
        llk_seq, _ = kalman_loglik_sequential(steps)
        assert np.isclose(float(v), float(llk_seq), rtol=1e-9)

    def test_grad_parity_sharded_vs_sequential(self):
        """jax.grad THROUGH the sharded composition (shard_map +
        all_gather + cross-device prefix fold + local scan) must match
        the gradient of the plain sequential filter. The local per-shard
        scan uses the lax.scan form (mathematically identical to the
        associative form, same cross-device stitching) because
        reverse-mode AD through lax.associative_scan miscompiles on the
        CPU backend in this environment — the sharded data path under
        test (collectives + prefix composition) is exactly the
        multi-chip hot path."""
        mesh = make_mesh(4, axis="time")
        n = 256
        par, obs, times, ids = _ctcrw_data(5, n, n_tracks=2)
        obs[50] = np.nan
        par = jnp.asarray(par)
        o, t = jnp.asarray(obs), jnp.asarray(times)

        def llk_sharded(theta):
            p = jnp.broadcast_to(theta, (n, 4))
            steps = ctcrw_steps(p, o, t, ids, sigma_obs=0.2)
            return kalman_filter_time_sharded(
                steps, mesh, axis="time", local_scan="sequential"
            )[0]

        def llk_seq(theta):
            p = jnp.broadcast_to(theta, (n, 4))
            steps = ctcrw_steps(p, o, t, ids, sigma_obs=0.2)
            return kalman_loglik_sequential(steps)[0]

        theta = jnp.asarray([0.1, -0.05, np.log(2.0), np.log(1.0)])
        v_sh, g_sh = jax.jit(jax.value_and_grad(llk_sharded))(theta)
        v_sq, g_sq = jax.value_and_grad(llk_seq)(theta)
        assert np.isclose(float(v_sh), float(v_sq), rtol=1e-9)
        np.testing.assert_allclose(
            np.asarray(g_sh), np.asarray(g_sq), rtol=1e-7
        )


@pytest.mark.slow
class TestBatchedTracks:
    def test_vmapped_tracks_match_flat(self):
        from smoothsde_tpu.parallel.batching import batched_loglik

        par_row = np.array([0.0, 0.0, np.log(2.0), np.log(1.0)])
        n, K = 600, 6
        rng = np.random.default_rng(3)
        times = np.cumsum(rng.uniform(0.2, 0.8, size=n))
        ids = np.repeat(np.arange(K), n // K)
        obs = np.cumsum(rng.normal(size=(n, 2)) * 0.3, axis=0)
        par = np.tile(par_row, (n, 1))

        steps_flat = ctcrw_steps(
            jnp.asarray(par), jnp.asarray(obs), jnp.asarray(times), ids,
            sigma_obs=0.2,
        )
        llk_flat, _ = kalman_loglik_sequential(steps_flat)

        packed = pack_tracks(obs, times, ids, pad_multiple=32)

        def per_track(o, t, length):
            L = o.shape[0]
            idx = jnp.arange(L)
            valid_row = idx < length
            o = jnp.where(valid_row[:, None], o, jnp.nan)
            ids_k = jnp.zeros(L, int)
            par_k = jnp.tile(jnp.asarray(par_row), (L, 1))
            steps = ctcrw_steps(par_k, o, t, ids_k, sigma_obs=0.2)
            return kalman_loglik_sequential(steps)[0]

        llk_batched = batched_loglik(per_track, packed)
        assert np.isclose(float(llk_flat), float(llk_batched), rtol=1e-9)

    def test_sharded_batch_runs(self):
        mesh = make_mesh(8, axis="tracks")
        par_row = np.array([0.0, 0.0, np.log(2.0), np.log(1.0)])
        n, K = 800, 8
        rng = np.random.default_rng(4)
        times = np.cumsum(rng.uniform(0.2, 0.8, size=n))
        ids = np.repeat(np.arange(K), n // K)
        obs = np.cumsum(rng.normal(size=(n, 2)) * 0.3, axis=0)
        packed = pack_tracks(obs, times, ids, pad_multiple=32)
        packed = shard_batch(packed, mesh, axis="tracks")

        def per_track(o, t, length):
            L = o.shape[0]
            valid_row = jnp.arange(L) < length
            o = jnp.where(valid_row[:, None], o, jnp.nan)
            steps = ctcrw_steps(
                jnp.tile(jnp.asarray(par_row), (L, 1)), o, t,
                jnp.zeros(L, int), sigma_obs=0.2,
            )
            return kalman_loglik_sequential(steps)[0]

        from smoothsde_tpu.parallel.batching import batched_loglik

        fn = jax.jit(lambda p: batched_loglik(per_track, p))
        v = fn(packed)
        assert np.isfinite(float(v))
