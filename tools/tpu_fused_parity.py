"""TPU f32 parity spot-check: fused Pallas CTCRW path vs XLA SoA path.

Runs on the real chip (no interpret mode): value + 4-component gradient
of the CTCRW nllk under scan='fused' (Pallas kernels, Fisher backward)
vs scan='blocked' (pure-XLA SoA scan, same Fisher backward), both f32.
Complements the f64 interpret-mode parity tests in tests/test_kalman.py
by exercising the compiled Mosaic kernels themselves.
"""

import numpy as np
import jax
import jax.numpy as jnp

from smoothsde_tpu.ops.kalman_soa import ctcrw_loglik_soa


def check(n, seed, n_tracks, sigma_obs=0.2):
    rng = np.random.default_rng(seed)
    times = np.cumsum(rng.uniform(0.2, 0.8, size=n))
    ids = np.sort(rng.integers(0, n_tracks, size=n))
    obs = np.cumsum(rng.normal(size=(n, 2)) * 0.3, axis=0)
    obs[n // 4] = np.nan
    theta = jnp.asarray([0.05, -0.1, np.log(2.0), np.log(1.0)], jnp.float32)

    def nll(th, scan):
        par = jnp.broadcast_to(th, (n, 4))
        return -ctcrw_loglik_soa(
            par, obs, times, ids, sigma_obs=sigma_obs,
            scan=scan, analytic_grad=True,
        )

    vg_f = jax.jit(jax.value_and_grad(lambda t: nll(t, "fused")))
    vg_b = jax.jit(jax.value_and_grad(lambda t: nll(t, "blocked")))
    v_f, g_f = vg_f(theta)
    v_b, g_b = vg_b(theta)
    v_f, g_f, v_b, g_b = map(np.asarray, (v_f, g_f, v_b, g_b))
    rel_v = abs(v_f - v_b) / max(abs(v_b), 1.0)
    rel_g = np.max(np.abs(g_f - g_b) / np.maximum(np.abs(g_b), 1e-3))
    print(f"n={n:7d} tracks={n_tracks}  v_f={v_f:.6f} v_b={v_b:.6f} "
          f"rel_v={rel_v:.2e}  max_rel_g={rel_g:.2e}")
    assert rel_v < 5e-5, (v_f, v_b)
    assert rel_g < 5e-3, (g_f, g_b)


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform)
    check(80, 60, 2)
    check(1200, 61, 3)
    check(100_000, 62, 5)
    print("TPU fused parity OK")
