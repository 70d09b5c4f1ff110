"""f32 (TPU) vs f64 (CPU) accuracy audit for the CTCRW kernels.

Audits the production pipeline (host-f64 dt via precompute_dt — diff of
f32 absolute times would otherwise dominate) on three paths:
  f64 oracle  : CPU blocked scan, analytic gradient
  f32 fused   : TPU fused Pallas + Fisher-identity gradient (speed path)
  f32 sqrt    : TPU square-root blocked scan + AD gradient (accuracy path)
Runs each precision in its own process via argv; 'both' orchestrates.
"""
import json, subprocess, sys
import numpy as np

def run_mode(mode, n):
    sys.path.insert(0, "/root/repo")
    import jax
    if mode == "f64":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from smoothsde_tpu.ops.kalman_soa import ctcrw_loglik_soa, precompute_dt
    from smoothsde_tpu.ops.kalman_sqrt import ctcrw_loglik_sqrt
    dtype = jnp.float64 if mode == "f64" else jnp.float32
    rng = np.random.default_rng(0)
    times = np.cumsum(rng.uniform(0.4, 0.6, size=n))
    obs = np.cumsum(rng.normal(size=(n, 2)) * 0.3, axis=0)
    ids = np.zeros(n, np.int32)
    dt = jnp.asarray(precompute_dt(times, ids), dtype)
    theta = jnp.asarray([0.05, -0.02, np.log(2.0), np.log(1.0)], dtype)
    o, t = jnp.asarray(obs, dtype), jnp.asarray(times, dtype)
    sobs = jnp.asarray(0.1, dtype)

    def nllk_moment(th):
        par = jnp.broadcast_to(th, (n, 4))
        scan = "blocked" if mode == "f64" else "fused"
        return -ctcrw_loglik_soa(par, o, t, ids, sigma_obs=sobs,
                                 scan=scan, analytic_grad=True, dt=dt)

    def nllk_sqrt(th):
        par = jnp.broadcast_to(th, (n, 4))
        return -ctcrw_loglik_sqrt(par, o, t, ids, sigma_obs=sobs,
                                  scan="blocked", dt=dt)

    out = {"mode": mode, "backend": jax.default_backend()}
    v, g = jax.value_and_grad(nllk_moment)(theta)
    out["v"] = float(v)
    out["g"] = np.asarray(g, np.float64).tolist()
    if mode == "f32":
        v2, g2 = jax.value_and_grad(nllk_sqrt)(theta)
        out["v_sqrt"] = float(v2)
        out["g_sqrt"] = np.asarray(g2, np.float64).tolist()
    print(json.dumps(out))

if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] in ("f32", "f64"):
        run_mode(sys.argv[1], int(sys.argv[2]))
        sys.exit(0)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    out = {}
    for mode in ("f64", "f32"):
        r = subprocess.run([sys.executable, __file__, mode, str(n)],
                           capture_output=True, text=True, timeout=1800)
        line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
        out[mode] = json.loads(line)
    v64 = out["f64"]["v"]
    g64 = np.array(out["f64"]["g"])
    print(f"n={n}  (f64 backend={out['f64']['backend']}, "
          f"f32 backend={out['f32']['backend']})")
    names = ["mu1", "mu2", "log_tau", "log_nu"]
    for label, vk, gk in (("fused", "v", "g"), ("sqrt", "v_sqrt", "g_sqrt")):
        v32 = out["f32"][vk]
        g32 = np.array(out["f32"][gk])
        print(f"[{label}] nllk f64={v64:.6f} f32={v32:.6f} "
              f"rel={abs(v32 - v64) / abs(v64):.2e}")
        for i, nm in enumerate(names):
            rel = abs(g32[i] - g64[i]) / (abs(g64[i]) + 1e-12)
            print(f"[{label}] grad {nm}: f64={g64[i]:+.6f} "
                  f"f32={g32[i]:+.6f} rel={rel:.2e}")
