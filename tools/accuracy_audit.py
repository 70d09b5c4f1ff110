"""f32 (TPU) vs f64 (CPU) accuracy audit for the CTCRW SoA kernel.
Runs each precision in its own mode via argv; 'both' orchestrates."""
import json, subprocess, sys
import numpy as np

def run_mode(mode, n):
    sys.path.insert(0, "/root/repo")
    import jax
    if mode == "f64":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from smoothsde_tpu.ops.kalman_soa import ctcrw_loglik_soa
    dtype = jnp.float64 if mode == "f64" else jnp.float32
    rng = np.random.default_rng(0)
    times = np.cumsum(rng.uniform(0.4, 0.6, size=n))
    obs = np.cumsum(rng.normal(size=(n, 2)) * 0.3, axis=0)
    ids = np.zeros(n, np.int32)
    theta = jnp.asarray([0.05, -0.02, np.log(2.0), np.log(1.0)], dtype)
    o, t = jnp.asarray(obs, dtype), jnp.asarray(times, dtype)
    scan = "blocked" if mode == "f64" else "fused"
    analytic = True  # Fisher-identity bwd avoids AD-through-associative (CPU bug)

    def nllk(th):
        par = jnp.broadcast_to(th, (n, 4))
        return -ctcrw_loglik_soa(par, o, t, ids, sigma_obs=jnp.asarray(0.1, dtype),
                                 scan=scan, analytic_grad=analytic)
    v, g = jax.value_and_grad(nllk)(theta)
    print(json.dumps({"mode": mode, "backend": jax.default_backend(),
                      "v": float(v), "g": np.asarray(g, np.float64).tolist()}))

if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] in ("f32", "f64"):
        run_mode(sys.argv[1], int(sys.argv[2]))
        sys.exit(0)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    out = {}
    for mode in ("f64", "f32"):
        r = subprocess.run([sys.executable, __file__, mode, str(n)],
                           capture_output=True, text=True, timeout=560)
        line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
        out[mode] = json.loads(line)
    v64, v32 = out["f64"]["v"], out["f32"]["v"]
    g64 = np.array(out["f64"]["g"]); g32 = np.array(out["f32"]["g"])
    print(f"n={n}")
    print(f"nllk f64({out['f64']['backend']})={v64:.6f} f32({out['f32']['backend']})={v32:.6f} rel={abs(v32-v64)/abs(v64):.2e}")
    for i, nm in enumerate(["mu1", "mu2", "log_tau", "log_nu"]):
        rel = abs(g32[i]-g64[i])/(abs(g64[i])+1e-12)
        print(f"grad {nm}: f64={g64[i]:+.6f} f32={g32[i]:+.6f} rel={rel:.2e}")
