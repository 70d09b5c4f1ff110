import os
os.environ["SMOOTHSDE_PALLAS_INTERPRET"] = "1"
import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from smoothsde_tpu.ops.kalman_soa import _ctcrw_system
from smoothsde_tpu.ops.kalman_smooth import llk2_analytic

rng = np.random.default_rng(0)
n = 300
times = np.cumsum(rng.uniform(0.2, 0.8, size=n))
ids = np.sort(rng.integers(0, 3, size=n))
obs = np.cumsum(rng.normal(size=(n, 2)) * 0.3, axis=0)
obs[40] = np.nan
par = jnp.asarray(np.column_stack([
    rng.normal(size=n)*0.2, rng.normal(size=n)*0.2,
    np.log(2.0)+rng.normal(size=n)*0.1, np.log(1.0)+rng.normal(size=n)*0.1]))
sys0 = _ctcrw_system(par, obs, times, ids, 0.2)

def make_f(scan):
    def f(Ft, ct, Qt, yd, h):
        sys2 = sys0._replace(Ft=Ft, ct=ct, Qt=Qt, yd=yd, h=h)
        return llk2_analytic(sys2, scan)
    return f

args = (sys0.Ft, sys0.ct, sys0.Qt, sys0.yd, sys0.h)
vb, vjp_b = jax.vjp(make_f("blocked"), *args)
vf, vjp_f = jax.vjp(make_f("fused"), *args)
print("values:", float(vb), float(vf), flush=True)
g1 = jnp.asarray(1.0)
cb = vjp_b(g1); cf = vjp_f(g1)
names = ["Ft", "ct", "Qt", "yd", "h"]
for nm, a, b in zip(names, cb, cf):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    for i, (x, y) in enumerate(zip(la, lb)):
        x, y = np.asarray(x), np.asarray(y)
        err = np.max(np.abs(x - y) / (np.abs(x) + 1e-6))
        print(f"{nm}[{i}] shapes {x.shape}{y.shape} maxrel {err:.3e}", flush=True)
        if err > 1e-6 and x.ndim >= 1:
            idx = np.unravel_index(np.argmax(np.abs(x - y)), x.shape)
            print(f"   worst at {idx}: ref={x[idx]:.6f} fused={y[idx]:.6f}", flush=True)
