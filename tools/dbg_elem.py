import os
os.environ["SMOOTHSDE_PALLAS_INTERPRET"] = "1"
import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from smoothsde_tpu.ops.kalman_soa import _ctcrw_system
from smoothsde_tpu.ops.ctcrw_fused import fused_filter, _smooth_elem, _BwdTiles
from smoothsde_tpu.ops import kalman_smooth as KS

rng = np.random.default_rng(0)
n = 60
times = np.cumsum(rng.uniform(0.2, 0.8, size=n))
ids = np.sort(rng.integers(0, 2, size=n))
obs = np.cumsum(rng.normal(size=(n, 2)) * 0.3, axis=0)
par = jnp.asarray(np.column_stack([
    rng.normal(size=n)*0.2, rng.normal(size=n)*0.2,
    np.log(2.0)+rng.normal(size=n)*0.1, np.log(1.0)+rng.normal(size=n)*0.1]))
sys0 = _ctcrw_system(par, obs, times, ids, 0.2)
llk, m_f, P_f = fused_filter(sys0, want_moments=True)
d = 2

# XLA smoother elements (replicate rts internals)
Ft, ct, Qt = sys0.Ft, sys0.ct, sys0.Qt
sb = KS._shift_back
Fn = ((sb(Ft[0][0], 1.0), sb(Ft[0][1])), (sb(Ft[1][0]), sb(Ft[1][1], 1.0)))
cn = (sb(ct[0]), sb(ct[1]))
Qn = ((sb(Qt[0][0]), sb(Qt[0][1])), (sb(Qt[1][0]), sb(Qt[1][1])))
from smoothsde_tpu.ops.kalman_soa import _m2, _t2, _madd, _inv2, _mv, _vadd, _vsub, _symm, _wh
bcast = lambda x: jnp.broadcast_to(x, (d, n))
Fn = ((bcast(Fn[0][0]), bcast(Fn[0][1])), (bcast(Fn[1][0]), bcast(Fn[1][1])))
cn2 = cn
Qn = ((bcast(Qn[0][0]), bcast(Qn[0][1])), (bcast(Qn[1][0]), bcast(Qn[1][1])))
FP = _m2(Fn, P_f)
Pp = _symm(_madd(_m2(FP, _t2(Fn)), Qn))
G = _m2(_t2(FP), _inv2(Pp))
g = _vsub(m_f, _mv(G, _vadd(_mv(Fn, m_f), cn2)))
import jax.tree as jt
L = _symm(_madd(P_f, jt.map(lambda x: -x, _m2(_m2(G, Pp), _t2(G)))))
te = jnp.broadcast_to(jnp.concatenate([sys0.reset[1:], jnp.ones((1,), bool)]), (d, n))
E_x = _wh(te, ((jnp.zeros((d,n)),)*2,)*2, G)
g_x = _wh(te, m_f, g)
L_x = _wh(te, P_f, L)

# fused elements via _smooth_elem on (1, d, n)-shaped tiles
dtype = jnp.float64
tvn = sb(( (~sys0.reset) & (~sys0.prev_reset) ).astype(dtype))
tiles = _BwdTiles(
    fn01=bcast(Fn[0][1])[None], fn11=bcast(Fn[1][1])[None],
    qn00=Qn[0][0][None], qn01=Qn[0][1][None], qn11=Qn[1][1][None],
    cn0=cn2[0][None], cn1=cn2[1][None],
    m0=m_f[0][None], m1=m_f[1][None],
    Pf00=P_f[0][0][None], Pf01=P_f[0][1][None], Pf11=P_f[1][1][None],
    te=te.astype(dtype)[None], tvn=bcast(tvn)[None],
    y=sys0.yd[None], upd=bcast(sys0.update.astype(dtype))[None],
    rst=bcast(sys0.reset.astype(dtype))[None],
)
elem_f, G_f = _smooth_elem(tiles, 0)
for name, a, b in [("E00", E_x[0][0], elem_f.E[0][0]), ("E01", E_x[0][1], elem_f.E[0][1]),
                   ("E10", E_x[1][0], elem_f.E[1][0]), ("E11", E_x[1][1], elem_f.E[1][1]),
                   ("g0", g_x[0], elem_f.g[0]), ("g1", g_x[1], elem_f.g[1]),
                   ("L00", L_x[0][0], elem_f.L[0][0]), ("L01", L_x[0][1], elem_f.L[0][1]),
                   ("L11", L_x[1][1], elem_f.L[1][1])]:
    a, b = np.asarray(a), np.asarray(b)
    err = np.max(np.abs(a - b))
    print(f"{name}: max abs diff {err:.3e}", flush=True)
    if err > 1e-9:
        idx = np.unravel_index(np.argmax(np.abs(a-b)), a.shape)
        print("   at", idx, "xla:", a[idx], "fused:", b[idx], flush=True)
