"""Smoke: no-RE CTCRW fit on TPU via the fused+analytic objective path."""
import sys, time, numpy as np
sys.path.insert(0, "/root/repo")
import jax
from smoothsde_tpu import SDE
print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)
n = 20000
dt = 0.5
tau_t, nu_t, sobs_t = 3.0, 1.0, 0.15
beta = 1.0/tau_t; sigma = 2.0*nu_t/np.sqrt(np.pi*tau_t)
from smoothsde_tpu.utils.misc import ctcrw_cov
v = np.zeros(2); z = np.zeros(2); obs = np.empty((n,2)); obs[0]=0
for i in range(1, n):
    e = np.exp(-beta*dt); V = ctcrw_cov(beta, sigma, dt)
    for d in range(2):
        mv = e*v[d]; mz = z[d]+v[d]/beta*(1-e)
        v[d], z[d] = rng.multivariate_normal([mv,mz], V)
    obs[i] = z + rng.normal(size=2)*sobs_t
data = {"ID": np.zeros(n,int), "time": np.arange(n)*dt, "y1": obs[:,0], "y2": obs[:,1]}
sde = SDE(data=data, type="CTCRW", response=["y1","y2"], par0=[0,0,2.0,0.8])
t0 = time.time()
res = sde.fit(compute_sdreport=True)
print(f"fit wall {time.time()-t0:.1f}s converged={res.convergence==0} value={res.value:.1f}", flush=True)
est = sde.par(t=0)[0]
print("tau", est[2], "nu", est[3], "sobs", float(np.exp(res.par[res.par_names.index('log_sigma_obs')])), flush=True)
print("timings:", {k: round(v['steady_s'],4) for k,v in res.timings.items()}, flush=True)
