"""Diagnose the config-4 NaN: evaluate the joint and marginal at init on
the TPU f32 path, stage by stage."""
import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
sys.argv = ["x", "4"]
import importlib.util
spec = importlib.util.spec_from_file_location("bc", "/root/repo/tools/bench_configs.py")
bc = importlib.util.module_from_spec(spec); spec.loader.exec_module(bc)
sde, truth = bc.config4()
bundle = sde.setup(kalman_impl="sequential")
packer = bundle.packer
x0 = jnp.asarray(packer.outer_init())
b0 = jnp.asarray(packer.inner_init())
full = packer.unpack(x0, b0)
jv = bundle.joint_nllk(full)
print("joint at init:", float(jv), flush=True)
gb = jax.grad(lambda b: bundle.joint_nllk(packer.unpack(x0, b)))(b0)
print("grad_b at init:", np.asarray(gb), flush=True)
import jax
Hb = jax.jacfwd(jax.grad(lambda b: bundle.joint_nllk(packer.unpack(x0, b))))(b0)
print("hess_b diag:", np.round(np.diag(np.asarray(Hb)), 3), flush=True)
from smoothsde_tpu.infer.laplace import make_laplace
marg = make_laplace(bundle.joint_nllk, packer)
v, bhat = jax.jit(marg)(x0, b0)
print("marginal at init:", float(v), flush=True)
print("bhat:", np.asarray(bhat), flush=True)
