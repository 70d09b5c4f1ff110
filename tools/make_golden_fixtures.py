"""Generate the self-golden regression fixtures (tests/golden/*.npz).

For each BASELINE config this freezes, at a FIXED deterministic
parameter point (init + seeded perturbation):
  - the design matrices X_fe / X_re and stacked penalty blocks,
  - the penalized joint nllk value,
  - the Laplace marginal value and gradient,
  - the response-scale parameter curve on a covariate grid.

A test (tests/test_golden.py) rebuilds each config and asserts exact
(design) / tight-tolerance (values) reproduction, so basis or objective
refactors cannot silently shift estimates (VERDICT r2 item 6). These
fixtures pin THIS implementation — they are regression anchors, not
external (mgcv/TMB) validation, which remains environment-blocked
(no R, no network; see docs/ACCURACY.md).

Run on the float64 CPU backend (the tests' configuration):
    python tools/make_golden_fixtures.py
"""

import os
import sys

os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8",
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(__file__))

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden",
)


def build_configs():
    """The five BASELINE configs (1M-step config-5 pair at reduced n:
    the code path, not the scale, is what the fixture pins)."""
    import bench_configs as bc

    return {
        "config1": lambda: bc.config1()[0],
        "config2": lambda: bc.config2()[0],
        "config3": lambda: bc.config3()[0],
        "config4": lambda: bc.config4()[0],
        "config5a": lambda: bc.config5_ctcrw(n=20_000)[0],
        "config5b": lambda: bc.config5_cir(n=20_000)[0],
    }


def fixture_for(name, make_sde):
    sde = make_sde()
    bundle = sde.setup()
    pk = bundle.packer

    rng = np.random.default_rng(42)
    outer = pk.outer_init() + 0.05 * rng.normal(size=pk.outer_init().shape)
    inner = pk.inner_init() + 0.05 * rng.normal(size=pk.inner_init().shape)
    full = pk.unpack(jnp.asarray(outer), jnp.asarray(inner))

    joint = float(bundle.joint_nllk(full))

    from smoothsde_tpu.infer.laplace import make_laplace

    marginal = make_laplace(
        bundle.joint_nllk, pk,
        joint_nllk_ad=bundle.joint_nllk_ad,
        hess_plan=bundle.hess_plan,
    )
    (mval, _), mgrad = jax.value_and_grad(marginal, has_aux=True)(
        jnp.asarray(outer), jnp.asarray(pk.inner_init())
    )

    # response-scale parameter curve at the frozen coefficients
    est = pk.split_estimates(outer, np.asarray(inner))
    sde._coeff_fe = np.asarray(est["coeff_fe"])
    if inner.size and "coeff_re" in est:
        sde._coeff_re = np.asarray(est["coeff_re"])
    n_grid = min(64, sde.n_obs())
    idx = np.linspace(0, sde.n_obs() - 1, n_grid).astype(int)
    curve = np.asarray(sde.par(t=idx.tolist()))

    mats = sde.make_mat()
    return {
        "outer": outer,
        "inner": inner,
        "joint_nllk": np.asarray(joint),
        "marginal_nllk": np.asarray(float(mval)),
        "marginal_grad": np.asarray(mgrad),
        "par_curve": curve,
        "par_curve_idx": idx,
        "X_fe": np.asarray(mats["X_fe"], np.float64),
        "X_re": np.asarray(mats["X_re"], np.float64),
        "S": np.asarray(mats["S"], np.float64),
    }


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    for name, make_sde in build_configs().items():
        fx = fixture_for(name, make_sde)
        path = os.path.join(OUT_DIR, f"{name}.npz")
        np.savez_compressed(path, **fx)
        print(
            f"{name}: joint={float(fx['joint_nllk']):.6f} "
            f"marginal={float(fx['marginal_nllk']):.6f} "
            f"-> {path} ({os.path.getsize(path) / 1024:.0f} KiB)"
        )


if __name__ == "__main__":
    main()
