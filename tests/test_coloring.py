"""Compressed (colored) inner Hessians vs dense jacfwd (exactness) and
the wide-random-effect speed path."""

import numpy as np
import jax
import jax.numpy as jnp

from smoothsde_tpu import SDE
from smoothsde_tpu.infer.coloring import colored_hessian, plan_coloring


def _multi_animal_data(K=12, n_per=40, seed=3):
    rng = np.random.default_rng(seed)
    rows = {"ID": [], "time": [], "z": [], "x": []}
    for k in range(K):
        sig_k = 0.8 * np.exp(rng.normal() * 0.3)
        t = np.cumsum(rng.uniform(0.3, 0.8, n_per))
        z = np.concatenate(
            [[0.0], np.cumsum(sig_k * np.sqrt(np.diff(t))
                              * rng.normal(size=n_per - 1))]
        )
        rows["ID"].extend([f"a{k:03d}"] * n_per)
        rows["time"].extend(t.tolist())
        rows["z"].extend(z.tolist())
        rows["x"].extend(rng.uniform(0, 1, n_per).tolist())
    return {k: np.asarray(v) for k, v in rows.items()}


class TestColoring:
    def test_plan_compresses_re_plus_spline(self):
        data = _multi_animal_data(K=12)
        sde = SDE(
            data=data, type="BM", response="z",
            formulas={"mu": "~1",
                      "sigma": "~s(x, k=5, bs='cs') + s(ID, bs='re')"},
            par0=[0.0, 1.0],
        )
        bundle = sde.setup()
        plan = bundle.hess_plan
        assert plan is not None
        # 12 re columns + 4 spline columns: the re columns share one
        # color, each spline column needs its own
        assert plan["p"] == 16
        assert plan["n_colors"] <= 6

    def test_colored_hessian_exact(self):
        """Colored H_bb equals dense jacfwd H_bb to machine precision
        on the real objective."""
        data = _multi_animal_data(K=8)
        sde = SDE(
            data=data, type="BM", response="z",
            formulas={"mu": "~1",
                      "sigma": "~s(x, k=5, bs='cs') + s(ID, bs='re')"},
            par0=[0.0, 1.0],
        )
        bundle = sde.setup()
        # force a plan even under the size threshold
        pg_off = np.concatenate(
            [[0], np.cumsum(sde._design.ncol_re)]
        ).astype(int)
        couplings = [
            (np.arange(pg_off[k], pg_off[k + 1]), sde._design.S_groups[k])
            for k in range(len(sde._design.ncol_re))
        ]
        plan = plan_coloring(sde._design.re_blocks(), couplings)
        assert plan is not None

        packer = bundle.packer

        def f_ad(outer, b):
            return bundle.joint_nllk_ad(packer.unpack(outer, b))

        grad_b = jax.grad(f_ad, argnums=1)
        outer = jnp.asarray(packer.outer_init())
        rng = np.random.default_rng(0)
        b = jnp.asarray(rng.normal(size=packer.n_inner) * 0.1)

        H_dense = jax.jacfwd(grad_b, argnums=1)(outer, b)
        H_col = colored_hessian(grad_b, plan)(outer, b)
        np.testing.assert_allclose(
            np.asarray(H_col), np.asarray(H_dense), rtol=1e-9, atol=1e-9
        )

    def test_wide_re_fit_uses_plan_and_recovers(self):
        """End-to-end: 40 animals, per-animal sigma random effect — the
        colored path must produce a converged fit with sensible
        population recovery."""
        data = _multi_animal_data(K=40, n_per=30, seed=9)
        sde = SDE(
            data=data, type="BM", response="z",
            formulas={"mu": "~1", "sigma": "~s(ID, bs='re')"},
            par0=[0.0, 1.0],
        )
        bundle = sde.setup()
        assert bundle.hess_plan is not None
        assert bundle.hess_plan["n_colors"] == 1  # disjoint tracks
        res = sde.fit()
        assert res.convergence == 0
        sig_hat = sde.par(t="all", X_fe=sde.mats()["X_fe"],
                          X_re=sde.mats()["X_re"])[:, 1]
        # population-level scale approximately 0.8
        assert abs(np.median(sig_hat) - 0.8) < 0.25
