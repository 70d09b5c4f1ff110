"""Laplace marginalization oracle tests.

For BM with a random-effect mean (linear-Gaussian in coeff_re), the
Laplace approximation is exact, so the marginal nllk must match the
analytic Gaussian marginalization to machine precision — the same
oracle class SURVEY.md section 4 prescribes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from smoothsde_tpu.formula.design import build_design
from smoothsde_tpu.infer.laplace import make_laplace
from smoothsde_tpu.infer.objective import build_objective
from smoothsde_tpu.models.registry import get_model_spec


def _bm_re_setup(seed=0, n_id=4, n_per=25):
    rng = np.random.default_rng(seed)
    n = n_id * n_per
    ids = np.repeat(np.arange(n_id), n_per)
    times = np.tile(np.arange(n_per, dtype=float) * 0.5, n_id)
    b_true = rng.normal(size=n_id) * 0.7
    mu0, sigma = 0.3, 0.8
    obs = np.zeros(n)
    for k in range(n_id):
        sl = slice(k * n_per, (k + 1) * n_per)
        dt = np.diff(times[sl])
        steps = rng.normal(size=n_per - 1) * sigma * np.sqrt(dt) + (
            mu0 + b_true[k]
        ) * dt
        obs[sl] = np.concatenate([[0.0], np.cumsum(steps)])
    data = {
        "ID": np.array([f"id{k}" for k in ids]),
        "time": times,
        "z": obs,
    }
    design = build_design({"mu": "~s(ID, bs='re')", "sigma": "~1"}, data)
    spec = get_model_spec("BM", 1)
    bundle = build_objective(
        spec, design, obs[:, None], times, ids,
        kalman_impl="sequential",
    )
    return bundle, data, obs, times, ids, n_id, n_per


def _analytic_marginal(outer, obs, times, ids, n_id, n_per):
    """Closed-form marginal nllk: per track, increments are jointly
    Gaussian with covariance sigma^2 diag(dt) + dt dt'/lambda."""
    mu0, log_sigma, log_lambda = outer
    sigma = np.exp(log_sigma)
    lam = np.exp(log_lambda)
    total = 0.0
    for k in range(n_id):
        sl = slice(k * n_per, (k + 1) * n_per)
        t = times[sl]
        d = np.diff(obs[sl])
        dt = np.diff(t)
        cov = sigma**2 * np.diag(dt) + np.outer(dt, dt) / lam
        total -= stats.multivariate_normal.logpdf(d, mu0 * dt, cov)
    return total


@pytest.mark.slow
class TestLaplaceExactness:
    def test_marginal_matches_analytic(self):
        bundle, data, obs, times, ids, n_id, n_per = _bm_re_setup()
        marginal = make_laplace(bundle.joint_nllk, bundle.packer)
        assert bundle.packer.n_outer == 3  # mu intercept, sigma intercept, log_lambda
        assert bundle.packer.n_inner == n_id

        for outer in ([0.3, -0.2, 0.1], [0.0, 0.0, 0.0], [-0.5, 0.3, 1.0]):
            ours, bhat = marginal(
                jnp.asarray(outer, float), jnp.zeros(n_id)
            )
            theirs = _analytic_marginal(outer, obs, times, ids, n_id, n_per)
            assert np.isclose(float(ours), theirs, rtol=1e-8), (outer, float(ours), theirs)

    def test_gradient_matches_finite_differences(self):
        bundle, *_ = _bm_re_setup()
        marginal = make_laplace(bundle.joint_nllk, bundle.packer)
        n_in = bundle.packer.n_inner
        x = jnp.asarray([0.2, -0.1, 0.4])
        b0 = jnp.zeros(n_in)
        g = jax.grad(lambda xx: marginal(xx, b0)[0])(x)
        for i in range(3):
            h = 1e-6
            xp = np.asarray(x).copy(); xp[i] += h
            xm = np.asarray(x).copy(); xm[i] -= h
            fd = (
                float(marginal(jnp.asarray(xp), b0)[0])
                - float(marginal(jnp.asarray(xm), b0)[0])
            ) / (2 * h)
            assert np.isclose(float(g[i]), fd, rtol=1e-5, atol=1e-7)

    def test_bhat_is_posterior_mode(self):
        bundle, data, obs, times, ids, n_id, n_per = _bm_re_setup()
        marginal = make_laplace(bundle.joint_nllk, bundle.packer)
        x = jnp.asarray([0.3, -0.2, 0.1])
        _, bhat = marginal(x, jnp.zeros(n_id))
        g = jax.grad(
            lambda b: bundle.joint_nllk(bundle.packer.unpack(x, b))
        )(bhat)
        assert np.max(np.abs(np.asarray(g))) < 1e-6


class TestEndToEndFit:
    def test_bm_random_effect_recovery(self):
        from smoothsde_tpu.infer.fit import fit_model

        bundle, data, obs, times, ids, n_id, n_per = _bm_re_setup(
            seed=3, n_id=8, n_per=50
        )
        res = fit_model(bundle)
        assert res.convergence == 0
        est = dict(zip(res.par_names, res.par))
        # mu intercept near 0.3, sigma near log 0.8 (loose: small data)
        names = res.par_names
        mu_hat = res.par[names.index("coeff_fe")]
        assert abs(mu_hat - 0.3) < 0.5
        sig_idx = [i for i, nm in enumerate(names) if nm == "coeff_fe"][1]
        assert abs(np.exp(res.par[sig_idx]) - 0.8) < 0.15
        # sdreport pieces present and consistent
        assert res.joint_precision is not None
        assert res.joint_precision.shape == (3 + n_id, 3 + n_id)
        w = np.linalg.eigvalsh(res.joint_precision)
        assert w.min() > 0


class TestHybridLaplace:
    """The primary objective may carry a reverse-only custom_vjp (fused
    Pallas + Fisher-identity gradient on TPU); `joint_nllk_ad` routes
    all forward-mode/second-order work. Emulate that split on CPU with
    a custom_vjp wrapper that would fail under jacfwd, and require the
    marginal value and gradient to match the pure-AD Laplace."""

    def test_reverse_only_primary_matches_pure_ad(self):
        bundle, data, obs, times, ids, n_id, n_per = _bm_re_setup()
        packer = bundle.packer

        raw = bundle.joint_nllk_ad

        @jax.custom_vjp
        def reverse_only(outer, b):
            return raw(packer.unpack(outer, b))

        def fwd(outer, b):
            out, vjp = jax.vjp(
                lambda o, bb: raw(packer.unpack(o, bb)), outer, b
            )
            return out, vjp

        def bwd(vjp, ct):
            return vjp(ct)

        reverse_only.defvjp(fwd, bwd)

        def joint_fast(full):
            # rebuild (outer, b) so the custom_vjp sits on the whole
            # likelihood, like the fused kernel does
            outer = full["__outer"]
            b = full["__inner"]
            return reverse_only(outer, b)

        # make_laplace unpacks for us; wrap so the fast path sees the
        # packed vectors directly.
        class FakePacker:
            n_inner = packer.n_inner

            @staticmethod
            def unpack(outer, b=None):
                if b is None:
                    b = jnp.zeros((packer.n_inner,))
                return {"__outer": outer, "__inner": b}

        marg_hybrid = make_laplace(
            joint_fast, FakePacker,
            joint_nllk_ad=lambda full: raw(
                packer.unpack(full["__outer"], full["__inner"])
            ),
        )
        marg_pure = make_laplace(bundle.joint_nllk_ad, packer)

        x = jnp.asarray([0.3, -0.2, 0.1])
        b0 = jnp.zeros(n_id)
        (vh, _), gh = jax.value_and_grad(marg_hybrid, has_aux=True)(x, b0)
        (vp, _), gp = jax.value_and_grad(marg_pure, has_aux=True)(x, b0)
        assert np.isclose(float(vh), float(vp), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(gh), np.asarray(gp), rtol=1e-5, atol=1e-7
        )


@pytest.mark.slow
class TestDeviceLBFGS:
    def test_device_lbfgs_matches_scipy_fit(self):
        """optimizer='device' (one-dispatch on-device L-BFGS) reaches
        the same optimum as the host scipy loop on a penalized smooth
        model, including the Laplace inner solve and write-back."""
        import numpy as np
        from smoothsde_tpu import SDE

        rng = np.random.default_rng(17)
        n = 600
        dt = 0.5
        x = rng.uniform(0, 1, n)
        sig = np.exp(0.3 * np.sin(2 * np.pi * x[:-1]))
        z = np.concatenate(
            [[0.0], np.cumsum(0.1 * dt + sig * np.sqrt(dt)
                              * rng.normal(size=n - 1))]
        )
        data = {"ID": np.zeros(n, int), "time": np.arange(n) * dt,
                "z": z, "x": x}

        def make():
            return SDE(
                data=data, type="BM", response="z",
                formulas={"mu": "~1", "sigma": "~s(x, k=5, bs='cs')"},
                par0=[0.0, 1.0],
            )

        m_host = make()
        r_host = m_host.fit()
        m_dev = make()
        r_dev = m_dev.fit(optimizer="device")
        assert r_dev.convergence == 0
        assert abs(r_dev.value - r_host.value) < 1e-3 * (
            1.0 + abs(r_host.value)
        )
        grid = {"ID": np.zeros(15, int), "time": np.zeros(15),
                "z": np.zeros(15), "x": np.linspace(0.1, 0.9, 15)}
        p_h = m_host.par(new_data=grid)[:, 1]
        p_d = m_dev.par(new_data=grid)[:, 1]
        np.testing.assert_allclose(p_d, p_h, rtol=0.02)

    def test_device_lbfgs_quadratic_exact(self):
        """Sanity: on a pure quadratic the device L-BFGS reaches the
        known minimum."""
        import jax.numpy as jnp
        from smoothsde_tpu.infer.lbfgs import device_lbfgs

        A = jnp.asarray(
            np.cov(np.random.default_rng(0).normal(size=(6, 40)))
        ) + 6 * jnp.eye(6)
        xstar = jnp.arange(6.0)

        def marg(x, b):
            d = x - xstar
            return 0.5 * d @ (A @ d), b

        r = device_lbfgs(marg, jnp.zeros(6), jnp.zeros(0), maxiter=100)
        assert bool(r.converged)
        np.testing.assert_allclose(np.asarray(r.x), np.asarray(xstar),
                                   atol=1e-3)


class TestWideREGatherObjective:
    def test_gather_objective_matches_dense(self):
        """Wide s(ID, bs='re') blocks route the linear predictor
        through gathers instead of a dense matvec; the objective must
        be numerically identical to the dense path."""
        rng = np.random.default_rng(11)
        n_id, n_per = 40, 12
        n = n_id * n_per
        ids = np.repeat(np.arange(n_id), n_per)
        times = np.tile(np.arange(n_per, dtype=float) * 0.5, n_id)
        obs = rng.normal(size=n).cumsum() * 0.1

        def make_bundle(force_dense):
            design = build_design(
                {"mu": "~s(ID, bs='re')", "sigma": "~1"},
                {"ID": ids, "time": times, "z": obs},
            )
            if force_dense:
                design.re_gather_plans = (
                    lambda min_cols=16: [None, None]
                )
            spec = get_model_spec("BM", 1)
            return build_objective(
                spec, design, obs[:, None], times, ids,
                kalman_impl="sequential",
            )

        b_g = make_bundle(False)
        b_d = make_bundle(True)
        pk = b_g.packer
        outer = rng.normal(size=pk.n_outer) * 0.1
        inner = rng.normal(size=pk.n_inner) * 0.5
        full = pk.unpack(jnp.asarray(outer), jnp.asarray(inner))
        v_g = float(b_g.joint_nllk(full))
        v_d = float(b_d.joint_nllk(full))
        assert np.isclose(v_g, v_d, rtol=1e-12, atol=1e-10)

        def flat_nllk(bundle):
            return lambda th: bundle.joint_nllk(
                bundle.packer.unpack(th[: pk.n_outer], th[pk.n_outer :])
            )

        th = jnp.asarray(np.concatenate([outer, inner]))
        g_g = jax.grad(flat_nllk(b_g))(th)
        g_d = jax.grad(flat_nllk(b_d))(th)
        np.testing.assert_allclose(
            np.asarray(g_g), np.asarray(g_d), rtol=1e-9, atol=1e-10
        )
