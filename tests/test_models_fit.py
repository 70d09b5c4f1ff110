"""End-to-end simulation-recovery fits for every model family
(driver.R-style, SURVEY.md section 4): BM_t, CIR, CTCRW, BM_SSM,
OU_SSM, ESEAL_SSM. Closed-form BM/OU are covered in test_sde_api."""

import numpy as np
import pytest

from smoothsde_tpu import SDE

pytestmark = pytest.mark.slow  # every test here runs a full fit


class TestBMt:
    def test_fit_recovers_scale(self):
        rng = np.random.default_rng(0)
        n = 1500
        dt = 0.5
        df = 5.0
        mu_t, sigma_t = 0.4, 1.2
        scale = sigma_t / np.sqrt(df / (df - 2.0))
        incr = mu_t * dt + scale * np.sqrt(dt) * rng.standard_t(df, size=n - 1)
        z = np.concatenate([[0.0], np.cumsum(incr)])
        data = {"ID": np.zeros(n, int), "time": np.arange(n) * dt, "z": z}
        sde = SDE(
            data=data, type="BM_t", response="z", par0=[0.0, 1.0],
            other_data={"df": df},
        )
        res = sde.fit()
        assert res.convergence == 0
        assert res.convergence_via in ("optimizer", "gtol"), (
            res.convergence_via
        )
        est = sde.par(t=0)[0]
        assert abs(est[0] - mu_t) < 0.2
        assert abs(est[1] - sigma_t) / sigma_t < 0.2
        # residuals path for BM_t
        r = sde.residuals()
        assert np.isfinite(r[np.isfinite(r)]).all()


class TestCIR:
    def test_fit_recovers_parameters(self):
        rng = np.random.default_rng(1)
        n = 1200
        dt = 0.25
        mu_t, beta_t, sigma_t = 2.0, 0.8, 0.5
        x = np.empty(n)
        x[0] = mu_t
        for i in range(1, n):
            c = 2 * beta_t / ((1 - np.exp(-beta_t * dt)) * sigma_t**2)
            dfree = 4 * beta_t * mu_t / sigma_t**2
            ncp = 2 * c * x[i - 1] * np.exp(-beta_t * dt)
            x[i] = rng.noncentral_chisquare(dfree, ncp) / (2 * c)
        data = {"ID": np.zeros(n, int), "time": np.arange(n) * dt, "z": x}
        sde = SDE(
            data=data, type="CIR", response="z", par0=[1.5, 1.0, 0.7]
        )
        res = sde.fit()
        assert res.convergence == 0
        assert res.convergence_via in ("optimizer", "gtol"), (
            res.convergence_via
        )
        est = sde.par(t=0)[0]
        assert abs(est[0] - mu_t) / mu_t < 0.2
        assert abs(est[1] - beta_t) / beta_t < 0.35
        assert abs(est[2] - sigma_t) / sigma_t < 0.2
        sde.stationary()


class TestCTCRW:
    def test_fit_2d_gps_track(self):
        rng = np.random.default_rng(2)
        n = 1200
        dt = 0.5
        tau_t, nu_t, sobs_t = 3.0, 1.0, 0.15
        beta = 1.0 / tau_t
        sigma = 2.0 * nu_t / np.sqrt(np.pi * tau_t)
        v = np.zeros(2)
        z = np.zeros(2)
        obs = np.empty((n, 2))
        obs[0] = z
        for i in range(1, n):
            e = np.exp(-beta * dt)
            # exact joint (V, Z) draw
            from smoothsde_tpu.utils.misc import ctcrw_cov

            V = ctcrw_cov(beta, sigma, dt)
            for d in range(2):
                mean_v = e * v[d]
                mean_z = z[d] + v[d] / beta * (1 - e)
                draw = rng.multivariate_normal([mean_v, mean_z], V)
                v[d], z[d] = draw
            obs[i] = z + rng.normal(size=2) * sobs_t
        data = {
            "ID": np.zeros(n, int), "time": np.arange(n) * dt,
            "y1": obs[:, 0], "y2": obs[:, 1],
        }
        sde = SDE(
            data=data, type="CTCRW", response=["y1", "y2"],
            par0=[0.0, 0.0, 2.0, 0.8],
        )
        res = sde.fit()
        assert res.convergence == 0
        assert res.convergence_via in ("optimizer", "gtol"), (
            res.convergence_via
        )
        est = sde.par(t=0)[0]
        assert abs(est[2] - tau_t) / tau_t < 0.35
        assert abs(est[3] - nu_t) / nu_t < 0.25
        sobs_hat = np.exp(
            res.par[res.par_names.index("log_sigma_obs")]
        )
        assert abs(sobs_hat - sobs_t) / sobs_t < 0.35

    def test_sqrt_impl_matches_default_objective(self):
        """kalman_impl='sqrt' (Cholesky-form filter) evaluates the same
        joint nllk and gradient as the moment-form paths."""
        import jax
        import jax.numpy as jnp

        rng = np.random.default_rng(5)
        n = 400
        data = {
            "ID": np.repeat([0, 1], n // 2),
            "time": np.tile(np.arange(n // 2) * 0.4, 2),
            "y1": np.cumsum(rng.normal(size=n) * 0.3),
            "y2": np.cumsum(rng.normal(size=n) * 0.3),
        }
        vals = {}
        grads = {}
        for impl in ("sequential", "sqrt"):
            sde = SDE(
                data=data, type="CTCRW", response=["y1", "y2"],
                par0=[0.0, 0.0, 1.5, 1.0],
            )
            b = sde.setup(kalman_impl=impl)
            outer0 = jnp.asarray(b.packer.outer_init())

            def nll(o, b=b):
                return b.joint_nllk(b.packer.unpack(o))

            v, g = jax.value_and_grad(nll)(outer0)
            vals[impl] = float(v)
            grads[impl] = np.asarray(g)
        assert vals["sqrt"] == pytest.approx(vals["sequential"], rel=1e-8)
        np.testing.assert_allclose(
            grads["sqrt"], grads["sequential"], rtol=1e-6, atol=1e-8
        )

    @pytest.mark.parametrize("type,par0", [
        ("BM_SSM", [0.0, 1.0]),
        ("OU_SSM", [0.0, 1.0, 0.5]),
    ])
    def test_sqrt_impl_matches_default_scalar_ssm(self, type, par0):
        """kalman_impl='sqrt' covers the scalar-state SSMs too
        (round 3: completes the sqrt option for the whole family)."""
        import jax
        import jax.numpy as jnp

        rng = np.random.default_rng(6)
        n = 300
        data = {
            "ID": np.repeat([0, 1], n // 2),
            "time": np.tile(np.arange(n // 2) * 0.4, 2),
            "z": np.cumsum(rng.normal(size=n) * 0.5),
        }
        vals, grads = {}, {}
        for impl in ("sequential", "sqrt"):
            sde = SDE(data=data, type=type, response="z", par0=par0)
            b = sde.setup(kalman_impl=impl)
            outer0 = jnp.asarray(b.packer.outer_init())

            def nll(o, b=b):
                return b.joint_nllk(b.packer.unpack(o))

            v, g = jax.value_and_grad(nll)(outer0)
            vals[impl] = float(v)
            grads[impl] = np.asarray(g)
        assert vals["sqrt"] == pytest.approx(vals["sequential"], rel=1e-8)
        np.testing.assert_allclose(
            grads["sqrt"], grads["sequential"], rtol=1e-6, atol=1e-8
        )


class TestSSM:
    def test_bm_ssm_fit(self):
        rng = np.random.default_rng(3)
        n = 1000
        dt = 0.5
        mu_t, sigma_t, sobs_t = 0.3, 0.8, 0.4
        lat = np.concatenate(
            [[0.0], np.cumsum(mu_t * dt + sigma_t * np.sqrt(dt) * rng.normal(size=n - 1))]
        )
        z = lat + rng.normal(size=n) * sobs_t
        data = {"ID": np.zeros(n, int), "time": np.arange(n) * dt, "z": z}
        sde = SDE(data=data, type="BM_SSM", response="z", par0=[0.0, 1.0])
        res = sde.fit()
        assert res.convergence == 0
        assert res.convergence_via in ("optimizer", "gtol"), (
            res.convergence_via
        )
        est = sde.par(t=0)[0]
        assert abs(est[0] - mu_t) < 0.3
        assert abs(est[1] - sigma_t) / sigma_t < 0.3

        # SSM residuals: whitened innovations are ~iid N(0, 1) at the
        # fitted model (beyond-reference diagnostic; reference raises
        # for SSM types, R/sde.R:1221)
        r = sde.residuals()
        r_ok = r[np.isfinite(r)]
        assert r_ok.size >= n - 5
        assert abs(r_ok.mean()) < 0.1
        assert abs(r_ok.std() - 1.0) < 0.1

        # SSM simulation: latent + measurement noise reproduces the
        # increment-variance structure Var(dy) = sigma^2 dt + 2 sobs^2
        sim = sde.simulate(rng=np.random.default_rng(5))
        dy = np.diff(np.asarray(sim["z"]))
        target = est[1] ** 2 * dt + 2.0 * float(
            np.exp(res.par[res.par_names.index("log_sigma_obs")])
        ) ** 2
        assert abs(dy.var() / target - 1.0) < 0.2

    def test_ou_ssm_fit_and_filtered_states(self):
        rng = np.random.default_rng(4)
        n = 1500
        dt = 0.4
        mu_t, tau_t, kappa_t, sobs_t = 1.0, 2.0, 0.6, 0.3
        x = np.empty(n)
        x[0] = mu_t
        for i in range(1, n):
            e = np.exp(-dt / tau_t)
            x[i] = mu_t + e * (x[i - 1] - mu_t) + rng.normal() * np.sqrt(
                kappa_t * (1 - e * e)
            )
        z = x + rng.normal(size=n) * sobs_t
        data = {"ID": np.zeros(n, int), "time": np.arange(n) * dt, "z": z}
        sde = SDE(
            data=data, type="OU_SSM", response="z", par0=[0.5, 1.0, 1.0]
        )
        res = sde.fit()
        assert res.convergence == 0
        assert res.convergence_via in ("optimizer", "gtol"), (
            res.convergence_via
        )
        est = sde.par(t=0)[0]
        assert abs(est[0] - mu_t) < 0.3
        # filtered states track the latent process (REPORT(aest_all))
        bundle = sde.bundle()
        full = bundle.packer.unpack(res.par, res.bhat)
        states = np.asarray(bundle.filter_states(full))
        assert states.shape == (n, 1)
        assert np.corrcoef(states[50:, 0], x[50:])[0, 1] > 0.9

    def test_user_H_fixes_sigma_obs(self):
        """other_data['H'] pins the measurement covariance and removes
        log_sigma_obs from the estimated parameters (R/sde.R:563-568)."""
        rng = np.random.default_rng(5)
        n = 400
        dt = 0.5
        lat = np.cumsum(rng.normal(size=n)) * 0.5
        z = lat + rng.normal(size=n) * 0.2
        H = np.broadcast_to(np.eye(1) * 0.04, (n, 1, 1))
        data = {"ID": np.zeros(n, int), "time": np.arange(n) * dt, "z": z}
        sde = SDE(
            data=data, type="BM_SSM", response="z", par0=[0.0, 0.5],
            other_data={"H": H},
        )
        res = sde.fit()
        assert "log_sigma_obs" not in res.par_names
        assert res.convergence == 0
        assert res.convergence_via in ("optimizer", "gtol"), (
            res.convergence_via
        )


def _eseal_sim(seed=6, n=400, mu_t=0.05, sigma_t=0.12, a1_t=-0.578,
               a2_t=1.214, tau_t=0.08):
    """Exact simulation of the ESEAL_SSM generative model
    (nllk_e_seal_ssm.hpp:11-59): state x = (intercept=1, lipid mass L),
    L_{i+1} = L_i + mu*dt + sigma*sqrt(dt)*eps,
    z_i = a1 + (a2/R_i) L_i + (tau/sqrt(h_i)) nu."""
    rng = np.random.default_rng(seed)
    dt = 1.0
    times = np.arange(n) * dt
    L = np.empty(n)
    L[0] = 60.0
    for i in range(1, n):
        L[i] = L[i - 1] + mu_t * dt + sigma_t * np.sqrt(dt) * rng.normal()
    # Scales chosen so the latent process is visible against the
    # measurement noise: obs loading a2/R ~ 0.12, per-step process sd
    # in observation units ~ 0.014 vs measurement sd tau/sqrt(h) = 0.008.
    R = np.full(n, 10.0)
    h = np.full(n, 100.0)
    z = a1_t + a2_t * L / R + rng.normal(size=n) * tau_t / np.sqrt(h)
    data = {"ID": np.zeros(n, int), "time": times, "z": z}
    other = {"h": h, "R": R, "dep_fat": np.full(n, L[0])}
    return data, other


class TestESEAL:
    def test_recovery(self):
        """Simulation-recovery for the free parameters (mu, sigma, tau):
        the observation-equation parameters (a1, a2) are weakly
        identified from one track, so they are pinned to truth via map,
        mirroring common usage of the reference model."""
        data, other = _eseal_sim()
        mu_t, sigma_t, tau_t = 0.05, 0.12, 0.08
        # priors=None: the reference's Schick et al. priors carry a
        # pseudo-count of 10n and pin sigma^2 near 4 regardless of the
        # data — pure ML is the recovery oracle here.
        sde = SDE(data=data, type="ESEAL_SSM", response="z",
                  other_data={**other, "priors": None}, par0=[0.0, 0.3])
        res = sde.fit(map={"a1": [True], "log_a2": [True]},
                      compute_sdreport=False)
        assert res.convergence == 0
        assert res.convergence_via in ("optimizer", "gtol"), (
            res.convergence_via
        )
        est = dict(zip(res.par_names, np.asarray(res.par)))
        pm = sde.par(t=0)[0]
        mu_hat, sigma_hat = pm[0], pm[1]
        tau_hat = float(np.exp(est["log_tau"]))
        assert abs(mu_hat - mu_t) < 0.03, mu_hat
        assert abs(sigma_hat - sigma_t) < 0.06, sigma_hat
        assert abs(tau_hat - tau_t) < 0.04, tau_hat

    def test_ig_prior_matches_closed_form(self):
        """The prior contribution equals the inverse-gamma log-pdfs of
        nllk_e_seal_ssm.hpp:68-78, 215-216 (scipy oracle)."""
        from scipy import stats

        data, other = _eseal_sim(n=120)
        n = 120
        sde_p = SDE(data=data, type="ESEAL_SSM", response="z",
                    other_data=dict(other), par0=[0.0, 0.3])
        sde_n = SDE(data=data, type="ESEAL_SSM", response="z",
                    other_data={**other, "priors": None}, par0=[0.0, 0.3])
        b_p, b_n = sde_p.setup(), sde_n.setup()
        pk = b_p.packer
        full = pk.unpack(pk.outer_init(), pk.inner_init())
        v_with = float(b_p.joint_nllk(full))
        v_without = float(b_n.joint_nllk(full))

        sigma0 = 0.3  # par0 is response-scale; sigma intercept = log 0.3
        tau = float(np.exp(full["log_tau"][0]))
        lp = stats.invgamma.logpdf(
            sigma0**2, 10.0 * n, scale=4.0 * (10.0 * n - 1.0)
        ) + stats.invgamma.logpdf(tau**2, n / 2.0, scale=n / 2.0 - 1.0)
        # nllk difference = -(prior log-density)
        assert np.isclose(v_with - v_without, -lp, rtol=1e-5), (
            v_with - v_without, -lp,
        )

    def test_user_priors(self):
        from scipy import stats

        data, other = _eseal_sim(n=120)
        custom = {"sigma2": (3.0, 0.5)}
        sde_c = SDE(data=data, type="ESEAL_SSM", response="z",
                    other_data={**other, "priors": custom}, par0=[0.0, 0.3])
        sde_n = SDE(data=data, type="ESEAL_SSM", response="z",
                    other_data={**other, "priors": None}, par0=[0.0, 0.3])
        b_c, b_n = sde_c.setup(), sde_n.setup()
        pk = b_c.packer
        full = pk.unpack(pk.outer_init(), pk.inner_init())
        diff = float(b_c.joint_nllk(full)) - float(b_n.joint_nllk(full))
        lp = stats.invgamma.logpdf(0.3**2, 3.0, scale=0.5)
        assert np.isclose(diff, -lp, rtol=1e-5)

        import pytest as _pytest
        with _pytest.raises(ValueError):
            SDE(data=data, type="ESEAL_SSM", response="z",
                other_data={**other, "priors": "bogus"},
                par0=[0.0, 0.3]).setup()


class TestDecaySplines:
    def test_decay_model_fits(self):
        """Decaying-response spline (component 17): selected X_re columns
        multiplied by exp(-rho * t_decay) with estimated rate."""
        rng = np.random.default_rng(7)
        n = 800
        dt = 0.25
        times = np.arange(n) * dt
        x1 = np.linspace(0, 1, n)
        # truth: mu response decays over time
        effect = 0.8 * np.sin(2 * np.pi * x1) * np.exp(-0.05 * times)
        z = np.concatenate(
            [[0.0], np.cumsum(effect[:-1] * dt + 0.3 * np.sqrt(dt) * rng.normal(size=n - 1))]
        )
        data = {"ID": np.zeros(n, int), "time": times, "z": z, "x1": x1}
        t_decay = np.tile(times, 2)  # (n_par = 2) x n stacked
        sde = SDE(
            formulas={"mu": "~s(x1, k=5, bs='ts')", "sigma": "~1"},
            data=data, type="BM", response="z",
            other_data={
                "t_decay": t_decay,
                "decay_term": "mu.s(x1)",
                "ind_decay": [1, 1, 1, 1],
            },
        )
        assert len(sde.other_data()["col_decay"]) == 4
        res = sde.fit()
        assert res.convergence == 0
        assert res.convergence_via in ("optimizer", "gtol"), (
            res.convergence_via
        )
        assert "log_decay" in res.par_names
        rho = sde.rho()
        assert rho.shape == (1,)
        assert np.isfinite(rho[0])


class TestSmoothedStatesAPI:
    def test_ctcrw_smoothed_states(self):
        rng = np.random.default_rng(8)
        n = 400
        dt = 0.5
        tau_t, nu_t = 3.0, 1.0
        beta = 1.0 / tau_t
        sigma = 2.0 * nu_t / np.sqrt(np.pi * tau_t)
        from smoothsde_tpu.utils.misc import ctcrw_cov

        v, z = 0.0, 0.0
        lat = np.empty(n)
        obs = np.empty(n)
        lat[0] = obs[0] = 0.0
        for i in range(1, n):
            e = np.exp(-beta * dt)
            V = ctcrw_cov(beta, sigma, dt)
            mv, mz = e * v, z + v / beta * (1 - e)
            v, z = rng.multivariate_normal([mv, mz], V)
            lat[i] = z
            obs[i] = z + rng.normal() * 0.3
        data = {"ID": np.zeros(n, int), "time": np.arange(n) * dt, "y": obs}
        sde = SDE(data=data, type="CTCRW", response="y",
                  par0=[0.0, tau_t, nu_t])
        sde.fit()
        means, covs = sde.smoothed_states()
        assert means.shape == (1, n, 2)
        assert covs.shape == (1, n, 2, 2)
        # smoothed positions should track the latent path better than
        # the raw noisy observations
        err_smooth = np.mean((means[0, 10:, 0] - lat[10:]) ** 2)
        err_obs = np.mean((obs[10:] - lat[10:]) ** 2)
        assert err_smooth < err_obs * 0.8
        assert np.all(covs[0, 10:, 0, 0] > 0)


class TestTensorSmoothFit:
    def test_bm_te_fit_recovers_anisotropic_surface(self):
        """BM with sigma = te(x, z): the true surface depends on x only;
        the fit must recover it and shrink the z margin (its lambda
        larger). Exercises the multi-penalty group path (one lambda per
        margin over shared coefficients) end to end — a capability the
        reference's one-lambda-per-block TMB penalty cannot express."""
        rng = np.random.default_rng(21)
        n = 800
        dt = 0.5
        x = rng.uniform(0, 1, n)
        zc = rng.uniform(0, 1, n)
        sig = np.exp(0.4 * np.sin(2 * np.pi * x[:-1]))
        incr = sig * np.sqrt(dt) * rng.normal(size=n - 1)
        path = np.concatenate([[0.0], np.cumsum(incr)])
        data = {
            "ID": np.zeros(n, int), "time": np.arange(n) * dt,
            "z": path, "x": x, "zc": zc,
        }
        sde = SDE(
            data=data, type="BM", response="z",
            formulas={"mu": "~1", "sigma": "~te(x, zc, k=4, bs='cs')"},
            par0=[0.0, 1.0],
        )
        res = sde.fit()
        assert res.convergence == 0
        assert res.convergence_via in ("optimizer", "gtol"), (
            res.convergence_via
        )
        assert len(sde.lambda_()) == 2
        # fitted surface vs truth along x at fixed zc
        grid = {
            "ID": np.zeros(40, int), "time": np.linspace(0, 100, 40),
            "x": np.linspace(0.05, 0.95, 40), "zc": np.full(40, 0.5),
            "z": np.zeros(40),
        }
        est = sde.par(new_data=grid)[:, 1]
        truth = np.exp(0.4 * np.sin(2 * np.pi * grid["x"]))
        assert np.max(np.abs(est - truth) / truth) < 0.35
        # flat along zc
        grid2 = dict(grid)
        grid2["x"] = np.full(40, 0.3)
        grid2["zc"] = np.linspace(0.05, 0.95, 40)
        est2 = sde.par(new_data=grid2)[:, 1]
        assert est2.std() / est2.mean() < 0.15


class TestCTCRWPlateauRobustness:
    def test_smooth_ctcrw_avoids_tau_plateau(self):
        """Regression: with smooths on BOTH tau and nu and small true
        measurement noise, the log_sigma_obs = 0 start produced an
        enormous first gradient; scipy BFGS's unscaled first leap
        landed on the flat tau -> infinity plateau and reported
        spurious success (tau ~ 1700, nllk -73 instead of -357 on the
        original instance). The data-driven sigma_obs default must
        reach the true optimum instead."""
        from smoothsde_tpu.utils.misc import ctcrw_cov

        rng = np.random.default_rng(7)
        n = 600
        times = np.cumsum(rng.uniform(0.3, 1.2, size=n))
        temp = 20 + 8 * np.sin(2 * np.pi * times / (times[-1] / 3)) \
            + rng.normal(size=n)
        tau_true = np.exp(1.0 + 0.03 * (temp - 20))
        nu_true = np.exp(0.5 - 0.04 * (temp - 20))
        v = np.zeros(2); z = np.zeros(2)
        obs = np.empty((n, 2)); obs[0] = z
        for i in range(1, n):
            dt = times[i] - times[i - 1]
            beta = 1.0 / tau_true[i - 1]
            sigma = 2.0 * nu_true[i - 1] / np.sqrt(np.pi * tau_true[i - 1])
            e = np.exp(-beta * dt)
            V = ctcrw_cov(beta, sigma, dt)
            for d in range(2):
                v[d], z[d] = rng.multivariate_normal(
                    [e * v[d], z[d] + v[d] / beta * (1 - e)], V
                )
            obs[i] = z + rng.normal(size=2) * 0.1
        data = {"ID": np.zeros(n, int), "time": times,
                "x": obs[:, 0], "y": obs[:, 1], "temp": temp}
        sde = SDE(
            formulas={"mu1": "~1", "mu2": "~1",
                      "tau": "~s(temp, k=6, bs='cs')",
                      "nu": "~s(temp, k=6, bs='cs')"},
            data=data, type="CTCRW", response=["x", "y"],
            par0=[0.0, 0.0, 2.0, 1.5],
        )
        res = sde.fit(compute_sdreport=False)
        assert res.convergence == 0
        assert res.convergence_via in ("optimizer", "gtol"), (
            res.convergence_via
        )
        est = sde.par(t=0)[0]
        # the plateau failure mode gives tau in the thousands
        assert est[2] < 30.0, est
        assert abs(np.log(est[3]) - np.log(nu_true[0])) < 0.5
        sobs_hat = float(np.exp(
            res.par[res.par_names.index("log_sigma_obs")]
        ))
        assert 0.03 < sobs_hat < 0.3
