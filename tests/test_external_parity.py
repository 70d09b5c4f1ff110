"""External parity fixtures: the reference's TMB objective recomputed
from scratch (VERDICT r4 missing #1 / next-round item 5).

R/mgcv/TMB are not installed in this image, so direct output diffing is
environment-blocked. These tests close the gap from the other side: the
penalized negative log-likelihood of the reference
(src/nllk/nllk_sde.hpp:16-127 + src/nllk/tr_dens.hpp:32-37) is pure
arithmetic, re-implemented HERE in plain numpy with no calls into
smoothsde_tpu's objective/penalty/density code, and evaluated at fixed
coefficients on tiny datasets. `bundle.joint_nllk` must reproduce it to
f64 roundoff:

    llk  = sum_{i>=1, ID_i==ID_{i-1}} sum_dims dnorm(
               y_i; y_{i-1} + mu_{i-1} dt, exp(ls_{i-1}) sqrt(dt))
           (NA endpoints drop that dimension's contribution)
    nllk = -llk + sum_smooths [ 0.5 Sn log(2 pi) - 0.5 logdet(S)
                                - 0.5 Sn loglam + 0.5 exp(loglam) c'Sc ]

For the `re` basis the design/penalty matrices themselves are also
externally pinned (one-hot indicators, identity penalty — the mgcv
`re` construction is unambiguous). The spline bases (cs/ts/...) have
independent sympy/scipy oracles in tests/test_basis_oracles.py; here
they enter as shared inputs while the objective arithmetic is what is
being cross-checked.
"""

import numpy as np
import pytest

from smoothsde_tpu import SDE


def _ref_bm_nllk(y, times, ids, mu, log_sigma, smooth_blocks):
    """nllk_sde.hpp:77-124 + tr_dens.hpp:32-37 ("BM" branch), numpy.

    y: (n,) or (n, d) observations (NaN = missing); mu, log_sigma:
    (n,) working-scale linear predictors (used at the LEFT endpoint of
    each transition, par_mat.row(i-1)); smooth_blocks: list of
    (S_block, coeff_block, log_lambda) per smooth.
    """
    y = np.atleast_2d(np.asarray(y, float).T).T  # (n, d)
    n, d = y.shape
    llk = 0.0
    for i in range(1, n):
        if ids[i - 1] != ids[i]:
            continue  # first observation of a track contributes nothing
        dt = times[i] - times[i - 1]
        sd = np.exp(log_sigma[i - 1]) * np.sqrt(dt)
        for j in range(d):
            if np.isnan(y[i - 1, j]) or np.isnan(y[i, j]):
                continue
            mean = y[i - 1, j] + mu[i - 1] * dt
            llk += (
                -0.5 * np.log(2 * np.pi) - np.log(sd)
                - 0.5 * ((y[i, j] - mean) / sd) ** 2
            )
    nllk = -llk
    for S, c, loglam in smooth_blocks:
        Sn = S.shape[0]
        sign, logdet = np.linalg.slogdet(S)
        assert sign > 0, "penalty blocks must be PD (shrinkage/re bases)"
        nllk += (
            0.5 * Sn * np.log(2 * np.pi)
            - 0.5 * logdet
            - 0.5 * Sn * loglam
            + 0.5 * np.exp(loglam) * float(c @ S @ c)
        )
    return nllk


def _tiny_dataset(n=24, n_tracks=2, with_na=True, seed=11):
    rng = np.random.default_rng(seed)
    times = np.cumsum(rng.uniform(0.4, 0.8, n))
    ids = np.sort(np.arange(n) % n_tracks)
    y = np.cumsum(rng.normal(size=n) * 0.7)
    if with_na:
        y = y.copy()
        y[n // 2] = np.nan  # one missing response row
    x = rng.uniform(0, 1, n)
    g = np.array(["a", "b", "c"])[np.arange(n) % 3]
    return {"ID": ids, "time": times, "x": x, "g": g, "y": y}


def _eval_point(sde):
    """A deterministic non-trivial parameter point and the blocks the
    objective actually used at it (read back from the packer so no
    packing-order knowledge is baked into the test)."""
    bundle = sde.setup()
    pk = bundle.packer
    outer = np.asarray(pk.outer_init(), float)
    outer = outer + 0.1 * (1.0 + np.arange(len(outer))) / len(outer)
    inner = np.asarray(pk.inner_init(), float)
    inner = inner + 0.05 * np.sin(1.0 + np.arange(max(len(inner), 1)))[
        : len(inner)
    ]
    import jax.numpy as jnp

    full = pk.unpack(jnp.asarray(outer), jnp.asarray(inner))
    return bundle, {k: np.asarray(v, float) for k, v in full.items()}


def test_bm_re_smooth_matches_reference_arithmetic():
    """BM with a random-effect smooth on a 3-level factor: X_re/S are
    hand-pinned (one-hot, identity) and the penalized nllk matches the
    from-scratch TMB arithmetic."""
    data = _tiny_dataset()
    sde = SDE(
        formulas={"mu": "~s(g, bs='re')", "sigma": "~1"},
        data=data, type="BM", response="y", par0=[0.0, 1.0],
    )

    mats = sde.make_mat()
    X_fe = np.asarray(mats["X_fe"], float)
    X_re = np.asarray(mats["X_re"], float)
    S = np.asarray(mats["S"], float)
    n = len(data["y"])

    # ---- externally pinned matrices (mgcv re construction) ----
    # X_fe: block-diag intercepts for (mu, sigma); X_re: mu's one-hot
    # factor indicators, zero rows in the sigma block; S = I_3.
    expect_fe = np.zeros((2 * n, 2))
    expect_fe[:n, 0] = 1.0
    expect_fe[n:, 1] = 1.0
    np.testing.assert_array_equal(X_fe, expect_fe)
    onehot = (data["g"][:, None] == np.array(["a", "b", "c"])).astype(float)
    expect_re = np.zeros((2 * n, 3))
    expect_re[:n] = onehot
    np.testing.assert_array_equal(X_re, expect_re)
    np.testing.assert_array_equal(S, np.eye(3))

    bundle, full = _eval_point(sde)
    got = float(bundle.joint_nllk(full))

    c_fe, c_re = full["coeff_fe"], full["coeff_re"]
    loglam = float(np.asarray(full["log_lambda"]).ravel()[0])
    par_vec = X_fe @ c_fe + X_re @ c_re
    mu, log_sigma = par_vec[:n], par_vec[n:]
    want = _ref_bm_nllk(
        data["y"], data["time"], data["ID"], mu, log_sigma,
        [(np.eye(3), c_re, loglam)],
    )
    assert abs(got - want) < 1e-9 * (1.0 + abs(want)), (got, want)


def test_bm_cs_spline_matches_reference_arithmetic():
    """BM with mu ~ s(x, k=5, bs='cs'): the penalized nllk recomputed
    from the emitted design/penalty matrices with the from-scratch TMB
    arithmetic (matrix construction itself is oracle-pinned in
    tests/test_basis_oracles.py)."""
    data = _tiny_dataset(n=30, with_na=True, seed=7)
    sde = SDE(
        formulas={"mu": "~s(x, k=5, bs='cs')", "sigma": "~1"},
        data=data, type="BM", response="y", par0=[0.0, 1.0],
    )
    mats = sde.make_mat()
    X_fe = np.asarray(mats["X_fe"], float)
    X_re = np.asarray(mats["X_re"], float)
    S = np.asarray(mats["S"], float)
    n = len(data["y"])
    assert X_fe.shape == (2 * n, 2)
    assert X_re.shape == (2 * n, 4)  # k-1 columns after centering
    assert S.shape == (4, 4)

    bundle, full = _eval_point(sde)
    got = float(bundle.joint_nllk(full))

    c_fe, c_re = full["coeff_fe"], full["coeff_re"]
    loglam = float(np.asarray(full["log_lambda"]).ravel()[0])
    par_vec = X_fe @ c_fe + X_re @ c_re
    mu, log_sigma = par_vec[:n], par_vec[n:]
    want = _ref_bm_nllk(
        data["y"], data["time"], data["ID"], mu, log_sigma,
        [(S, c_re, loglam)],
    )
    assert abs(got - want) < 1e-9 * (1.0 + abs(want)), (got, want)


def test_ou_matches_reference_arithmetic():
    """OU transition branch (tr_dens.hpp:46-52): mean/sd recomputed in
    numpy at the left-endpoint parameters."""
    data = _tiny_dataset(n=20, with_na=False, seed=3)
    sde = SDE(
        formulas={"mu": "~1", "tau": "~1", "kappa": "~1"},
        data=data, type="OU", response="y", par0=[0.0, 1.0, 0.5],
    )
    bundle, full = _eval_point(sde)
    got = float(bundle.joint_nllk(full))

    mats = sde.make_mat()
    X_fe = np.asarray(mats["X_fe"], float)
    par_vec = X_fe @ full["coeff_fe"]
    n = len(data["y"])
    mu, ltau, lkap = par_vec[:n], par_vec[n:2 * n], par_vec[2 * n:]
    y, times, ids = data["y"], data["time"], data["ID"]
    llk = 0.0
    for i in range(1, n):
        if ids[i - 1] != ids[i]:
            continue
        dt = times[i] - times[i - 1]
        tau, kap = np.exp(ltau[i - 1]), np.exp(lkap[i - 1])
        mean = mu[i - 1] + np.exp(-dt / tau) * (y[i - 1] - mu[i - 1])
        sd = np.sqrt(kap * (1.0 - np.exp(-2.0 * dt / tau)))
        llk += (
            -0.5 * np.log(2 * np.pi) - np.log(sd)
            - 0.5 * ((y[i] - mean) / sd) ** 2
        )
    want = -llk
    assert abs(got - want) < 1e-9 * (1.0 + abs(want)), (got, want)


def _ref_ctcrw_nllk(obs, times, ids, mu, tau, nu, sigma_obs, P0):
    """nllk_ctcrw.hpp:103-254 recomputed in numpy, mirroring the
    reference recursion exactly: Durbin-Koopman form (the innovation at
    row i uses the state advanced at the END of iteration i-1),
    dtimes(i) = times(i+1) - times(i) (nllk_ctcrw.hpp:126-129), track
    starts re-initialize aest = (x_1, 0, ...) / Pest = P0 with no
    propagation into the first update (195-200), NaN rows predict only
    (214-217), detF <= 0 guard (226-229), and NO 2*pi constant in the
    update term (230-234). mu: (n, n_dim); tau/nu: (n,) natural scale."""
    n, n_dim = obs.shape
    s = 2 * n_dim
    dtimes = np.concatenate([np.diff(times), [1.0]])
    beta = 1.0 / tau
    sigma = 2.0 * nu / np.sqrt(np.pi * tau)
    Z = np.zeros((n_dim, s))
    for d in range(n_dim):
        Z[d, 2 * d] = 1.0
    H = sigma_obs**2 * np.eye(n_dim)

    def a0_row(i):
        a = np.zeros(s)
        for d in range(n_dim):
            a[2 * d] = obs[i, d]
        return a

    def mk(b_, s_, dt_):
        e = np.exp(-b_ * dt_)
        e2 = np.exp(-2 * b_ * dt_)
        T = np.zeros((s, s))
        Q = np.zeros((s, s))
        B = np.zeros((s, n_dim))
        for d in range(n_dim):
            T[2 * d, 2 * d] = 1
            T[2 * d, 2 * d + 1] = (1 - e) / b_
            T[2 * d + 1, 2 * d + 1] = e
            Q[2 * d, 2 * d] = (s_ / b_) ** 2 * (
                dt_ - 2 / b_ * (1 - e) + (1 - e2) / (2 * b_)
            )
            Q[2 * d, 2 * d + 1] = Q[2 * d + 1, 2 * d] = (
                s_**2 / (2 * b_**2) * (1 - 2 * e + e2)
            )
            Q[2 * d + 1, 2 * d + 1] = s_**2 / (2 * b_) * (1 - e2)
            B[2 * d, d] = dt_ - (1 - e) / b_
            B[2 * d + 1, d] = 1 - e
        return T, Q, B

    aest = a0_row(0)
    Pest = P0.copy()
    llk = 0.0
    for i in range(1, n):
        if ids[i] != ids[i - 1]:
            aest = a0_row(i)
            Pest = P0.copy()
        else:
            T, Q, B = mk(beta[i], sigma[i], dtimes[i])
            Bmu = B @ mu[i]
            if np.isnan(obs[i, 0]):
                aest = T @ aest + Bmu
                Pest = T @ Pest @ T.T + Q
            else:
                u = obs[i] - Z @ aest
                F = Z @ Pest @ Z.T + H
                detF = np.linalg.det(F)
                if detF <= 0:
                    aest = T @ aest
                    Pest = T @ Pest @ T.T + Q
                else:
                    Finv = np.linalg.inv(F)
                    llk -= 0.5 * (np.log(detF) + u @ Finv @ u)
                    K = T @ Pest @ Z.T @ Finv
                    aest = T @ aest + K @ u + Bmu
                    L = T - K @ Z
                    Pest = T @ Pest @ L.T + Q
    return -llk


def test_ctcrw_matches_reference_recursion():
    """Constant-parameter 2-D CTCRW, irregular times, two tracks, one
    NaN row: our Kalman objective must equal the reference recursion
    (including its 2*pi-free update term, which the objective accounts
    for elsewhere as a data-independent constant) to f64 roundoff."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    n = 24
    times = np.cumsum(rng.uniform(0.2, 1.5, n))
    ids = np.array([0] * 12 + [1] * 12)
    obs = np.cumsum(rng.normal(size=(n, 2)) * 0.5, axis=0)
    obs[5] = np.nan
    tau0, nu0, sobs = 2.5, 1.3, 0.2
    mu = np.tile(np.array([0.1, -0.2]), (n, 1))
    P0 = np.diag([1.0, 10.0, 1.0, 10.0])

    ref = _ref_ctcrw_nllk(
        obs, times, ids, mu, np.full(n, tau0), np.full(n, nu0), sobs, P0
    )

    sde = SDE(
        data={"ID": ids, "time": times, "y1": obs[:, 0], "y2": obs[:, 1]},
        type="CTCRW", response=["y1", "y2"],
        par0=[0.1, -0.2, tau0, nu0],
    )
    b = sde.setup()
    pk = b.packer
    assert pk.outer_names()[0] == "log_sigma_obs"
    x = np.array(
        [np.log(sobs), 0.1, -0.2, np.log(tau0), np.log(nu0)]
    )
    full = pk.unpack(jnp.asarray(x), jnp.asarray(pk.inner_init()))
    ours = float(b.joint_nllk(full))
    assert abs(ours - ref) < 1e-10 * (1 + abs(ref)), (ours, ref)


def test_ctcrw_re_smooth_matches_reference_recursion():
    """CTCRW with a per-track random effect on tau: the linear
    predictor (one-hot `re` design, R/sde.R:412-421) and the SSM-family
    penalty (constant-free form, nllk_ctcrw.hpp:256-280:
    -0.5*Sn*loglam + 0.5*lambda*c'Sc with S = I) recomputed externally
    at fixed coefficients."""
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    n = 30
    times = np.cumsum(rng.uniform(0.3, 1.0, n))
    ids = np.array([0] * 10 + [1] * 10 + [2] * 10)
    obs = np.cumsum(rng.normal(size=(n, 2)) * 0.4, axis=0)
    tau_int, nu0, sobs = 2.0, 1.1, 0.15
    c_re = np.array([0.3, -0.1, 0.25])
    loglam = 0.4
    mu = np.zeros((n, 2))
    tau = np.exp(np.log(tau_int) + c_re[ids])
    P0 = np.diag([1.0, 10.0, 1.0, 10.0])

    ref = _ref_ctcrw_nllk(
        obs, times, ids, mu, tau, np.full(n, nu0), sobs, P0
    )
    Sn = 3
    ref += -0.5 * Sn * loglam + 0.5 * np.exp(loglam) * (c_re @ c_re)

    sde = SDE(
        formulas={
            "mu1": "~1", "mu2": "~1",
            "tau": "~s(ID, bs='re')", "nu": "~1",
        },
        data={"ID": ids, "time": times, "y1": obs[:, 0], "y2": obs[:, 1]},
        type="CTCRW", response=["y1", "y2"],
        par0=[0.0, 0.0, tau_int, nu0],
    )
    b = sde.setup()
    pk = b.packer
    outer_names = pk.outer_names()
    x = np.zeros(len(outer_names))
    for j, nm in enumerate(outer_names):
        if nm == "log_sigma_obs":
            x[j] = np.log(sobs)
        elif nm == "log_lambda":
            x[j] = loglam
    fe = np.array([0.0, 0.0, np.log(tau_int), np.log(nu0)])
    k = 0
    for j, nm in enumerate(outer_names):
        if nm == "coeff_fe":
            x[j] = fe[k]
            k += 1
    full = pk.unpack(jnp.asarray(x), jnp.asarray(c_re))
    ours = float(b.joint_nllk(full))
    assert abs(ours - ref) < 1e-10 * (1 + abs(ref)), (ours, ref)


def _ref_diag_ssm_nllk(kind, obs, times, ids, mu, p1, p2, sigma_obs):
    """nllk_bm_ssm.hpp:120-180 / nllk_ou_ssm.hpp:150-215 recomputed in
    numpy with the reference's exact conventions (same DK-form skeleton
    as `_ref_ctcrw_nllk`): a0 = first observation of each track
    (R/sde.R:545-549), P0 = 10*I default (R/sde.R:552-555), dtimes(i) =
    times(i+1)-times(i), NaN rows predict only, no 2*pi constant.

    kind='BM_SSM':  T=I,              drift=mu(i)*dt,        Q=sigma(i)^2*dt*I
                    (p1=sigma, p2 unused)
    kind='OU_SSM':  T=e^{-dt/tau}I,   drift=(1-e^{-dt/tau})mu(i),
                    Q=kappa(1-e^{-2dt/tau})I  (p1=tau, p2=kappa)
    """
    n, n_dim = obs.shape
    dtimes = np.concatenate([np.diff(times), [1.0]])
    H = sigma_obs**2 * np.eye(n_dim)
    I = np.eye(n_dim)
    aest = obs[0].copy()
    Pest = 10.0 * I.copy()
    llk = 0.0
    for i in range(1, n):
        if ids[i] != ids[i - 1]:
            aest = obs[i].copy()
            Pest = 10.0 * I.copy()
        else:
            dt = dtimes[i]
            if kind == "BM_SSM":
                T = I
                drift = mu[i] * dt
                Q = p1[i] ** 2 * dt * I
            else:
                e = np.exp(-dt / p1[i])
                T = e * I
                drift = (1 - e) * mu[i]
                Q = p2[i] * (1 - np.exp(-2 * dt / p1[i])) * I
            if np.isnan(obs[i, 0]):
                aest = T @ aest + drift
                Pest = T @ Pest @ T.T + Q
            else:
                u = obs[i] - aest
                F = Pest + H
                detF = np.linalg.det(F)
                if detF <= 0:
                    aest = T @ aest + drift
                    Pest = T @ Pest @ T.T + Q
                else:
                    Finv = np.linalg.inv(F)
                    llk -= 0.5 * (np.log(detF) + u @ Finv @ u)
                    K = T @ Pest @ Finv
                    aest = T @ aest + K @ u + drift
                    L = T - K
                    Pest = T @ Pest @ L.T + Q
    return -llk


@pytest.mark.parametrize("kind", ["BM_SSM", "OU_SSM"])
def test_diag_ssm_matches_reference_recursion(kind):
    """Constant-parameter 2-D BM_SSM / OU_SSM, irregular times, two
    tracks, one NaN row: our objective equals the reference recursion
    to f64 roundoff (up to the data-independent 2*pi constant the
    objective accounts for separately)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    n = 26
    times = np.cumsum(rng.uniform(0.3, 1.2, n))
    ids = np.array([0] * 13 + [1] * 13)
    obs = np.cumsum(rng.normal(size=(n, 2)) * 0.6, axis=0)
    obs[7] = np.nan
    sobs = 0.25
    mu = np.tile(np.array([0.15, -0.1]), (n, 1))
    if kind == "BM_SSM":
        sig0 = 0.9
        par0 = [0.15, -0.1, sig0]
        x_extra = [np.log(sig0)]
        ref = _ref_diag_ssm_nllk(
            kind, obs, times, ids, mu, np.full(n, sig0), None, sobs
        )
    else:
        tau0, kap0 = 2.2, 1.4
        par0 = [0.15, -0.1, tau0, kap0]
        x_extra = [np.log(tau0), np.log(kap0)]
        ref = _ref_diag_ssm_nllk(
            kind, obs, times, ids, mu,
            np.full(n, tau0), np.full(n, kap0), sobs,
        )

    sde = SDE(
        data={"ID": ids, "time": times, "y1": obs[:, 0], "y2": obs[:, 1]},
        type=kind, response=["y1", "y2"], par0=par0,
    )
    b = sde.setup()
    pk = b.packer
    assert pk.outer_names()[0] == "log_sigma_obs"
    x = np.array([np.log(sobs), 0.15, -0.1] + x_extra)
    full = pk.unpack(jnp.asarray(x), jnp.asarray(pk.inner_init()))
    ours = float(b.joint_nllk(full))
    assert abs(ours - ref) < 1e-10 * (1 + abs(ref)), (ours, ref)


def test_eseal_ssm_matches_reference_recursion():
    """ESEAL_SSM: the reference's elephant-seal body-condition filter
    (nllk_e_seal_ssm.hpp:83-216) recomputed in numpy — state
    (intercept, lipid mass) with T=[[1,0],[mu dt,1]], Q=diag(0,
    sigma^2 dt), obs row Z=(a1, a2/R_i), H=tau^2/h_i, a0=(1, dep_fat
    per track) with P0=diag(0,10) (R/sde.R:599-614), shifted dtimes,
    and the Schick et al. (2013) inverse-gamma priors on sigma(0)^2
    and tau^2 (hpp:215-216, our default priors='schick2013')."""
    import jax.numpy as jnp
    from scipy.special import gammaln

    rng = np.random.default_rng(9)
    n = 28
    times = np.cumsum(rng.uniform(0.5, 1.5, n))
    ids = np.array([0] * 14 + [1] * 14)
    h = rng.uniform(20.0, 60.0, n)
    R = rng.uniform(150.0, 250.0, n)
    dep0 = {0: 80.0, 1: 95.0}
    dep_fat = np.array([dep0[i] for i in ids])
    obs = (rng.normal(size=n) * 0.3 - 0.578 + 1.214 * 90.0 / R)
    mu0, sig0, tau0, a1_0, a2_0 = 0.4, 1.1, 0.9, -0.578, 1.214

    def dinvgamma_log(x, shape, scale):
        return (shape * np.log(scale) - gammaln(shape)
                - (shape + 1) * np.log(x) - scale / x)

    # numpy filter, reference recursion
    dtimes = np.concatenate([np.diff(times), [1.0]])
    aest = np.array([1.0, dep0[0]])
    Pest = np.diag([0.0, 10.0])
    llk = 0.0
    for i in range(1, n):
        if ids[i] != ids[i - 1]:
            aest = np.array([1.0, dep0[ids[i]]])
            Pest = np.diag([0.0, 10.0])
        else:
            dt = dtimes[i]
            T = np.array([[1.0, 0.0], [mu0 * dt, 1.0]])
            Q = np.diag([0.0, sig0**2 * dt])
            Z = np.array([[a1_0, a2_0 / R[i]]])
            Hm = np.array([[tau0**2 / h[i]]])
            if np.isnan(obs[i]):
                aest = T @ aest
                Pest = T @ Pest @ T.T + Q
            else:
                u = obs[i] - (Z @ aest)[0]
                F = (Z @ Pest @ Z.T + Hm)[0, 0]
                if F <= 0:
                    aest = T @ aest
                    Pest = T @ Pest @ T.T + Q
                else:
                    llk -= 0.5 * (np.log(F) + u * u / F)
                    K = (T @ Pest @ Z.T) / F
                    aest = T @ aest + K[:, 0] * u
                    L = T - K @ Z
                    Pest = T @ Pest @ L.T + Q
    llk += dinvgamma_log(sig0**2, 10.0 * n, 4.0 * (10.0 * n - 1.0))
    llk += dinvgamma_log(tau0**2, n / 2.0, n / 2.0 - 1.0)
    ref = -llk

    sde = SDE(
        data={"ID": ids, "time": times, "y": obs},
        type="ESEAL_SSM", response="y", par0=[mu0, sig0],
        other_data={"h": h, "R": R, "dep_fat": dep_fat},
    )
    b = sde.setup()
    pk = b.packer
    names = pk.outer_names()
    x = np.zeros(len(names))
    fe = iter([mu0, np.log(sig0)])
    for j, nm in enumerate(names):
        if nm == "log_tau":
            x[j] = np.log(tau0)
        elif nm == "a1":
            x[j] = a1_0
        elif nm == "log_a2":
            x[j] = np.log(a2_0)
        elif nm == "coeff_fe":
            x[j] = next(fe)
    full = pk.unpack(jnp.asarray(x), jnp.asarray(pk.inner_init()))
    ours = float(b.joint_nllk(full))
    assert abs(ours - ref) < 1e-9 * (1 + abs(ref)), (ours, ref)
