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
