"""Cancellation-free CTCRW/OU transition terms (ops/stable.py) vs an
mpmath arbitrary-precision oracle, in both f64 and f32.

The direct forms of the reference (nllk_ctcrw.hpp:64-75) lose ~3-4
digits at small beta*dt; these tests pin the stable forms to near
machine precision across the u range, including across the series
branch point.
"""

import mpmath as mp
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from smoothsde_tpu.ops.stable import (
    ctcrw_transition_terms,
    em1,
    ou_transition_terms,
    phi,
    psi,
)

mp.mp.dps = 50


def _phi_exact(u):
    u = mp.mpf(u)
    return u - 2 * (1 - mp.e**-u) + (1 - mp.e ** (-2 * u)) / 2


def _psi_exact(u):
    u = mp.mpf(u)
    return u - (1 - mp.e**-u)


US = np.concatenate(
    [
        np.logspace(-6, np.log10(0.599), 25),
        np.array([0.5999999, 0.6, 0.6000001]),  # branch point
        np.logspace(np.log10(0.601), 2, 25),
    ]
)


@pytest.mark.parametrize(
    "fn,exact,f64_tol,f32_tol",
    [
        (psi, _psi_exact, 5e-14, 4e-7),
        (phi, _phi_exact, 5e-12, 1.5e-6),
        (em1, lambda u: 1 - mp.e ** -mp.mpf(u), 5e-15, 4e-7),
    ],
    ids=["psi", "phi", "em1"],
)
def test_stable_fn_vs_mpmath(fn, exact, f64_tol, f32_tol):
    oracle = np.array([float(exact(u)) for u in US])
    got64 = np.asarray(fn(US, xp=np))
    rel64 = np.abs(got64 - oracle) / np.abs(oracle)
    assert rel64.max() < f64_tol, rel64.max()
    got32 = np.asarray(fn(jnp.asarray(US, jnp.float32)))
    rel32 = np.abs(got32.astype(float) - oracle) / np.abs(oracle)
    assert rel32.max() < f32_tol, rel32.max()


def test_ctcrw_terms_vs_mpmath_f32():
    beta, sigma2 = 0.5, 1.7
    dts = US / beta
    b, s2 = mp.mpf(beta), mp.mpf(sigma2)
    for key, exact in {
        "q00": lambda u: s2 / b**3 * _phi_exact(u),
        "q01": lambda u: s2 / (2 * b**2) * (1 - mp.e**-u) ** 2,
        "q11": lambda u: s2
        / (2 * b)
        * (1 - mp.e ** (-2 * mp.mpf(u))),
        "bp": lambda u: _psi_exact(u) / b,
        "bv": lambda u: 1 - mp.e**-u,
        "g": lambda u: (1 - mp.e**-u) / b,
        "e1": lambda u: mp.e**-u,
    }.items():
        oracle = np.array([float(exact(u)) for u in US])
        got = np.asarray(
            ctcrw_transition_terms(
                jnp.float32(beta), jnp.float32(sigma2),
                jnp.asarray(dts, jnp.float32),
            )[key]
        ).astype(float)
        keep = oracle > 1e-30  # e^{-u} underflows f32 for u ~ 100
        rel = np.abs(got - oracle)[keep] / np.abs(oracle)[keep]
        assert rel.max() < 2e-6, (key, rel.max())


def test_ou_terms_vs_mpmath_f32():
    tau = 2.0
    dts = US * tau
    for key, exact in {
        "decay": lambda u: mp.e ** -mp.mpf(u),
        "bfac": lambda u: 1 - mp.e ** -mp.mpf(u),
        "qfac": lambda u: 1 - mp.e ** (-2 * mp.mpf(u)),
    }.items():
        oracle = np.array([float(exact(u)) for u in US])
        got = np.asarray(
            ou_transition_terms(
                jnp.float32(tau), jnp.asarray(dts, jnp.float32)
            )[key]
        ).astype(float)
        keep = oracle > 1e-30  # e^{-u} underflows f32 for u ~ 100
        rel = np.abs(got - oracle)[keep] / np.abs(oracle)[keep]
        assert rel.max() < 2e-6, (key, rel.max())


def test_q00_gradient_f32_accuracy():
    """d q00 / d log_tau in f32 must track the f64 value to ~1e-4 even
    at small beta*dt — the regime where the direct form loses 3+ digits
    (this is the term that dominated the 1M-step log_tau gradient error
    before the stable reformulation). AD of q00 wrt log_tau computes
    3*phi(u) - u*phi'(u) ~ u^4/4 from O(u^3) pieces, so one order of
    cancellation (~4 eps/u) is inherent; at u = 0.025 that is ~1e-5."""
    dt = jnp.float64(0.05)

    def q00(log_tau, dtype):
        tau = jnp.exp(jnp.asarray(log_tau, dtype))
        beta = 1.0 / tau
        return ctcrw_transition_terms(
            beta, jnp.asarray(1.3, dtype), jnp.asarray(dt, dtype)
        )["q00"]

    g64 = jax.grad(lambda lt: q00(lt, jnp.float64))(jnp.float64(0.7))
    g32 = jax.grad(lambda lt: q00(lt, jnp.float32))(jnp.float32(0.7))
    assert abs(float(g32) - float(g64)) / abs(float(g64)) < 1e-4


def test_grads_finite_across_branch():
    for fn in (psi, phi):
        g = jax.vmap(jax.grad(fn))(jnp.asarray(US, jnp.float32))
        assert bool(jnp.all(jnp.isfinite(g)))
