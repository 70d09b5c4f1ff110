"""Cancellation-free forms of the OU/CTCRW covariance expressions.

The reference computes the CTCRW process-noise entries directly
(/root/reference/src/nllk/nllk_ctcrw.hpp:64-75):

    q00 = s^2/b^2 * (dt - 2(1-e^{-b dt})/b + (1-e^{-2 b dt})/(2b))
    q01 = s^2/(2 b^2) * (1 - 2 e^{-b dt} + e^{-2 b dt})

For small u = b*dt the parenthesized factors are O(u^3) and O(u^2)
built from O(u) terms — in f32 this cancellation costs 3-4 digits and
was measured to dominate the f32-vs-f64 gradient error of the whole
1M-step filter (log_tau grad relative error 1.7e-3 with the direct
forms). The identities used here:

    em1(u) = 1 - e^{-u}                      (exact via expm1)
    q01 factor = em1(u)^2                    (no cancellation)
    1 - e^{-2u} = em1(u) * (1 + e^{-u})      (no cancellation)
    q00 factor = phi(u) = psi(u) - em1(u)^2/2, psi(u) = u - em1(u),
        with Taylor-series branches below u < 0.25 where even the
        regrouped forms lose relative accuracy (~eps/u).

Both branches of every `where` are finite for all u >= 0, so no
NaN-gradient masking is needed. All functions accept an array module
(`jnp` default; pass `numpy` for host-side use, e.g. utils/misc).
"""

from __future__ import annotations

import jax.numpy as jnp

# Taylor coefficients of psi(u) = u - (1 - e^{-u}) = sum_{k>=2} (-u)^k/k!
# (low order first, factored as u^2 * poly(u)).
_PSI_COEFFS = (
    1.0 / 2.0,
    -1.0 / 6.0,
    1.0 / 24.0,
    -1.0 / 120.0,
    1.0 / 720.0,
    -1.0 / 5040.0,
    1.0 / 40320.0,
    -1.0 / 362880.0,
    1.0 / 3628800.0,
    -1.0 / 39916800.0,
    1.0 / 479001600.0,
    -1.0 / 6227020800.0,
    1.0 / 87178291200.0,
    -1.0 / 1307674368000.0,
    1.0 / 20922789888000.0,
)

# Taylor coefficients of phi(u) = u - 2(1-e^{-u}) + (1-e^{-2u})/2
#   = sum_{k>=3} (-1)^{k+1} (2^{k-1}-2)/k! u^k, factored as u^3 * poly(u).
_PHI_COEFFS = (
    1.0 / 3.0,
    -1.0 / 4.0,
    7.0 / 60.0,
    -1.0 / 24.0,
    31.0 / 2520.0,
    -1.0 / 320.0,
    127.0 / 181440.0,
    -17.0 / 120960.0,
    511.0 / 19958400.0,
    -1023.0 / 239500800.0,
    4094.0 / 6227020800.0,
    -8190.0 / 87178291200.0,
    16382.0 / 1307674368000.0,
    -32766.0 / 20922789888000.0,
    65534.0 / 355687428096000.0,
    -131070.0 / 6402373705728000.0,
)

# Below the cutoff the regrouped direct forms still lose ~3 eps / u^2
# of relative accuracy (the subtraction (u - em1) - em1^2/2 cancels to
# O(u^3) from O(u^2) pieces); the truncated series at the cutoff is
# accurate to < 1e-14 (f64) with the terms above.
_SERIES_CUTOFF = 0.6


def _horner(u, coeffs):
    acc = coeffs[-1]
    for c in reversed(coeffs[:-1]):
        acc = acc * u + c
    return acc


def em1(u, xp=jnp):
    """1 - e^{-u}, exact for small u."""
    return -xp.expm1(-u)


def psi(u, xp=jnp):
    """u - (1 - e^{-u}) ~ u^2/2: the CTCRW position-drift factor
    (dt - g)*beta and the leading piece of phi."""
    direct = u - em1(u, xp)
    series = u * u * _horner(u, _PSI_COEFFS)
    return xp.where(u < _SERIES_CUTOFF, series, direct)


def phi(u, xp=jnp):
    """u - 2(1-e^{-u}) + (1-e^{-2u})/2 ~ u^3/3: the CTCRW position
    process-noise factor q00 * b^3 / s^2."""
    m = em1(u, xp)
    direct = (u - m) - 0.5 * m * m
    series = u * u * u * _horner(u, _PHI_COEFFS)
    return xp.where(u < _SERIES_CUTOFF, series, direct)


def em1_psi_phi_kernel(u, xp=jnp):
    """(e1, em1, psi, phi) without the expm1 primitive.

    Pallas TPU lowering has no expm1; inside kernels em1 must come from
    its series below the cutoff (em1 = u - psi_series, a <= 1-bit
    cancellation since psi < u/2 there) and from 1 - e^{-u} above it,
    where the direct subtraction is already accurate. Matches
    em1/psi/phi to ~1 ulp."""
    e1 = xp.exp(-u)
    m1d = 1.0 - e1
    ps = u * u * _horner(u, _PSI_COEFFS)
    ph = u * u * u * _horner(u, _PHI_COEFFS)
    small = u < _SERIES_CUTOFF
    m1 = xp.where(small, u - ps, m1d)
    psi_v = xp.where(small, ps, u - m1d)
    phi_v = xp.where(small, ph, (u - m1d) - 0.5 * m1d * m1d)
    return e1, m1, psi_v, phi_v


def ctcrw_transition_terms(beta, sigma2, dt, xp=jnp):
    """All CTCRW per-step transition/noise pieces in stable form.

    Returns a dict with (everything elementwise over the broadcast of
    beta/dt; matches nllk_ctcrw.hpp:46-91 algebra exactly in infinite
    precision):
      e1  = e^{-beta dt}                  T[1,1]
      g   = (1 - e1)/beta                 T[0,1]
      q00 = s^2/b^3 * phi(u)              Q[0,0]
      q01 = s^2/(2 b^2) * em1(u)^2        Q[0,1]
      q11 = s^2/(2 b) * em1(u)(1 + e1)    Q[1,1]
      bp  = psi(u)/beta                   position drift factor (dt - g)
      bv  = em1(u)                        velocity drift factor (1 - e1)
    """
    u = beta * dt
    e1 = xp.exp(-u)
    m1 = em1(u, xp)
    g = m1 / beta
    q00 = sigma2 / (beta * beta * beta) * phi(u, xp)
    q01 = sigma2 / (2.0 * beta * beta) * (m1 * m1)
    q11 = sigma2 / (2.0 * beta) * (m1 * (1.0 + e1))
    bp = psi(u, xp) / beta
    bv = m1
    return {
        "e1": e1,
        "g": g,
        "q00": q00,
        "q01": q01,
        "q11": q11,
        "bp": bp,
        "bv": bv,
    }


def ou_transition_terms(tau, dt, xp=jnp):
    """OU per-step pieces: decay e^{-dt/tau}, drift factor 1-decay,
    noise factor 1-decay^2 (all stable; nllk_ou_ssm.hpp:31-69)."""
    u = dt / tau
    decay = xp.exp(-u)
    m1 = em1(u, xp)
    return {"decay": decay, "bfac": m1, "qfac": m1 * (1.0 + decay)}
