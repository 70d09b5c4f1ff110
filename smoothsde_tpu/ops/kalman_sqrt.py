"""Square-root (Cholesky-form) associative Kalman filtering for the
s=2 SoA CTCRW family.

Why: the moment-form filtering elements carry covariance-like blocks
(C = filtered covariance contribution, J = information contribution)
whose f32 composition over ~10^6 steps accumulates a coherent rounding
bias in the small entries (measured: 3.7e-4 relative nllk error and
1.5e-4/6.5e-4 log_tau/log_nu gradient errors at 1M steps even with the
cancellation-free element build of ops/stable.py). Propagating Cholesky
FACTORS instead — U with C = U U', Z with J = Z Z' — keeps the small
covariances accurate to a few ulp of the factor, the classic
square-root-filter argument; the parallel-scan formulation follows the
square-root filtering elements of Yaghoobi, Corenflos, Hassan & Sarkka
(parallel square-root Bayesian filtering/smoothing; see PAPERS.md), with
all 2x2 QR/Cholesky steps in closed form so every operation remains an
elementwise VPU op over the step axis (the SoA layout of
ops/kalman_soa.py).

Combine derivation (moment form in ops/kalman.py:_combine): with
K = U1' Z2,
  M C1 = (C1^{-1} + J2)^{-1} = U1 (I + K K')^{-1} U1'
  N J2 = (J2^{-1} + C1)^{-1}-like = Z2 (I + K' K)^{-1} Z2'
so
  U_new = tria([A2 U1 chol(I + K K')^{-T} | U2])
  Z_new = tria([A1' Z2 chol(I + K' K)^{-T} | Z1])
  M     = I - W V'   with  W = U1 K Lt^{-T},  V = Z2 Lt^{-T},
          Lt = chol(I + K' K)
  A, b, eta as in the moment form but applied through M = I - W V'.

tria() is closed-form LQ of a 2 x m row block (Gram-Schmidt on two
rows — Householder-equivalent at this size), never forming the Gram
matrix, so no squaring is reintroduced.

Semantics (resets, missing observations, llk recovery) are identical to
ops/kalman_soa.py and the reference loops (nllk_ctcrw.hpp:195-247).
Exactness: in f64 this path matches the moment-form filter to ~1e-12;
in f32 at 10^6 steps it reduces the nllk/grad error by >10x (see
docs/ACCURACY.md).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from smoothsde_tpu.ops.kalman_soa import CtcrwSystem, _ctcrw_system, _wh


def _ssqrt(x):
    """sqrt with a zero-safe gradient (masked branches carry exact
    zeros; d sqrt/dx at 0 is inf and would NaN-poison grads)."""
    pos = x > 0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def _sdiv(a, b):
    nz = b != 0
    return jnp.where(nz, a / jnp.where(nz, b, 1.0), 0.0)


class SqrtElement2(NamedTuple):
    """SoA square-root filtering element for state dim 2.

    A: 2x2 nested tuple; b, eta: 2-tuples; U, Z: lower-triangular
    factors stored as (l00, l10, l11) tuples with C = U U', J = Z Z'.
    """

    A: tuple
    b: tuple
    U: tuple
    eta: tuple
    Z: tuple


_ID_SQ2 = SqrtElement2(
    A=((1.0, 0.0), (0.0, 1.0)),
    b=(0.0, 0.0),
    U=(0.0, 0.0, 0.0),
    eta=(0.0, 0.0),
    Z=(0.0, 0.0, 0.0),
)


def _chol2(g00, g01, g11):
    """Closed-form Cholesky of a 2x2 SPD matrix."""
    l00 = jnp.sqrt(g00)
    l10 = g01 / l00
    l11 = jnp.sqrt(g11 - l10 * l10)
    return l00, l10, l11


def _tria24(r1, r2):
    """Closed-form LQ of a 2 x m row block: returns lower-tri
    (l00, l10, l11) with [r1; r2] [r1; r2]' = L L'. Zero rows are safe
    (masked elements)."""
    n1sq = sum(x * x for x in r1)
    l00 = _ssqrt(n1sq)
    q1 = tuple(_sdiv(x, l00) for x in r1)
    l10 = sum(a * b for a, b in zip(r2, q1))
    w = tuple(a - l10 * b for a, b in zip(r2, q1))
    l11 = _ssqrt(sum(x * x for x in w))
    return l00, l10, l11


def _combine_sqrt2(e1: SqrtElement2, e2: SqrtElement2) -> SqrtElement2:
    A1, b1, (p00, p10, p11), eta1, Z1 = e1
    A2, b2, U2, eta2, (w00, w10, w11) = e2

    # K = U1' Z2 (U1' upper, Z2 lower)
    k00 = p00 * w00 + p10 * w10
    k01 = p10 * w11
    k10 = p11 * w10
    k11 = p11 * w11

    # Lt = chol(I + K'K); V = Z2 Lt^{-T}; W = U1 K Lt^{-T}
    t00, t10, t11 = _chol2(
        1.0 + k00 * k00 + k10 * k10,
        k00 * k01 + k10 * k11,
        1.0 + k01 * k01 + k11 * k11,
    )
    # Lt^{-T} (upper): [[1/t00, -t10/(t00 t11)], [0, 1/t11]]
    iu00 = 1.0 / t00
    iu01 = -t10 / (t00 * t11)
    iu11 = 1.0 / t11
    V = (
        (w00 * iu00, w00 * iu01),
        (w10 * iu00, w10 * iu01 + w11 * iu11),
    )
    uk00 = p00 * k00
    uk01 = p00 * k01
    uk10 = p10 * k00 + p11 * k10
    uk11 = p10 * k01 + p11 * k11
    W = (
        (uk00 * iu00, uk00 * iu01 + uk01 * iu11),
        (uk10 * iu00, uk10 * iu01 + uk11 * iu11),
    )

    def m_apply(v0, v1):
        """(I - W V') v"""
        s0 = V[0][0] * v0 + V[1][0] * v1  # V' v
        s1 = V[0][1] * v0 + V[1][1] * v1
        return (
            v0 - (W[0][0] * s0 + W[0][1] * s1),
            v1 - (W[1][0] * s0 + W[1][1] * s1),
        )

    def mt_apply(v0, v1):
        """(I - V W') v"""
        s0 = W[0][0] * v0 + W[1][0] * v1  # W' v
        s1 = W[0][1] * v0 + W[1][1] * v1
        return (
            v0 - (V[0][0] * s0 + V[0][1] * s1),
            v1 - (V[1][0] * s0 + V[1][1] * s1),
        )

    # A = A2 M A1: apply M to each column of A1
    c0 = m_apply(A1[0][0], A1[1][0])
    c1 = m_apply(A1[0][1], A1[1][1])
    MA1 = ((c0[0], c1[0]), (c0[1], c1[1]))
    A = (
        (
            A2[0][0] * MA1[0][0] + A2[0][1] * MA1[1][0],
            A2[0][0] * MA1[0][1] + A2[0][1] * MA1[1][1],
        ),
        (
            A2[1][0] * MA1[0][0] + A2[1][1] * MA1[1][0],
            A2[1][0] * MA1[0][1] + A2[1][1] * MA1[1][1],
        ),
    )

    # b = A2 M (b1 + C1 eta2) + b2, C1 eta2 = U1 (U1' eta2)
    s0 = p00 * eta2[0] + p10 * eta2[1]  # U1' eta2
    s1 = p11 * eta2[1]
    t0 = b1[0] + p00 * s0
    t1 = b1[1] + p10 * s0 + p11 * s1
    mt0, mt1 = m_apply(t0, t1)
    b = (
        A2[0][0] * mt0 + A2[0][1] * mt1 + b2[0],
        A2[1][0] * mt0 + A2[1][1] * mt1 + b2[1],
    )

    # eta = A1' M' (eta2 - J2 b1) + eta1, J2 b1 = Z2 (Z2' b1)
    zb0 = w00 * b1[0] + w10 * b1[1]  # Z2' b1
    zb1 = w11 * b1[1]
    q0 = eta2[0] - (w00 * zb0)
    q1 = eta2[1] - (w10 * zb0 + w11 * zb1)
    nq0, nq1 = mt_apply(q0, q1)
    eta = (
        A1[0][0] * nq0 + A1[1][0] * nq1 + eta1[0],
        A1[0][1] * nq0 + A1[1][1] * nq1 + eta1[1],
    )

    # U = tria([A2 U1 Lh^{-T} | U2]) with Lh = chol(I + K K')
    h00, h10, h11 = _chol2(
        1.0 + k00 * k00 + k01 * k01,
        k00 * k10 + k01 * k11,
        1.0 + k10 * k10 + k11 * k11,
    )
    ju00 = 1.0 / h00
    ju01 = -h10 / (h00 * h11)
    ju11 = 1.0 / h11
    # Y = U1 Lh^{-T}
    y00 = p00 * ju00
    y01 = p00 * ju01
    y10 = p10 * ju00
    y11 = p10 * ju01 + p11 * ju11
    # A2 Y
    ay00 = A2[0][0] * y00 + A2[0][1] * y10
    ay01 = A2[0][0] * y01 + A2[0][1] * y11
    ay10 = A2[1][0] * y00 + A2[1][1] * y10
    ay11 = A2[1][0] * y01 + A2[1][1] * y11
    U = _tria24(
        (ay00, ay01, U2[0], 0.0 * ay00),
        (ay10, ay11, U2[1], U2[2]),
    )

    # Z = tria([A1' V | Z1])  (A1' Z2 Lt^{-T} = A1' V)
    av00 = A1[0][0] * V[0][0] + A1[1][0] * V[1][0]
    av01 = A1[0][0] * V[0][1] + A1[1][0] * V[1][1]
    av10 = A1[0][1] * V[0][0] + A1[1][1] * V[1][0]
    av11 = A1[0][1] * V[0][1] + A1[1][1] * V[1][1]
    Z = _tria24(
        (av00, av01, Z1[0], 0.0 * av00),
        (av10, av11, Z1[1], Z1[2]),
    )

    return SqrtElement2(A=A, b=b, U=U, eta=eta, Z=Z)


def _build_sqrt_elements(sys: CtcrwSystem) -> SqrtElement2:
    """Per-step square-root elements from the shared CTCRW system
    (same three-way reset/propagate/update selection as
    kalman_soa._ctcrw_system, with factors instead of C/J)."""
    Ft, ct, Qt, yd, h = sys.Ft, sys.ct, sys.Qt, sys.yd, sys.h
    reset, update = sys.reset, sys.update

    q00, q01, q11 = Qt[0][0], Qt[0][1], Qt[1][1]
    # chol(Qt), zero-safe for masked (zero) steps
    uq00 = _ssqrt(q00)
    uq10 = _sdiv(q01, uq00)
    uq11 = _ssqrt(q11 - uq10 * uq10)

    S = q00 + h
    K0 = q00 / S
    K1 = q01 / S
    r = yd - ct[0]
    f0, f1 = Ft[0][0], Ft[0][1]

    # measurement update in factor form: C_upd = Uq diag(sqrt(h/S),1) Uq'
    sh = jnp.sqrt(h / S)
    u_upd = (uq00 * sh, uq10 * sh, uq11)
    A_upd = (
        ((1.0 - K0) * f0, (1.0 - K0) * f1),
        (Ft[1][0] - K1 * f0, Ft[1][1] - K1 * f1),
    )
    b_upd = (ct[0] + K0 * r, ct[1] + K1 * r)
    eta_upd = (f0 * r / S, f1 * r / S)
    # J_upd = (Ft' z)(Ft' z)'/S: rank-1 factor as lower storage via tria
    rs = 1.0 / jnp.sqrt(S)
    z_upd = _tria24(
        (f0 * rs, jnp.zeros_like(f0), jnp.zeros_like(f0), jnp.zeros_like(f0)),
        (f1 * rs, jnp.zeros_like(f0), jnp.zeros_like(f0), jnp.zeros_like(f0)),
    )

    zero = jnp.zeros_like(yd)
    a0_pos = _wh(reset, yd, 0.0)
    p0p = jnp.sqrt(jnp.asarray(sys.p0_pos, yd.dtype))
    p0v = jnp.sqrt(jnp.asarray(sys.p0_vel, yd.dtype))
    upd = update & (~reset)
    return SqrtElement2(
        A=_wh(reset, ((zero, zero), (zero, zero)), _wh(upd, A_upd, Ft)),
        b=_wh(reset, (a0_pos, zero), _wh(upd, b_upd, ct)),
        U=_wh(
            reset,
            (jnp.full_like(yd, p0p), zero, jnp.full_like(yd, p0v)),
            _wh(upd, u_upd, (uq00, uq10, uq11)),
        ),
        eta=_wh(upd, eta_upd, (zero, zero)),
        Z=_wh(upd, z_upd, (zero, zero, zero)),
    )


def _llk_from_sqrt_filtered(sys: CtcrwSystem, m_f, U_f):
    """Predictive llk recovery from square-root filtered moments:
    Pp00 = || row0(Ft U_prev) ||^2 + q00 — a sum of squares, no
    cancellation."""
    Ft, ct, Qt, yd, h = sys.Ft, sys.ct, sys.Qt, sys.yd, sys.h

    def shift(x, fill=0.0):
        return jnp.concatenate(
            [jnp.full(x.shape[:-1] + (1,), fill, x.dtype), x[..., :-1]],
            axis=-1,
        )

    m0p, m1p = shift(m_f[0]), shift(m_f[1])
    u00p, u10p, u11p = shift(U_f[0]), shift(U_f[1]), shift(U_f[2])
    f0, f1 = Ft[0][0], Ft[0][1]
    r0 = f0 * u00p + f1 * u10p
    r1 = f1 * u11p
    Pp00 = r0 * r0 + r1 * r1 + Qt[0][0]
    a_pred0 = f0 * m0p + f1 * m1p + ct[0]
    a_pred0 = _wh(sys.reset, yd, a_pred0)
    Pp00 = _wh(sys.reset, sys.p0_pos, Pp00)
    F = Pp00 + h
    u = yd - a_pred0
    llk_terms = _wh(sys.update, -0.5 * (jnp.log(F) + u * u / F), 0.0)
    return jnp.sum(llk_terms)


class SqrtElement1(NamedTuple):
    """SoA square-root filtering element for state dim 1: scalars with
    C = u^2, J = z^2 (the s=1 specialization of SqrtElement2)."""

    A: jax.Array
    b: jax.Array
    u: jax.Array
    eta: jax.Array
    z: jax.Array


_ID_SQ1 = SqrtElement1(A=1.0, b=0.0, u=0.0, eta=0.0, z=0.0)


def _combine_sqrt1(e1: SqrtElement1, e2: SqrtElement1) -> SqrtElement1:
    """Scalar square-root combine. Every covariance-like quantity is a
    sum of squares (no cancellation): with k = u1 z2 and
    M = 1/(1 + k^2),
      u_new^2 = A2^2 M u1^2 + u2^2,   z_new^2 = A1^2 M z2^2 + z1^2
    computed through the factors so small covariances stay accurate to
    a few ulp of the factor."""
    A1, b1, u1, eta1, z1 = e1
    A2, b2, u2, eta2, z2 = e2
    k = u1 * z2
    M = 1.0 / (1.0 + k * k)
    sM = jnp.sqrt(M)
    A = A2 * M * A1
    b = A2 * M * (b1 + u1 * (u1 * eta2)) + b2
    au = A2 * u1 * sM
    u = _ssqrt(au * au + u2 * u2)
    eta = A1 * M * (eta2 - z2 * (z2 * b1)) + eta1
    az = A1 * z2 * sM
    z = _ssqrt(az * az + z1 * z1)
    return SqrtElement1(A=A, b=b, u=u, eta=eta, z=z)


def _build_sqrt_elements1(sysd) -> SqrtElement1:
    """Per-step scalar square-root elements from a DiagSystem (same
    three-way reset/update/propagate selection as
    ops/diag_fused.diag_elements, with factors u = sqrt(C),
    z = sqrt(J) instead of C/J)."""
    t, q, c, yd, h = sysd.t, sysd.q, sysd.c, sysd.yd, sysd.h
    reset, update = sysd.reset, sysd.update
    S = q + h
    K = q / S
    r = yd - c
    # update branch: C = (1-K) q = q h / S  ->  u = sqrt(q) sqrt(h/S);
    # J = t^2/S -> z = |t| / sqrt(S) (t > 0 for BM/OU decay factors)
    rootS = jnp.sqrt(S)
    u_upd = _ssqrt(q) * jnp.sqrt(h) / rootS
    A_upd = (1.0 - K) * t
    b_upd = c + K * r
    eta_upd = t * r / S
    z_upd = jnp.abs(t) / rootS
    zero = jnp.zeros_like(yd)
    p0r = jnp.sqrt(jnp.asarray(sysd.p0, yd.dtype))
    return SqrtElement1(
        A=_wh(reset, zero, _wh(update, A_upd, t)),
        b=_wh(reset, yd, _wh(update, b_upd, c)),
        u=_wh(reset, jnp.full_like(yd, p0r), _wh(update, u_upd, _ssqrt(q))),
        eta=_wh(update, eta_upd, zero),
        z=_wh(update, z_upd, zero),
    )


def _llk_from_sqrt_filtered1(sysd, m_f, u_f):
    """Predictive llk recovery from scalar square-root filtered moments:
    P_pred = (t u_prev)^2 + q — a sum of squares, no cancellation."""

    def shift(x, fill=0.0):
        return jnp.concatenate(
            [jnp.full(x.shape[:-1] + (1,), fill, x.dtype), x[..., :-1]],
            axis=-1,
        )

    m_prev = shift(m_f)
    u_prev = shift(u_f)
    tu = sysd.t * u_prev
    P_pred = tu * tu + sysd.q
    a_pred = jnp.where(sysd.reset, sysd.yd, sysd.t * m_prev + sysd.c)
    P_pred = jnp.where(sysd.reset, sysd.p0, P_pred)
    F = P_pred + sysd.h
    r = sysd.yd - a_pred
    return jnp.sum(
        jnp.where(sysd.update, -0.5 * (jnp.log(F) + r * r / F), 0.0)
    )


def diag_ssm_loglik_sqrt(type, par_mat, obs, times, ids, sigma_obs,
                         p0=10.0, scan: str = "auto", dt=None):
    """Scalar-state SSM (BM_SSM / OU_SSM) log-likelihood via the
    square-root associative-scan filter — the accuracy-optimal path for
    very long f32 horizons, completing the kalman_impl='sqrt' option
    for the whole SSM family (reference loops nllk_bm_ssm.hpp:127-175,
    nllk_ou_ssm.hpp:163-213). Same value as
    ops/kalman_soa.diag_ssm_loglik_soa to fp tolerance; gradients via
    plain AD through the scan.
    """
    from smoothsde_tpu.ops.diag_fused import diag_system
    from smoothsde_tpu.ops.kalman_soa import _scan_elements

    sysd = diag_system(
        type, par_mat, obs, times, ids, sigma_obs, p0=p0, dt=dt
    )
    elem = _build_sqrt_elements1(sysd)
    scanned = _scan_elements(_combine_sqrt1, _ID_SQ1, elem, scan)
    return _llk_from_sqrt_filtered1(sysd, scanned.b, scanned.u)


def ctcrw_loglik_sqrt(par_mat, obs, times, ids, sigma_obs, p0_pos=1.0,
                      p0_vel=10.0, scan: str = "auto", dt=None):
    """CTCRW log-likelihood via the square-root associative-scan filter.

    Same value as ctcrw_loglik_soa to fp tolerance, with much tighter
    long-horizon f32 accuracy (the accuracy-optimal path; the fused
    moment-form kernels remain the speed-optimal path). Gradients via
    plain AD through the scan.

    scan: 'blocked' (default; TPU-fast two-phase scan), 'associative',
    or 'sequential' (lax.scan composition — use for CPU gradients,
    where AD through lax.associative_scan miscompiles; see
    ops/kalman.py).
    """
    from smoothsde_tpu.ops.kalman_soa import _scan_elements

    sys = _ctcrw_system(
        par_mat, obs, times, ids, sigma_obs, p0_pos, p0_vel, dt=dt
    )
    elem = _build_sqrt_elements(sys)
    if scan == "sequential":
        def step(carry, x):
            new = _combine_sqrt2(carry, x)
            return new, new

        elem_t = jax.tree.map(lambda x: jnp.moveaxis(x, -1, 0), elem)
        n = jax.tree.leaves(elem)[0].shape[-1]
        d = sys.yd.shape[0]
        init = jax.tree.map(
            lambda x: jnp.broadcast_to(
                jnp.asarray(x, sys.yd.dtype), (d,)
            ),
            _ID_SQ2,
        )
        elem_t = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n, d)), elem_t
        )
        _, scanned_t = jax.lax.scan(step, init, elem_t)
        scanned = jax.tree.map(
            lambda x: jnp.moveaxis(x, 0, -1), scanned_t
        )
    else:
        if scan == "auto":
            scan = "blocked"
        scanned = _scan_elements(_combine_sqrt2, _ID_SQ2, elem, scan)
    return _llk_from_sqrt_filtered(sys, scanned.b, scanned.U)
