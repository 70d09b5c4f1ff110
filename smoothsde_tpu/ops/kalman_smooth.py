"""Parallel RTS smoother and analytic (Fisher-identity) gradients for
the s=2 SoA Kalman filter.

Reverse-mode AD through the associative filter scan costs ~3x the
forward pass and stores large residuals. The score of a linear-Gaussian
state-space model has a closed form instead (Fisher/EM identity):

    d llk / d theta = E[ d log p(x, y; theta) / d theta | y ],

an elementwise expression in the smoothed means/covariances and lag-one
cross-covariances. Those come from one additional (reversed) blocked
associative scan of RTS smoothing elements (Särkkä & García-Fernández
temporal-parallelization formulation; PAPERS.md). The filter is wrapped
in jax.custom_vjp: forward = filter, backward = smoother + elementwise
score — two scans total instead of AD's forward + stored-residual
reverse.

Also exposes smoothed state moments as a user-facing feature the
reference does not have (it only REPORTs filtered states,
nllk_ctcrw.hpp:249).

Model conventions match ops/kalman_soa.py exactly: per-step transition
(Ft, ct, Qt) ENTERING step i (identity/zero out of a reset, so the
state is frozen across the track start's first interval), observation
y_i = x_i[0] + N(0, h) where `update` is true, prior N((y_s, 0),
diag(p0_pos, p0_vel)) at reset indices.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from smoothsde_tpu.ops.kalman_soa import (
    _combine2,
    _ID2,
    _inv2,
    _m2,
    _madd,
    _mv,
    _scan_elements,
    _symm,
    _t2,
    _vadd,
    _vsub,
    _wh,
)


class Smooth2(NamedTuple):
    """RTS smoothing element (E, g, L): x_i | x_{i+1} map."""

    E: tuple
    g: tuple
    L: tuple


def _combine2_rev(acc: Smooth2, new: Smooth2) -> Smooth2:
    """Compose a new element OUTSIDE the accumulator: scanning the
    flipped (end-first) sequence, acc covers indices > i and new is the
    element at i; result = new applied to acc."""
    E = _m2(new.E, acc.E)
    g = _vadd(_mv(new.E, acc.g), new.g)
    L = _symm(_madd(_m2(_m2(new.E, acc.L), _t2(new.E)), new.L))
    return Smooth2(E, g, L)


_ID_S2 = Smooth2(
    E=((1.0, 0.0), (0.0, 1.0)),
    g=(0.0, 0.0),
    L=((0.0, 0.0), (0.0, 0.0)),
)


def _flip(tree):
    return jax.tree.map(lambda x: jnp.flip(x, axis=-1), tree)


def _shift_back(x, fill=0.0):
    """x_{i+1} at slot i (last slot gets `fill`)."""
    return jnp.concatenate(
        [x[..., 1:], jnp.full(x.shape[:-1] + (1,), fill, x.dtype)], axis=-1
    )


def _tmap(fn, *trees):
    return jax.tree.map(fn, *trees)


def _msub(X, Y):
    return (
        (X[0][0] - Y[0][0], X[0][1] - Y[0][1]),
        (X[1][0] - Y[1][0], X[1][1] - Y[1][1]),
    )


def _outer(u, v):
    return (
        (u[0] * v[0], u[0] * v[1]),
        (u[1] * v[0], u[1] * v[1]),
    )


def rts_smoother_soa(Ft, ct, Qt, m_f, P_f, track_end, scan="auto"):
    """Smoothed moments from filtered moments.

    Args (all SoA nested tuples / arrays with step axis last):
      Ft, ct, Qt: transition ENTERING each step (kalman_soa convention).
      m_f (2-tuple), P_f (2x2 tuple): filtered moments.
      track_end: bool (..., n): last index of each track.

    Returns (m_s 2-tuple, P_s 2x2 tuple, G 2x2 tuple) where G[i] is the
    RTS gain used for the i -> i+1 smoothing recursion (lag-one
    cross-covariance Cov(x_{i+1}, x_i | y) = P_s_{i+1} G_i').
    """
    # transition LEAVING step i = transition entering i+1
    # (identity fills on the diagonal for the final slot)
    Fn = (
        (_shift_back(Ft[0][0], 1.0), _shift_back(Ft[0][1])),
        (_shift_back(Ft[1][0]), _shift_back(Ft[1][1], 1.0)),
    )
    cn = (_shift_back(ct[0]), _shift_back(ct[1]))
    Qn = (
        (_shift_back(Qt[0][0]), _shift_back(Qt[0][1])),
        (_shift_back(Qt[1][0]), _shift_back(Qt[1][1])),
    )

    # prediction of i+1 from filtered i: Pp = F P F' + Q
    FP = _m2(Fn, P_f)
    Pp = _symm(_madd(_m2(FP, _t2(Fn)), Qn))
    # RTS gain G = P F' Pp^{-1}
    PFt = _t2(FP)  # (F P)' = P F' for symmetric P
    G = _m2(PFt, _inv2(Pp))
    g = _vsub(m_f, _mv(G, _vadd(_mv(Fn, m_f), cn)))
    L = _symm(
        _madd(P_f, _tmap(lambda x: -x, _m2(_m2(G, Pp), _t2(G))))
    )

    # absorbing element at track ends: smoothed = filtered
    zero = jnp.zeros_like(m_f[0])
    E = _wh(track_end, ((zero, zero), (zero, zero)), G)
    g = _wh(track_end, m_f, g)
    L = _wh(track_end, P_f, L)

    elem = Smooth2(E=E, g=g, L=L)
    scanned = _scan_elements(_combine2_rev, _ID_S2, _flip(elem), scan)
    scanned = _flip(scanned)
    return scanned.g, scanned.L, G


def llk2_analytic(sys, scan: str = "auto"):
    """CTCRW SoA log-likelihood with the Fisher-identity custom_vjp.

    Forward = blocked-scan filter (identical value to the AD path);
    backward = one reversed blocked scan (RTS smoother) + elementwise
    score in the smoothed moments. Verified against jax.grad of the AD
    path in tests/test_kalman.py.
    """
    from smoothsde_tpu.ops.kalman_soa import (
        _build_elem2,
        _llk_from_filtered,
    )

    reset, prev_reset, update = sys.reset, sys.prev_reset, sys.update
    p0_pos, p0_vel = sys.p0_pos, sys.p0_vel

    def _filter(Ft, ct, Qt, yd, h):
        sys2 = sys._replace(Ft=Ft, ct=ct, Qt=Qt, yd=yd, h=h)
        if scan == "fused":
            from smoothsde_tpu.ops.ctcrw_fused import fused_filter

            # moments stay in the kernel's tiled layout: the backward
            # consumes them directly, skipping an untile/retile pair
            return fused_filter(
                sys2, want_moments=True, tiled_moments=True
            )
        elem = _build_elem2(
            Ft, ct, Qt, yd, h, reset, update, p0_pos, p0_vel
        )
        sc = _scan_elements(_combine2, _ID2, elem, scan)
        return _llk_from_filtered(sys2, sc.b, sc.C), sc.b, sc.C

    @jax.custom_vjp
    def core(Ft, ct, Qt, yd, h):
        return _filter(Ft, ct, Qt, yd, h)[0]

    def core_fwd(Ft, ct, Qt, yd, h):
        llk, m_f, P_f = _filter(Ft, ct, Qt, yd, h)
        return llk, (Ft, ct, Qt, yd, h, m_f, P_f)

    def core_bwd(res, gbar):
        Ft, ct, Qt, yd, h, m_f, P_f = res
        if scan == "fused":
            from smoothsde_tpu.ops.ctcrw_fused import fused_backward

            sys2 = sys._replace(Ft=Ft, ct=ct, Qt=Qt, yd=yd, h=h)
            return fused_backward(sys2, m_f, P_f, gbar)
        smoother_scan = scan
        te = jnp.broadcast_to(
            jnp.concatenate([reset[1:], jnp.ones((1,), bool)]), yd.shape
        )
        m_s, P_s, G = rts_smoother_soa(
            Ft, ct, Qt, m_f, P_f, te, smoother_scan
        )

        def sf(x, fill=0.0):  # value at i-1 in slot i
            return jnp.concatenate(
                [jnp.full(x.shape[:-1] + (1,), fill, x.dtype), x[..., :-1]],
                axis=-1,
            )

        m1 = (sf(m_s[0]), sf(m_s[1]))
        P1 = (
            (sf(P_s[0][0]), sf(P_s[0][1])),
            (sf(P_s[1][0]), sf(P_s[1][1])),
        )
        Gp = (
            (sf(G[0][0]), sf(G[0][1])),
            (sf(G[1][0]), sf(G[1][1])),
        )
        # lag-one cross-covariance Cov(x_i, x_{i-1} | y) = P_s_i Gp'
        C21 = _m2(P_s, _t2(Gp))

        tv = (~reset) & (~prev_reset)  # transition density exists
        one = jnp.ones_like(yd)
        zero = jnp.zeros_like(yd)
        eye = ((one, zero), (zero, one))
        Qs = _wh(tv, Qt, eye)  # sanitize before inversion
        Qinv = _inv2(Qs)

        Exx1 = _madd(P1, _outer(m1, m1))
        Ex2x1 = _madd(C21, _outer(m_s, m1))
        rb = _vsub(_vsub(m_s, _mv(Ft, m1)), ct)

        Fbar = _m2(Qinv, _msub(_msub(Ex2x1, _m2(Ft, Exx1)), _outer(ct, m1)))
        cbar = _mv(Qinv, rb)
        FP1 = _m2(Ft, P1)
        Errt = _madd(
            _msub(
                _msub(_madd(P_s, _m2(FP1, _t2(Ft))), _m2(C21, _t2(Ft))),
                _m2(Ft, _t2(C21)),
            ),
            _outer(rb, rb),
        )
        half = jnp.asarray(0.5, yd.dtype)
        Qbar = _msub(_m2(_m2(Qinv, Errt), Qinv), Qinv)
        Qbar = ((half * Qbar[0][0], half * Qbar[0][1]),
                (half * Qbar[1][0], half * Qbar[1][1]))

        zero_like = lambda X: jax.tree.map(jnp.zeros_like, X)  # noqa: E731
        mask = lambda X: _wh(tv, X, zero_like(X))  # noqa: E731
        g = gbar
        Fbar = jax.tree.map(lambda x: g * x, mask(Fbar))
        cbar = jax.tree.map(lambda x: g * x, mask(cbar))
        Qbar = jax.tree.map(lambda x: g * x, mask(Qbar))

        # cotangents must have the PRIMAL shapes: transition components
        # shared across response dims are (n,) while the score above is
        # (d, n) — sum over broadcasted axes.
        def unbroadcast(cot, primal):
            cot = jnp.asarray(cot)
            pshape = jnp.shape(primal)
            while cot.ndim > len(pshape):
                cot = cot.sum(axis=0)
            for ax, (c, p) in enumerate(zip(cot.shape, pshape)):
                if p == 1 and c != 1:
                    cot = cot.sum(axis=ax, keepdims=True)
            return cot

        Fbar = jax.tree.map(unbroadcast, Fbar, Ft)
        cbar = jax.tree.map(unbroadcast, cbar, ct)
        Qbar = jax.tree.map(unbroadcast, Qbar, Qt)

        resid = yd - m_s[0]
        ybar = g * (
            _wh(update, -resid / h, 0.0) + _wh(reset, -resid / p0_pos, 0.0)
        )
        Ey2 = resid * resid + P_s[0][0]
        hbar = g * jnp.sum(
            _wh(update, 0.5 * Ey2 / (h * h) - 0.5 / h, 0.0)
        )
        hbar = jnp.asarray(hbar, jnp.asarray(h).dtype).reshape(
            jnp.shape(h)
        )
        return (Fbar, cbar, Qbar, ybar, hbar)

    core.defvjp(core_fwd, core_bwd)
    return core(sys.Ft, sys.ct, sys.Qt, sys.yd, sys.h)


def ctcrw_smoothed_states(par_mat, obs, times, ids, sigma_obs,
                          p0_pos=1.0, p0_vel=10.0, scan: str = "auto"):
    """User-facing: smoothed (position, velocity) means and covariances
    per dimension for a CTCRW model. Returns (means (d, n, 2),
    covs (d, n, 2, 2))."""
    from smoothsde_tpu.ops.kalman_soa import _ctcrw_system

    sys = _ctcrw_system(par_mat, obs, times, ids, sigma_obs, p0_pos, p0_vel)
    scanned = _scan_elements(_combine2, _ID2, sys.elem, scan)
    track_end = jnp.concatenate(
        [sys.reset[1:], jnp.ones((1,), bool)]
    )
    m_s, P_s, _ = rts_smoother_soa(
        sys.Ft, sys.ct, sys.Qt, scanned.b, scanned.C,
        jnp.broadcast_to(track_end, sys.yd.shape), scan,
    )
    means = jnp.stack([m_s[0], m_s[1]], axis=-1)
    covs = jnp.stack(
        [
            jnp.stack([P_s[0][0], P_s[0][1]], axis=-1),
            jnp.stack([P_s[1][0], P_s[1][1]], axis=-1),
        ],
        axis=-2,
    )
    return means, covs
