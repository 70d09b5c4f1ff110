"""Structure-of-arrays (SoA) parallel Kalman filters for the per-dim
small-state models: CTCRW (state = (position, velocity), scalar obs)
and BM/OU SSM (scalar state, scalar obs).

Why this exists: the generic filter in ops/kalman.py stores per-step
matrices as (n, s, s) arrays. On TPU the trailing (s, s) = (2, 2) dims
land on the 8x128 vector registers and waste ~98% of each lane tile;
measured cost at n = 100k was ~46 ms/filter pass. Here every matrix
component is its own (..., n) array (structure-of-arrays), so every
operation in the associative-scan combine is an elementwise VPU op over
the step axis — the layout the hardware actually wants. The math is the
same associative filtering-element algebra as ops/kalman.py (and is
tested to match it exactly); the reference semantics mirrored are the
Kalman loops of nllk_ctcrw.hpp:195-247 / nllk_bm_ssm.hpp:127-175 /
nllk_ou_ssm.hpp:163-213 with per-dim factorization of the isotropic
models.

Elements are pytrees of nested tuples of arrays; the scan axis is the
LAST axis of every leaf.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


# ---- 2x2 tuple algebra (components are arrays, elementwise ops) ----


def _m2(X, Y):
    return (
        (
            X[0][0] * Y[0][0] + X[0][1] * Y[1][0],
            X[0][0] * Y[0][1] + X[0][1] * Y[1][1],
        ),
        (
            X[1][0] * Y[0][0] + X[1][1] * Y[1][0],
            X[1][0] * Y[0][1] + X[1][1] * Y[1][1],
        ),
    )


def _mv(X, v):
    return (
        X[0][0] * v[0] + X[0][1] * v[1],
        X[1][0] * v[0] + X[1][1] * v[1],
    )


def _t2(X):
    return ((X[0][0], X[1][0]), (X[0][1], X[1][1]))


def _madd(X, Y):
    return (
        (X[0][0] + Y[0][0], X[0][1] + Y[0][1]),
        (X[1][0] + Y[1][0], X[1][1] + Y[1][1]),
    )


def _vadd(u, v):
    return (u[0] + v[0], u[1] + v[1])


def _vsub(u, v):
    return (u[0] - v[0], u[1] - v[1])


def _inv2(X):
    det = X[0][0] * X[1][1] - X[0][1] * X[1][0]
    return (
        (X[1][1] / det, -X[0][1] / det),
        (-X[1][0] / det, X[0][0] / det),
    )


def _symm(X):
    off = 0.5 * (X[0][1] + X[1][0])
    return ((X[0][0], off), (off, X[1][1]))


class Element2(NamedTuple):
    """SoA filtering element for state dim 2."""

    A: tuple
    b: tuple
    C: tuple
    eta: tuple
    J: tuple


def _combine2(e1: Element2, e2: Element2) -> Element2:
    CJ = _m2(e1.C, e2.J)
    G = ((1.0 + CJ[0][0], CJ[0][1]), (CJ[1][0], 1.0 + CJ[1][1]))
    M = _inv2(G)
    A2M = _m2(e2.A, M)
    A = _m2(A2M, e1.A)
    b = _vadd(_mv(A2M, _vadd(e1.b, _mv(e1.C, e2.eta))), e2.b)
    C = _symm(_madd(_m2(_m2(A2M, e1.C), _t2(e2.A)), e2.C))
    Nt = _t2(M)
    A1tN = _m2(_t2(e1.A), Nt)
    eta = _vadd(_mv(A1tN, _vsub(e2.eta, _mv(e2.J, e1.b))), e1.eta)
    J = _symm(_madd(_m2(_m2(A1tN, e2.J), e1.A), e1.J))
    return Element2(A, b, C, eta, J)


def _wh(cond, X, Y):
    """jnp.where over matching nested tuples, with the mask broadcast
    explicitly to the operand shape (required for clean transposition:
    lax.select's vjp rejects a (n,) mask against (d, n) cases)."""
    if isinstance(X, tuple):
        return tuple(_wh(cond, x, y) for x, y in zip(X, Y))
    shape = jnp.broadcast_shapes(
        jnp.shape(cond), jnp.shape(X), jnp.shape(Y)
    )
    return jnp.where(
        jnp.broadcast_to(cond, shape),
        jnp.broadcast_to(X, shape),
        jnp.broadcast_to(Y, shape),
    )


_ID2 = Element2(
    A=((1.0, 0.0), (0.0, 1.0)),
    b=(0.0, 0.0),
    C=((0.0, 0.0), (0.0, 0.0)),
    eta=(0.0, 0.0),
    J=((0.0, 0.0), (0.0, 0.0)),
)


def _scan_elements(combine, identity, elem, scan: str, vary_axes=()):
    """Scan dispatch: 'blocked' two-phase lax.scan (TPU-fast, see
    ops/scan_utils.py), plain 'associative', or 'sequential' (lax.scan
    along the last axis — mathematically identical; the reverse-AD-safe
    choice on the CPU backend, see ops/kalman.default_filter_impl).

    vary_axes: mesh axis names to mark the sequential-scan carry as
    varying over (required when called inside shard_map, where a
    replicated identity cannot serve as a scan carry for varying data).
    """
    from smoothsde_tpu.ops.scan_utils import blocked_associative_scan

    if scan == "auto":
        scan = "blocked"
    if scan == "blocked":
        return blocked_associative_scan(combine, identity, elem)
    if scan == "pallas":
        return blocked_associative_scan(
            combine, identity, elem, phase1="pallas"
        )
    if scan == "sequential":
        tm = jax.tree.map(lambda x: jnp.moveaxis(x, -1, 0), elem)
        init = jax.tree.map(
            lambda x, idl: jnp.broadcast_to(
                jnp.asarray(idl, x.dtype), x.shape[1:]
            ),
            tm,
            identity,
        )
        if vary_axes:
            init = jax.tree.map(
                lambda x: jax.lax.pcast(x, tuple(vary_axes), to="varying"),
                init,
            )

        def step(carry, x):
            new = combine(carry, x)
            return new, new

        _, scanned = jax.lax.scan(step, init, tm)
        return jax.tree.map(lambda x: jnp.moveaxis(x, 0, -1), scanned)
    return jax.lax.associative_scan(combine, elem, axis=-1)


class CtcrwSystem(NamedTuple):
    """Per-step SoA system pieces for the s=2 filter (all leaves end in
    the step axis; first axis is the response dimension)."""

    Ft: tuple  # 2x2 transition ENTERING each step
    ct: tuple  # drift entering each step
    Qt: tuple  # 2x2 process noise entering each step
    yd: jax.Array  # (d, n) observations (NaN -> 0)
    h: jax.Array  # scalar observation variance
    reset: jax.Array  # (n,) track starts
    prev_reset: jax.Array
    update: jax.Array  # (n,) measurement update happens
    elem: Element2  # filtering elements
    p0_pos: float
    p0_vel: float


def _ctcrw_system(par_mat, obs, times, ids, sigma_obs, p0_pos=1.0,
                  p0_vel=10.0, dt=None, yd=None, h=None, reset=None,
                  valid=None, pre_shifted=False,
                  prev_reset=None) -> CtcrwSystem:
    """Build the per-step SoA system + filtering elements (shared by the
    likelihood, the smoother, and the analytic-gradient core).

    Pass precomputed `dt` (host f64-derived, see precompute_dt) when
    available: diff() of f32-encoded absolute times quantizes the
    intervals (~3% at t ~ 3e4) and dominates long-horizon f32 error.
    `yd`/`h` override the observation array / variance so a custom_vjp
    core can wire its primal to those arguments (the par-space fused
    path); values must equal what would be computed from obs/sigma_obs.
    `reset`/`valid` override the masks derived from ids/obs for the
    same reason (a custom_vjp primal must not close over traced values
    — it leaks under shard_map); when all of dt/yd/h/reset/valid are
    given, obs/times/ids may be None.

    pre_shifted=True: par_mat and dt already hold the values of the
    transition ENTERING each step (the caller shifted them GLOBALLY —
    required when the steps are a chunk of a longer sequence, where a
    local shift would drop the real transition crossing the chunk
    edge); `prev_reset` must then be supplied (also global).
    """
    dtype = par_mat.dtype
    if yd is not None:
        n_dim, n = yd.shape
    else:
        obs = jnp.asarray(obs)
        n, n_dim = obs.shape

    # sanitize cross-track intervals (clocks restart per track; a
    # negative dt overflows exp(-beta*dt) in f32 and NaN-poisons grads
    # through the masked branches)
    if dt is None:
        times = jnp.asarray(times)
        ids = jnp.asarray(ids)
        same_id = ids[1:] == ids[:-1]
        dt = jnp.concatenate(
            [jnp.where(same_id, jnp.diff(times), 1.0),
             jnp.ones((1,), times.dtype)]
        )
    else:
        dt = jnp.asarray(dt, dtype)
    if reset is None:
        ids = jnp.asarray(ids)
        reset = jnp.concatenate(
            [jnp.ones((1,), bool), ids[1:] != ids[:-1]]
        )
    if valid is None:
        valid = jnp.isfinite(jnp.asarray(obs)[:, 0])
    y = jnp.nan_to_num(obs, nan=0.0) if yd is None else yd.T  # (n, d)

    mu = par_mat[:, :n_dim]  # (n, d)
    tau = jnp.exp(par_mat[:, n_dim])
    nu = jnp.exp(par_mat[:, n_dim + 1])
    beta = 1.0 / tau
    sigma2 = 4.0 * nu * nu / (jnp.pi * tau)  # sigma^2

    # per-step transition (propagates i -> i+1), shared across dims;
    # cancellation-free forms (ops/stable.py) — the direct expressions
    # cost ~3 digits of f32 gradient accuracy at small beta*dt
    from smoothsde_tpu.ops.stable import ctcrw_transition_terms

    tt = ctcrw_transition_terms(beta, sigma2, dt)
    e1, g = tt["e1"], tt["g"]
    t00 = jnp.ones_like(e1)
    t01 = g
    t11 = e1
    q00, q01, q11 = tt["q00"], tt["q01"], tt["q11"]
    bp = tt["bp"][None, :] * mu.T  # (d, n) position drift
    bv = tt["bv"][None, :] * mu.T  # velocity drift

    if h is None:
        h = jnp.asarray(sigma_obs, dtype) ** 2

    # ---- shift to "transition entering step i" and mask resets ----
    if pre_shifted:
        def shift(x, fill=0.0):
            return x  # caller shifted globally (chunk of a sequence)
    else:
        def shift(x, fill=0.0):
            return jnp.concatenate(
                [jnp.full(x.shape[:-1] + (1,), fill, x.dtype),
                 x[..., :-1]],
                axis=-1,
            )

    if prev_reset is None:
        prev_reset = jnp.concatenate(
            [jnp.ones((1,), bool), reset[:-1]]
        )
    no_prop = prev_reset  # identity transition out of a reset
    Ft = (
        (jnp.where(no_prop, 1.0, shift(t00, 1.0)),
         jnp.where(no_prop, 0.0, shift(t01))),
        (jnp.zeros_like(t00),
         jnp.where(no_prop, 1.0, shift(t11, 1.0))),
    )
    Qt = (
        (jnp.where(no_prop, 0.0, shift(q00)),
         jnp.where(no_prop, 0.0, shift(q01))),
        (jnp.where(no_prop, 0.0, shift(q01)),
         jnp.where(no_prop, 0.0, shift(q11))),
    )
    ct = (
        _wh(no_prop, 0.0, shift(bp)),  # (d, n)
        _wh(no_prop, 0.0, shift(bv)),
    )

    yd = y.T  # (d, n)
    update = valid & (~reset)

    # ---- measurement-update element (Z = [1, 0], scalar S) ----
    S = Qt[0][0] + h
    K0 = Qt[0][0] / S
    K1 = Qt[1][0] / S
    r = yd - ct[0]  # innovation against drift (d, n)
    A_upd = (
        ((1.0 - K0) * Ft[0][0], (1.0 - K0) * Ft[0][1]),
        (Ft[1][0] - K1 * Ft[0][0], Ft[1][1] - K1 * Ft[0][1]),
    )
    b_upd = (ct[0] + K0 * r, ct[1] + K1 * r)
    C_upd = (
        ((1.0 - K0) * Qt[0][0], (1.0 - K0) * Qt[0][1]),
        (Qt[1][0] - K1 * Qt[0][0], Qt[1][1] - K1 * Qt[0][1]),
    )
    # Ft' Z' = first row of Ft
    f0, f1 = Ft[0][0], Ft[0][1]
    eta_upd = (f0 * r / S, f1 * r / S)
    J_upd = (
        (f0 * f0 / S, f0 * f1 / S),
        (f0 * f1 / S, f1 * f1 / S),
    )

    # ---- three-way select: reset / propagate-only / update ----
    zero = jnp.zeros_like(yd)
    a0_pos = _wh(reset, yd, 0.0)
    elem = Element2(
        A=_wh(
            reset,
            ((zero, zero), (zero, zero)),
            _wh(update, A_upd, Ft),
        ),
        b=_wh(reset, (a0_pos, zero), _wh(update, b_upd, ct)),
        C=_wh(
            reset,
            ((jnp.full_like(yd, p0_pos), zero),
             (zero, jnp.full_like(yd, p0_vel))),
            _wh(update, C_upd, Qt),
        ),
        eta=_wh(update & (~reset), eta_upd, (zero, zero)),
        J=_wh(
            update & (~reset),
            J_upd,
            ((zero, zero), (zero, zero)),
        ),
    )
    return CtcrwSystem(
        Ft=Ft, ct=ct, Qt=Qt, yd=yd, h=h, reset=reset,
        prev_reset=prev_reset, update=update, elem=elem,
        p0_pos=p0_pos, p0_vel=p0_vel,
    )


def _build_elem2(Ft, ct, Qt, yd, h, reset, update, p0_pos, p0_vel):
    """Filtering elements from system pieces (duplicates the selection
    logic of _ctcrw_system for the custom_vjp core, where (Ft, ct, Qt,
    yd, h) are primal arguments)."""
    S = Qt[0][0] + h
    K0 = Qt[0][0] / S
    K1 = Qt[1][0] / S
    r = yd - ct[0]
    A_upd = (
        ((1.0 - K0) * Ft[0][0], (1.0 - K0) * Ft[0][1]),
        (Ft[1][0] - K1 * Ft[0][0], Ft[1][1] - K1 * Ft[0][1]),
    )
    b_upd = (ct[0] + K0 * r, ct[1] + K1 * r)
    C_upd = (
        ((1.0 - K0) * Qt[0][0], (1.0 - K0) * Qt[0][1]),
        (Qt[1][0] - K1 * Qt[0][0], Qt[1][1] - K1 * Qt[0][1]),
    )
    f0, f1 = Ft[0][0], Ft[0][1]
    eta_upd = (f0 * r / S, f1 * r / S)
    J_upd = ((f0 * f0 / S, f0 * f1 / S), (f0 * f1 / S, f1 * f1 / S))

    zero = jnp.zeros_like(yd)
    a0_pos = _wh(reset, yd, 0.0)
    return Element2(
        A=_wh(reset, ((zero, zero), (zero, zero)), _wh(update, A_upd, Ft)),
        b=_wh(reset, (a0_pos, zero), _wh(update, b_upd, ct)),
        C=_wh(
            reset,
            ((jnp.full_like(yd, p0_pos), zero),
             (zero, jnp.full_like(yd, p0_vel))),
            _wh(update, C_upd, Qt),
        ),
        eta=_wh(update & (~reset), eta_upd, (zero, zero)),
        J=_wh(update & (~reset), J_upd, ((zero, zero), (zero, zero))),
    )


def _llk_from_filtered(sys: CtcrwSystem, m_f, P_f):
    """Elementwise predictive likelihood recovery from filtered moments."""
    Ft, ct, Qt, yd, h = sys.Ft, sys.ct, sys.Qt, sys.yd, sys.h

    def shift(x, fill=0.0):
        return jnp.concatenate(
            [jnp.full(x.shape[:-1] + (1,), fill, x.dtype), x[..., :-1]],
            axis=-1,
        )

    m0p, m1p = shift(m_f[0]), shift(m_f[1])
    P00p, P01p, P11p = shift(P_f[0][0]), shift(P_f[0][1]), shift(P_f[1][1])
    a_pred0 = Ft[0][0] * m0p + Ft[0][1] * m1p + ct[0]
    Pp00 = (
        Ft[0][0] * (Ft[0][0] * P00p + Ft[0][1] * P01p)
        + Ft[0][1] * (Ft[0][0] * P01p + Ft[0][1] * P11p)
        + Qt[0][0]
    )
    a_pred0 = _wh(sys.reset, yd, a_pred0)
    Pp00 = _wh(sys.reset, sys.p0_pos, Pp00)
    F = Pp00 + h
    u = yd - a_pred0
    llk_terms = _wh(sys.update, -0.5 * (jnp.log(F) + u * u / F), 0.0)
    return jnp.sum(llk_terms)


def precompute_dt(times, ids):
    """Host-side f64 inter-observation intervals with cross-track
    sanitization (dt = 1 across ID breaks and at the dummy last slot).

    Absolute times encoded in f32 quantize the diffs (at t ~ 3e4 the
    f32 grid is ~4e-3); the intervals themselves are small and
    f32-exact to ~6e-8 relative, so compute them in f64 BEFORE any
    device cast and feed `dt=` to the filter builders.
    """
    import numpy as np

    t = np.asarray(times, np.float64)
    i = np.asarray(ids)
    same = i[1:] == i[:-1]
    dt = np.where(same, np.diff(t), 1.0)
    return np.concatenate([dt, np.ones(1)])


def ctcrw_loglik_soa(par_mat, obs, times, ids, sigma_obs, p0_pos=1.0,
                     p0_vel=10.0, scan: str = "auto",
                     analytic_grad: bool = False, dt=None):
    """Total CTCRW log-likelihood via the SoA associative-scan filter.

    par_mat: (n, d+2) working scale (mu_1..mu_d, log tau, log nu);
    obs: (n, d) with NaN missing rows (first-response check, as in the
    reference); sigma_obs scalar measurement SD. Matches
    kalman.kalman_loglik on ctcrw_steps to fp tolerance.

    analytic_grad=True routes through the Fisher-identity custom_vjp
    (ops/kalman_smooth.py): backward pass = parallel RTS smoother +
    elementwise score instead of AD through the scan.
    """
    if analytic_grad and scan == "fused":
        return _llk2_fused_par(
            par_mat, obs, times, ids, sigma_obs, p0_pos, p0_vel, dt
        )
    sys = _ctcrw_system(
        par_mat, obs, times, ids, sigma_obs, p0_pos, p0_vel, dt=dt
    )
    if analytic_grad:
        from smoothsde_tpu.ops.kalman_smooth import llk2_analytic

        return llk2_analytic(sys, scan)
    if scan == "fused":
        from smoothsde_tpu.ops.ctcrw_fused import fused_filter

        return fused_filter(sys, want_moments=False)[0]
    scanned = _scan_elements(_combine2, _ID2, sys.elem, scan)
    return _llk_from_filtered(sys, scanned.b, scanned.C)


def _llk2_fused_par(par_mat, obs, times, ids, sigma_obs, p0_pos, p0_vel,
                    dt=None):
    """CTCRW fused-kernel log-likelihood with the PARAMETER-SPACE
    Fisher-identity custom_vjp.

    The vjp boundary sits at (par_mat, yd, h) instead of the element
    arrays (Ft, ct, Qt, ...): the backward kernels rebuild the
    transition pieces from par tiles in-register and contract the
    Fisher cotangents through the par -> element chain rule
    analytically (ops/ctcrw_fused.fused_backward_par), so no XLA
    jvp/transpose chain and only 4 cotangent arrays remain. Value and
    gradient match the element-space path to fp tolerance
    (tests/test_kalman.py TestFusedPallas)."""
    obs = jnp.asarray(obs)
    times = jnp.asarray(times)
    ids = jnp.asarray(ids)
    n, n_dim = obs.shape
    dtype = par_mat.dtype

    same_id = ids[1:] == ids[:-1]
    if dt is None:
        dt = jnp.concatenate(
            [jnp.where(same_id, jnp.diff(times), 1.0),
             jnp.ones((1,), times.dtype)]
        )
    else:
        dt = jnp.asarray(dt, times.dtype)
    reset = jnp.concatenate([jnp.ones((1,), bool), ids[1:] != ids[:-1]])
    prev_reset = jnp.concatenate([jnp.ones((1,), bool), reset[:-1]])
    valid = jnp.isfinite(obs[:, 0])
    update = valid & (~reset)
    yd0 = jnp.nan_to_num(obs, nan=0.0).T  # (d, n)
    h0 = jnp.asarray(sigma_obs, dtype) ** 2

    return _fused_par_core(
        par_mat, yd0, h0, jnp.asarray(dt, dtype),
        reset.astype(dtype), valid.astype(dtype),
        n_dim=n_dim, p0_pos=p0_pos, p0_vel=p0_vel,
    )


def _fused_par_core(par_mat, yd, h, dtv, resetf, validf, *, n_dim,
                    p0_pos, p0_vel):
    """Parameter-space Fisher-identity custom_vjp around the fused
    filter. Every traced value is an EXPLICIT primal argument (masks as
    0/1 floats): a custom_vjp that closes over tracers leaks them when
    traced inside shard_map (the sharded fast path,
    parallel/dist._build_sharded_soa_loglik).

    Single-pass par-space forward: the forward kernels rebuild each
    step's entering transition in-register from the shared 10-row par
    stack (ctcrw_fused.fused_filter_par) instead of materializing the
    XLA-built element arrays, and the SAME stack is saved as the VJP
    residual and fed straight to fused_backward_par(tiles=...) — one
    _stack_tiles pass serves both directions, and the element-build
    pass disappears from the HBM budget entirely.
    SMOOTHSDE_ELEM_FORWARD=1 restores the element-space forward."""
    import os

    from smoothsde_tpu.ops.ctcrw_fused import (
        build_par_stack,
        fused_backward_par,
        fused_filter,
        fused_filter_par,
    )

    d = n_dim
    n = par_mat.shape[0]
    dtype = par_mat.dtype
    # tile geometry — must equal fused_backward_par's internal formula
    # so the shared stack lines up (ctcrw_fused.py fused_backward_par)
    base = 1024 // int(np.gcd(d, 1024))
    NB = base
    while NB * 2 <= min(2048, max(n, base)):
        NB *= 2
    L = -(-n // NB)
    L_pad = -(-L // 16) * 16
    MID = (d * NB) // 128
    geom = dict(d=d, n=n, NB=NB, L=L, L_pad=L_pad, MID=MID, dtype=dtype)

    if os.environ.get("SMOOTHSDE_ELEM_FORWARD"):
        return _fused_par_core_elem(
            par_mat, yd, h, dtv, resetf, validf, n_dim=n_dim,
            p0_pos=p0_pos, p0_vel=p0_vel,
        )

    def _stack(par_mat, yd, dtv, resetf, validf):
        mu = par_mat[:, :d].T  # (d, n)
        lt = par_mat[:, d]
        ln = par_mat[:, d + 1]
        prevf = jnp.concatenate([jnp.ones((1,), dtype), resetf[:-1]])
        updf = validf * (1.0 - resetf)
        te = jnp.concatenate([resetf[1:], jnp.ones((1,), dtype)])
        tv = (1.0 - resetf) * (1.0 - prevf)
        tvn = jnp.concatenate([tv[1:], jnp.zeros((1,), dtype)])
        return build_par_stack(
            mu, lt, ln, dtv, te, tvn, yd, updf, resetf, **geom
        )

    @jax.custom_vjp
    def core(par_mat, yd, h, dtv, resetf, validf):
        tiles, bd = _stack(par_mat, yd, dtv, resetf, validf)
        return fused_filter_par(
            tiles, bd, h, **geom, p0_pos=p0_pos, p0_vel=p0_vel,
            want_moments=False,
        )[0]

    def core_fwd(par_mat, yd, h, dtv, resetf, validf):
        tiles, bd = _stack(par_mat, yd, dtv, resetf, validf)
        llk, m_f, _ = fused_filter_par(
            tiles, bd, h, **geom, p0_pos=p0_pos, p0_vel=p0_vel,
            want_moments=True, tiled_moments=True,
        )
        # residuals: the SHARED stack + tiled moments + h; everything
        # the backward reads is already in tile layout (no par_mat / yd
        # / mask arrays retained — ADVICE r3 item 4 pattern)
        return llk, (tiles, m_f, h)

    def core_bwd(res, gbar):
        tiles, m_f, h = res
        yd_sds = jax.ShapeDtypeStruct((d, n), dtype)
        # tiles= branch: yd supplies only shape/dtype; the mask/par
        # arguments are unused (rows come from the shared stack)
        mubar, ltbar, lnbar, ybar, hbar = fused_backward_par(
            yd_sds, h, None, None, None, p0_pos, p0_vel,
            None, None, None, None, m_f, gbar, tiles=tiles,
        )
        par_bar = jnp.concatenate(
            [mubar.T, ltbar[:, None], lnbar[:, None]], axis=1
        )
        z = jnp.zeros((n,), dtype)
        # dt and the masks are data, not parameters: zero cotangents
        return (
            par_bar, ybar, jnp.reshape(hbar, jnp.shape(h)), z, z, z,
        )

    core.defvjp(core_fwd, core_bwd)
    return core(par_mat, yd, h, dtv, resetf, validf)


def _fused_par_core_elem(par_mat, yd, h, dtv, resetf, validf, *, n_dim,
                         p0_pos, p0_vel):
    """Element-space forward variant of _fused_par_core (the XLA
    element build feeding fused_filter); kept as the
    SMOOTHSDE_ELEM_FORWARD=1 fallback and as the parity oracle for the
    par-space forward kernels."""
    from smoothsde_tpu.ops.ctcrw_fused import (
        fused_backward_par,
        fused_filter,
    )

    def _system(par_mat, yd, h, dtv, resetf, validf):
        return _ctcrw_system(
            par_mat, None, None, None, None, p0_pos, p0_vel,
            dt=dtv, yd=yd, h=h, reset=resetf > 0.5, valid=validf > 0.5,
        )

    @jax.custom_vjp
    def core(par_mat, yd, h, dtv, resetf, validf):
        sys = _system(par_mat, yd, h, dtv, resetf, validf)
        return fused_filter(sys, want_moments=False)[0]

    def core_fwd(par_mat, yd, h, dtv, resetf, validf):
        sys = _system(par_mat, yd, h, dtv, resetf, validf)
        llk, m_f, _ = fused_filter(
            sys, want_moments=True, tiled_moments=True
        )
        return llk, (par_mat, yd, h, dtv, resetf, validf, m_f)

    def core_bwd(res, gbar):
        par_mat, yd, h, dtv, resetf, validf, m_f = res
        reset = resetf > 0.5
        prev_reset = jnp.concatenate(
            [jnp.ones((1,), bool), reset[:-1]]
        )
        update = (validf > 0.5) & (~reset)
        mu = par_mat[:, :n_dim].T  # (d, n)
        lt = par_mat[:, n_dim]
        ln = par_mat[:, n_dim + 1]
        mubar, ltbar, lnbar, ybar, hbar = fused_backward_par(
            yd, h, reset, prev_reset, update, p0_pos, p0_vel,
            mu, lt, ln, dtv, m_f, gbar,
        )
        par_bar = jnp.concatenate(
            [mubar.T, ltbar[:, None], lnbar[:, None]], axis=1
        )
        # dt and the masks are data, not parameters: zero cotangents
        return (
            par_bar, ybar, jnp.reshape(hbar, jnp.shape(h)),
            jnp.zeros_like(dtv), jnp.zeros_like(resetf),
            jnp.zeros_like(validf),
        )

    core.defvjp(core_fwd, core_bwd)
    return core(par_mat, yd, h, dtv, resetf, validf)


def fused_par_core_time_sharded(par_mat, par_ent, yd, h, dt_ent, dtv,
                                resetf, prevresetf, validf,
                                tef, tvnf, *, axis, n_dev, n_dim,
                                p0_pos=1.0, p0_vel=10.0):
    """Time-sharded CTCRW value+gradient on the fused-Pallas kernels.

    Call INSIDE a shard_map body whose `axis` shards the step axis:
    every per-step argument is this device's chunk; h is replicated.
    The forward runs the fused filter on the local chunk, all-gathers
    the 14-component chunk-total filtering elements (O(n_dev * d)
    floats — the only communication), composes the exclusive device
    prefix, and re-scans seeded, so the local moments and likelihood
    terms are globally exact; returns psum(local llk). The backward is
    the mirrored Fisher-identity pass: local reverse totals, an
    all-gather of the 9-component smoothing totals, suffix-seeded score
    kernels. No AD ever crosses the collectives — the RTS smoother IS
    the adjoint of the filter, so d(global llk)/d(local params) comes
    out of the seeded local kernels directly (SURVEY.md §2
    "Parallelism" item 2 at single-chip kernel speed).

    The forward filter builds each step's ENTERING transition from
    par_ent / dt_ent — the GLOBALLY shifted copies of par / dt (a
    chunk-local shift would replace the real transition crossing every
    chunk edge with the identity); the Fisher backward builds each
    step's LEAVING transition from the unshifted par_mat / dtv, so the
    par cotangent lands wholly at the owning slot and par_ent carries
    an (exact) zero cotangent — the outer shift that produced it then
    adds nothing. prevresetf / tef / tvnf: 0/1 masks computed on the
    FULL sequence (they look across chunk edges), sharded like the
    other per-step arguments.
    """
    from smoothsde_tpu.ops.ctcrw_fused import (
        _ID_VALS,
        build_par_stack,
        fused_backward_par,
        fused_filter_par,
    )
    from smoothsde_tpu.ops.kalman_smooth import _combine2_rev, _ID_S2

    dtype = par_mat.dtype
    d = n_dim
    n = par_mat.shape[0]
    # tile geometry — must equal fused_backward_par's internal formula
    base = 1024 // int(np.gcd(d, 1024))
    NB = base
    while NB * 2 <= min(2048, max(n, base)):
        NB *= 2
    L = -(-n // NB)
    L_pad = -(-L // 16) * 16
    MID = (d * NB) // 128
    geom = dict(d=d, n=n, NB=NB, L=L, L_pad=L_pad, MID=MID, dtype=dtype)

    def _stack(par_mat, par_ent, yd, dt_ent, dtv, resetf, prevresetf,
               validf, tef, tvnf):
        # par-space stack over the LOCAL chunk; the lane-boundary
        # tiles come from the GLOBALLY shifted entering copies, which
        # is what lets lane 0 see the previous DEVICE's last par
        mu = par_mat[:, :d].T
        updf = validf * (1.0 - resetf)
        ent = (
            par_ent[:, :d].T, par_ent[:, d], par_ent[:, d + 1],
            dt_ent, prevresetf,
        )
        return build_par_stack(
            mu, par_mat[:, d], par_mat[:, d + 1], dtv, tef, tvnf,
            yd, updf, resetf, **geom, ent=ent,
        )

    def _idx(tree, k):
        return jax.tree.map(lambda x: x[k], tree)

    def stitch_fwd(chunk_total):
        # chunk_total: Element2 of (d,) arrays -> exclusive prefix
        from smoothsde_tpu.ops.ctcrw_fused import _unpack_elem_full

        gathered = jax.tree.map(
            lambda x: jax.lax.all_gather(x, axis), chunk_total
        )  # leaves (n_dev, d)
        my = jax.lax.axis_index(axis)
        pref = _unpack_elem_full(
            [jnp.full((n_dim,), v, dtype) for v in _ID_VALS]
        )
        for k in range(n_dev - 1):
            cand = _combine2(pref, _idx(gathered, k))
            pref = jax.tree.map(
                lambda p, c: jnp.where(k < my, c, p), pref, cand
            )
        return pref

    def stitch_bwd(chunk_total):
        # chunk_total: Smooth2 of (d,) arrays -> exclusive suffix
        gathered = jax.tree.map(
            lambda x: jax.lax.all_gather(x, axis), chunk_total
        )
        my = jax.lax.axis_index(axis)
        suf = jax.tree.map(
            lambda v: jnp.full((n_dim,), v, dtype), _ID_S2
        )
        for k in range(n_dev - 1, 0, -1):
            cand = _combine2_rev(suf, _idx(gathered, k))
            suf = jax.tree.map(
                lambda s, c: jnp.where(my < k, c, s), suf, cand
            )
        return suf

    @jax.custom_vjp
    def core(par_mat, par_ent, yd, h, dt_ent, dtv, resetf, prevresetf,
             validf, tef, tvnf):
        tiles, bd = _stack(
            par_mat, par_ent, yd, dt_ent, dtv, resetf, prevresetf,
            validf, tef, tvnf,
        )
        return fused_filter_par(
            tiles, bd, h, **geom, p0_pos=p0_pos, p0_vel=p0_vel,
            want_moments=False, stitch=stitch_fwd,
        )[0]

    def core_fwd(par_mat, par_ent, yd, h, dt_ent, dtv, resetf,
                 prevresetf, validf, tef, tvnf):
        tiles, bd = _stack(
            par_mat, par_ent, yd, dt_ent, dtv, resetf, prevresetf,
            validf, tef, tvnf,
        )
        llk, m_f, _ = fused_filter_par(
            tiles, bd, h, **geom, p0_pos=p0_pos, p0_vel=p0_vel,
            want_moments=True, tiled_moments=True, stitch=stitch_fwd,
        )
        # residuals: the SHARED par stack + tiled moments + h — one
        # _stack_tiles pass serves both directions, and par_ent /
        # dt_ent (exact-zero cotangents shaped like par_mat / dtv) are
        # not retained (ADVICE r3 #4)
        return llk, (tiles, m_f, h)

    def core_bwd(res, gbar):
        tiles, m_f, h = res
        yd_sds = jax.ShapeDtypeStruct((d, n), dtype)
        mubar, ltbar, lnbar, ybar, hbar = fused_backward_par(
            yd_sds, h, None, None, None, p0_pos, p0_vel,
            None, None, None, None, m_f, gbar,
            stitch=stitch_bwd, tiles=tiles,
        )
        par_bar = jnp.concatenate(
            [mubar.T, ltbar[:, None], lnbar[:, None]], axis=1
        )
        z = jnp.zeros((n,), dtype)
        # par_ent/dt_ent cotangents are exactly zero: the backward
        # scores each slot's LEAVING transition from the unshifted
        # par_mat/dtv, which already accounts for the whole dependence
        return (
            par_bar,
            jnp.zeros_like(par_bar), ybar,  # par_ent
            jnp.reshape(hbar, jnp.shape(h)),
            z,  # dt_ent
            z,  # dtv
            z, z, z, z, z,
        )

    core.defvjp(core_fwd, core_bwd)
    return core(par_mat, par_ent, yd, h, dt_ent, dtv, resetf,
                prevresetf, validf, tef, tvnf)


def diag_ssm_loglik_soa(type, par_mat, obs, times, ids, sigma_obs,
                        p0=10.0, scan: str = "auto", dt=None):
    """BM_SSM / OU_SSM log-likelihood via a scalar-state SoA filter.

    State dim 1: the filtering element reduces to 5 scalars with
    closed-form combine. Matches the generic filter to fp tolerance.
    """
    obs = jnp.asarray(obs)
    times = jnp.asarray(times)
    ids = jnp.asarray(ids)
    n, n_dim = obs.shape
    dtype = par_mat.dtype

    # sanitize cross-track intervals (clocks restart per track; a
    # negative dt overflows exp(-beta*dt) in f32 and NaN-poisons grads
    # through the masked branches)
    same_id = ids[1:] == ids[:-1]
    if dt is None:
        dt = jnp.concatenate(
            [jnp.where(same_id, jnp.diff(times), 1.0),
             jnp.ones((1,), times.dtype)]
        )
    else:
        dt = jnp.asarray(dt, times.dtype)
    reset = jnp.concatenate([jnp.ones((1,), bool), ids[1:] != ids[:-1]])
    valid = jnp.isfinite(obs[:, 0])
    y = jnp.nan_to_num(obs, nan=0.0)

    mu = par_mat[:, :n_dim]
    if type == "BM_SSM":
        sigma = jnp.exp(par_mat[:, n_dim])
        t_s = jnp.ones_like(sigma)
        b_s = dt[None, :] * mu.T
        q_s = sigma**2 * dt
    elif type == "OU_SSM":
        from smoothsde_tpu.ops.stable import ou_transition_terms

        tau = jnp.exp(par_mat[:, n_dim])
        kappa = jnp.exp(par_mat[:, n_dim + 1])
        ot = ou_transition_terms(tau, dt)
        t_s = ot["decay"]
        b_s = ot["bfac"][None, :] * mu.T
        q_s = kappa * ot["qfac"]
    else:
        raise ValueError(type)
    h = jnp.asarray(sigma_obs, dtype) ** 2

    def shift(x, fill=0.0):
        return jnp.concatenate(
            [jnp.full(x.shape[:-1] + (1,), fill, x.dtype), x[..., :-1]],
            axis=-1,
        )

    prev_reset = jnp.concatenate([jnp.ones((1,), bool), reset[:-1]])
    Ft = jnp.where(prev_reset, 1.0, shift(t_s, 1.0))
    Qt = jnp.where(prev_reset, 0.0, shift(q_s))
    ct = jnp.where(prev_reset, 0.0, shift(b_s))

    yd = y.T
    update = valid & (~reset)

    S = Qt + h
    K = Qt / S
    r = yd - ct
    A_upd = (1.0 - K) * Ft
    b_upd = ct + K * r
    C_upd = (1.0 - K) * Qt
    eta_upd = Ft * r / S
    J_upd = Ft * Ft / S

    zero = jnp.zeros_like(yd)
    # broadcast dim-independent components to (d, n): associative_scan
    # needs identical leaf shapes
    bc = lambda x: jnp.broadcast_to(x, yd.shape)  # noqa: E731
    A = bc(jnp.where(reset, 0.0, jnp.where(update, A_upd, Ft)))
    b = jnp.where(reset, yd, jnp.where(update, b_upd, ct))
    C = bc(jnp.where(reset, p0, jnp.where(update, C_upd, Qt)))
    eta = jnp.where(update, eta_upd, zero)
    J = bc(jnp.where(update, J_upd, zero))

    def combine(e1, e2):
        A1, b1, C1, eta1, J1 = e1
        A2, b2, C2, eta2, J2 = e2
        M = 1.0 / (1.0 + C1 * J2)
        A2M = A2 * M
        return (
            A2M * A1,
            A2M * (b1 + C1 * eta2) + b2,
            A2M * C1 * A2 + C2,
            A1 * M * (eta2 - J2 * b1) + eta1,
            A1 * M * J2 * A1 + J1,
        )

    Af, bf, Cf, _, _ = _scan_elements(
        combine, (1.0, 0.0, 0.0, 0.0, 0.0), (A, b, C, eta, J), scan
    )
    m_prev = shift(bf)
    P_prev = shift(Cf)
    a_pred = jnp.where(reset, yd, Ft * m_prev + ct)
    P_pred = jnp.where(reset, p0, Ft * Ft * P_prev + Qt)
    F = P_pred + h
    u = yd - a_pred
    llk_terms = jnp.where(update, -0.5 * (jnp.log(F) + u * u / F), 0.0)
    return jnp.sum(llk_terms)
