"""Linear-Gaussian Kalman filtering: sequential scan and parallel
(associative-scan) forms.

TPU-native replacement for the reference's four near-identical sequential
C++ Kalman loops (/root/reference/src/nllk/nllk_ctcrw.hpp:195-247,
nllk_bm_ssm.hpp:127-175, nllk_ou_ssm.hpp:163-213,
nllk_e_seal_ssm.hpp:163-207). One generic filter parameterized by
per-step system matrices replaces all of them; model-specific step
builders live in smoothsde_tpu/models/ssm.py.

Filter semantics (identical to the reference loops):
  - the carry is the PREDICTED state (a, P) for the current observation;
  - at a track start (`reset`), the carry is re-initialized to (a0, P0)
    and the observation contributes no likelihood;
  - at a missing observation (`valid == False`), predict-only:
    a <- T a + b, P <- T P T' + Q;
  - otherwise: u = y - Z a, F = Z P Z' + H,
    llk += -(log det F + u' F^-1 u)/2,  K = T P Z' F^-1,
    a <- T a + K u + b, P <- T P (T - K Z)' + Q,
    with a predict-only fallback when det F <= 0 (the reference's guard,
    nllk_ctcrw.hpp:226-229);
  - (T_i, b_i, Q_i) propagate from observation i to i+1, i.e. they are
    built from parameter row i and dt_i = t_{i+1} - t_i.

The parallel form follows the associative filtering-element formulation
of Särkkä & García-Fernández (temporal parallelization of Bayesian
smoothers; see also PAPERS.md), extended with per-step drift, missing
observations, and in-scan per-track resets (reset elements are absorbing
under composition). Log-depth over the step axis via
jax.lax.associative_scan; likelihood terms are then recovered with one
embarrassingly parallel elementwise pass.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class KalmanSteps(NamedTuple):
    """Stacked per-step system matrices for one sequence of length n.

    Shapes: s = state dim, m = observation dim.
      T:     (n, s, s) transition, propagates obs i -> i+1
      b:     (n, s)    drift added during propagation
      Q:     (n, s, s) process noise
      Z:     (n, m, s) observation matrix
      H:     (n, m, m) observation noise covariance
      y:     (n, m)    observations (sanitized; see `valid`)
      a0:    (n, s)    initial state mean, used where reset is True
      P0:    (n, s, s) initial state covariance, used where reset is True
      reset: (n,) bool track starts (first element must be True)
      valid: (n,) bool observation present
    """

    T: jax.Array
    b: jax.Array
    Q: jax.Array
    Z: jax.Array
    H: jax.Array
    y: jax.Array
    a0: jax.Array
    P0: jax.Array
    reset: jax.Array
    valid: jax.Array


def _full_precision(fn):
    """Trace the wrapped function under full-f32 matmul precision.

    TPU's DEFAULT dot precision truncates inputs to bfloat16 before the
    MXU — measured 27% relative gradient error on the generic-element
    filter at n = 4096 (tools/assoc_grad_check.jsonl, round 3). The
    filter's matmuls are tiny (s <= 4) so MXU speed is irrelevant, and
    accuracy is load-bearing; pin every dot in this module to HIGHEST.
    The SoA/fused kernels (ops/kalman_soa.py, ops/*_fused.py) are
    matmul-free and unaffected.
    """
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped


def _sym(M):
    return 0.5 * (M + jnp.swapaxes(M, -1, -2))


def _solve_small(A, B):
    """Batched solve A X = B specialized for tiny static sizes.

    For s <= 2 use closed-form inverses (elementwise VPU math — batched
    LU on (n, 2, 2) arrays is far slower on TPU); otherwise fall back
    to jnp.linalg.solve.
    """
    s = A.shape[-1]
    if s == 1:
        return B / A[..., :1, :]
    if s == 2:
        a, b = A[..., 0, 0], A[..., 0, 1]
        c, d = A[..., 1, 0], A[..., 1, 1]
        det = a * d - b * c
        inv = (
            jnp.stack(
                [
                    jnp.stack([d, -b], axis=-1),
                    jnp.stack([-c, a], axis=-1),
                ],
                axis=-2,
            )
            / det[..., None, None]
        )
        return inv @ B
    return jnp.linalg.solve(A, B)


def _slogdet_small(F):
    """Batched slogdet specialized for tiny static sizes."""
    m = F.shape[-1]
    if m == 1:
        d = F[..., 0, 0]
        return jnp.sign(d), jnp.log(jnp.abs(d))
    if m == 2:
        det = F[..., 0, 0] * F[..., 1, 1] - F[..., 0, 1] * F[..., 1, 0]
        return jnp.sign(det), jnp.log(jnp.abs(det))
    return jnp.linalg.slogdet(F)


@_full_precision
def kalman_loglik_sequential(steps: KalmanSteps, with_states: bool = False):
    """Sequential lax.scan filter. Returns (llk, aest_all or None).

    aest_all mirrors the reference's REPORT(aest_all)
    (nllk_ctcrw.hpp:249): row i holds the state estimate after
    processing observation i (the prediction for i+1, or a0 at resets).
    """
    s = steps.T.shape[-1]
    eye = jnp.eye(s, dtype=steps.T.dtype)

    def step(carry, x):
        a, P = carry
        (T, b, Q, Z, H, y, a0, P0, reset, valid) = x

        # Predicted moments for this observation (reset overrides).
        a_pred = jnp.where(reset, a0, a)
        P_pred = jnp.where(reset, P0, P)

        u = y - Z @ a_pred
        F = Z @ P_pred @ Z.T + H
        sign, logdetF = jnp.linalg.slogdet(F)
        ok = valid & (~reset) & (sign > 0) & jnp.isfinite(logdetF)

        F_safe = jnp.where(ok, F, jnp.eye(F.shape[-1], dtype=F.dtype))
        Finv_u = jnp.linalg.solve(F_safe, u)
        llk_i = jnp.where(ok, -0.5 * (logdetF + u @ Finv_u), 0.0)

        # Gain and measurement-updated state (only when ok).
        PZt = P_pred @ Z.T
        K_gain = jnp.linalg.solve(F_safe, PZt.T).T  # P Z' F^-1
        a_filt = jnp.where(ok, a_pred + K_gain @ u, a_pred)
        IKZ = eye - K_gain @ Z
        P_filt = jnp.where(ok, IKZ @ P_pred, P_pred)

        # Propagate to the next observation. A reset state is carried
        # un-propagated: the prediction for the observation after a track
        # start is exactly (a0, P0) (reference reset branch,
        # nllk_ctcrw.hpp:196-200).
        a_prop = T @ a_filt + b
        P_prop = _sym(T @ P_filt @ T.T + Q)
        a_next = jnp.where(reset, a_pred, a_prop)
        P_next = jnp.where(reset, P_pred, P_prop)

        emit = jnp.where(reset, a0, a_next)
        return (a_next, P_next), (llk_i, emit if with_states else 0.0)

    init = (steps.a0[0], steps.P0[0])
    (_, _), (llks, states) = jax.lax.scan(step, init, steps)
    llk = jnp.sum(llks)
    return (llk, states) if with_states else (llk, None)


# ---------------------------------------------------------------------------
# Parallel (associative scan) filter
# ---------------------------------------------------------------------------


class _Element(NamedTuple):
    """Associative filtering element (A, b, C, eta, J)."""

    A: jax.Array
    b: jax.Array
    C: jax.Array
    eta: jax.Array
    J: jax.Array


@_full_precision
def _combine(e1: _Element, e2: _Element) -> _Element:
    """Composition e2 after e1 (both batched on leading axes)."""
    s = e1.A.shape[-1]
    eye = jnp.eye(s, dtype=e1.A.dtype)
    # M = (I + C1 J2)^-1 ; N = (I + J2 C1)^-1 = M^T when C,J symmetric
    C1J2 = e1.C @ e2.J
    M = _solve_small(eye + C1J2, jnp.broadcast_to(eye, C1J2.shape))
    A2M = e2.A @ M
    A = A2M @ e1.A
    b = (A2M @ (e1.b[..., None] + e1.C @ e2.eta[..., None]))[..., 0] + e2.b
    C = _sym(A2M @ e1.C @ jnp.swapaxes(e2.A, -1, -2) + e2.C)
    Nt = jnp.swapaxes(M, -1, -2)  # (I + J2 C1)^-1
    A1tN = jnp.swapaxes(e1.A, -1, -2) @ Nt
    eta = (A1tN @ (e2.eta[..., None] - e2.J @ e1.b[..., None]))[..., 0] + e1.eta
    J = _sym(A1tN @ e2.J @ e1.A + e1.J)
    return _Element(A, b, C, eta, J)


@_full_precision
def _build_elements(steps: KalmanSteps) -> _Element:
    """Vectorized construction of per-step filtering elements.

    The element at index i composes the propagation from i-1 to i
    (identity when i-1 is a reset or i itself is a reset) with the
    measurement update at i (skipped when invalid or reset).
    """
    n, s = steps.b.shape
    eye = jnp.eye(s, dtype=steps.T.dtype)

    # Transition entering step i comes from row i-1.
    prev_reset = jnp.concatenate([jnp.ones((1,), bool), steps.reset[:-1]])
    Ft = jnp.where(
        prev_reset[:, None, None],
        eye,
        jnp.concatenate([eye[None], steps.T[:-1]], axis=0),
    )
    ct = jnp.where(
        prev_reset[:, None],
        0.0,
        jnp.concatenate([jnp.zeros((1, s), steps.b.dtype), steps.b[:-1]], axis=0),
    )
    Qt = jnp.where(
        prev_reset[:, None, None],
        0.0,
        jnp.concatenate([jnp.zeros((1, s, s), steps.Q.dtype), steps.Q[:-1]], axis=0),
    )

    Z, H, y = steps.Z, steps.H, steps.y
    m = Z.shape[1]
    update = steps.valid & (~steps.reset)

    # Measurement-update element pieces: S = Z Q Z' + H must be PD where
    # an update happens; sanitize elsewhere.
    S = Z @ Qt @ jnp.swapaxes(Z, 1, 2) + H
    S_safe = jnp.where(update[:, None, None], S, jnp.eye(m, dtype=S.dtype))
    ZtSinv = jnp.swapaxes(_solve_small(S_safe, Z), 1, 2)  # Z' S^-1
    K = Qt @ ZtSinv  # (n, s, m)
    resid = (y - (Z @ ct[..., None])[..., 0])[..., None]  # (n, m, 1)

    IKZ = eye - K @ Z
    A_upd = IKZ @ Ft
    b_upd = ct + (K @ resid)[..., 0]
    C_upd = _sym(IKZ @ Qt)
    FtZtSinv = jnp.swapaxes(Ft, 1, 2) @ ZtSinv
    eta_upd = (FtZtSinv @ resid)[..., 0]
    J_upd = _sym(FtZtSinv @ Z @ Ft)

    # Three cases per step: reset / propagate-only / propagate+update.
    is_reset = steps.reset
    A = jnp.where(
        is_reset[:, None, None],
        0.0,
        jnp.where(update[:, None, None], A_upd, Ft),
    )
    b = jnp.where(
        is_reset[:, None],
        steps.a0,
        jnp.where(update[:, None], b_upd, ct),
    )
    C = jnp.where(
        is_reset[:, None, None],
        steps.P0,
        jnp.where(update[:, None, None], C_upd, Qt),
    )
    eta = jnp.where(update[:, None], eta_upd, 0.0)
    J = jnp.where(update[:, None, None], J_upd, 0.0)
    return _Element(A, b, C, eta, J)


def _shifted_transitions(steps: KalmanSteps):
    """Transition entering each step (from row i-1; identity out of a
    reset, matching the reference's un-propagated track starts)."""
    n, s = steps.b.shape
    eye = jnp.eye(s, dtype=steps.T.dtype)
    prev_reset = jnp.concatenate([jnp.ones((1,), bool), steps.reset[:-1]])
    Ft = jnp.where(
        prev_reset[:, None, None],
        eye,
        jnp.concatenate([eye[None], steps.T[:-1]], axis=0),
    )
    ct = jnp.where(
        prev_reset[:, None],
        0.0,
        jnp.concatenate([jnp.zeros((1, s), steps.b.dtype), steps.b[:-1]], axis=0),
    )
    Qt = jnp.where(
        prev_reset[:, None, None],
        0.0,
        jnp.concatenate([jnp.zeros((1, s, s), steps.Q.dtype), steps.Q[:-1]], axis=0),
    )
    return Ft, ct, Qt


@_full_precision
def predictive_loglik_terms(steps: KalmanSteps, m_f, P_f):
    """Per-step predictive log-density terms from filtered moments —
    one embarrassingly parallel elementwise pass."""
    Ft, ct, Qt = _shifted_transitions(steps)
    m_prev = jnp.concatenate([steps.a0[:1], m_f[:-1]], axis=0)
    P_prev = jnp.concatenate([steps.P0[:1], P_f[:-1]], axis=0)
    a_pred = jnp.where(
        steps.reset[:, None], steps.a0, (Ft @ m_prev[..., None])[..., 0] + ct
    )
    P_pred = jnp.where(
        steps.reset[:, None, None],
        steps.P0,
        Ft @ P_prev @ jnp.swapaxes(Ft, 1, 2) + Qt,
    )

    Z, H = steps.Z, steps.H
    u = steps.y - (Z @ a_pred[..., None])[..., 0]
    F = Z @ P_pred @ jnp.swapaxes(Z, 1, 2) + H
    update = steps.valid & (~steps.reset)
    m = Z.shape[1]
    F_safe = jnp.where(update[:, None, None], F, jnp.eye(m, dtype=F.dtype))
    sign, logdetF = _slogdet_small(F_safe)
    Finv_u = _solve_small(F_safe, u[..., None])[..., 0]
    return jnp.where(
        update, -0.5 * (logdetF + jnp.sum(u * Finv_u, axis=-1)), 0.0
    )


def kalman_filter_parallel(steps: KalmanSteps):
    """Log-depth parallel Kalman filter.

    Returns (llk, filtered_means (n, s), filtered_covs (n, s, s)).
    Filtered moments are E[x_i | y_{<=i}] within each track, matching the
    sequential filter's measurement-updated states.
    """
    elems = _build_elements(steps)
    scanned = jax.lax.associative_scan(_combine, elems, axis=0)
    m_f, P_f = scanned.b, scanned.C
    llk_terms = predictive_loglik_terms(steps, m_f, P_f)
    return jnp.sum(llk_terms), m_f, P_f


def default_filter_impl() -> str:
    """Pick the filter implementation for the current default backend.

    The log-depth parallel filter is the TPU path. On the CPU backend,
    reverse-mode differentiation through jax.lax.associative_scan is
    affected by an XLA:CPU miscompilation in this environment (jax
    0.9.0: nondeterministic heap corruption / garbage cotangents,
    reproduced standalone; TPU is unaffected), so CPU defaults to the
    sequential scan, whose vjp is solid.
    """
    return "parallel" if jax.default_backend() == "tpu" else "sequential"


def kalman_loglik(steps: KalmanSteps, impl: str = "auto"):
    """Filter log-likelihood with backend-appropriate implementation."""
    if impl == "auto":
        impl = default_filter_impl()
    if impl == "sequential":
        return kalman_loglik_sequential(steps)[0]
    if impl == "parallel":
        return kalman_filter_parallel(steps)[0]
    raise ValueError(f"unknown Kalman impl {impl!r}")


def kalman_loglik_batched(steps: KalmanSteps, impl: str = "auto"):
    """Total log-likelihood over a batch of independent sequences
    (leading axis on every leaf — per-dimension block-diagonal
    factorization or per-track batching). vmap + sum."""
    if impl == "auto":
        impl = default_filter_impl()
    if impl == "sequential":
        fn = lambda s: kalman_loglik_sequential(s)[0]  # noqa: E731
    elif impl == "parallel":
        fn = lambda s: kalman_filter_parallel(s)[0]  # noqa: E731
    else:
        raise ValueError(f"unknown Kalman impl {impl!r}")
    return jnp.sum(jax.vmap(fn)(steps))


def track_pad_plan(ids, max_waste: float = 2.0):
    """Host-side plan to split concatenated multi-track steps into a
    padded (track, step) batch.

    The sequential filter over n concatenated steps is latency-bound on
    TPU (per-scan-step dispatch dwarfs the 2x2 algebra), but tracks are
    independent (the reference skips cross-ID transitions,
    nllk_ctcrw.hpp:196-200) — batching them turns scan depth n into the
    longest single track, with the track axis riding the VPU for free.

    Returns (perm, pad) or None when batching cannot help: perm is an
    (n_tracks, L_max) int32 index map into the concatenated order (each
    row a track's positions, padded by repeating its last position) and
    pad the matching bool mask (True at padding). None when there is a
    single track or when padding would inflate total steps by more than
    `max_waste` (very unequal track lengths).
    """
    import numpy as np

    ids = np.asarray(ids)
    n = ids.shape[0]
    # tracks are contiguous runs of equal ID (constructor-sorted)
    starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
    if len(starts) <= 1:
        return None
    bounds = np.r_[starts, n]
    lengths = np.diff(bounds)
    L = int(lengths.max())
    if len(starts) * L > max_waste * n:
        return None
    perm = np.empty((len(starts), L), np.int32)
    pad = np.zeros((len(starts), L), bool)
    for k, (s, ln) in enumerate(zip(bounds[:-1], lengths)):
        perm[k, :ln] = np.arange(s, s + ln)
        perm[k, ln:] = s + ln - 1
        pad[k, ln:] = True
    return jnp.asarray(perm), jnp.asarray(pad)


def batch_steps_by_track(steps: KalmanSteps, perm, pad) -> KalmanSteps:
    """Reshape batched steps (leaves (B, n, *event)) into per-track
    padded batches (leaves (B * n_tracks, L_max, *event)) per a
    `track_pad_plan`.

    Padding rows repeat the track's last step with valid/reset cleared:
    the carry propagates through them with that step's (finite)
    transition and they contribute zero likelihood, so the batched total
    equals the concatenated filter's exactly.
    """
    K, L = perm.shape

    def g(x):
        out = x[:, perm]  # (B, K, L, *event)
        return out.reshape((x.shape[0] * K, L) + x.shape[2:])

    out = jax.tree.map(g, steps)
    no_pad = ~pad  # (K, L)
    B = steps.valid.shape[0]
    flat = jnp.tile(no_pad, (B, 1))  # (B*K, L)
    return out._replace(valid=out.valid & flat, reset=out.reset & flat)


@_full_precision
def kalman_innovations(steps: KalmanSteps):
    """One-step-ahead innovations for residual diagnostics.

    Returns (u (n, m), F (n, m, m), ok (n,)): prediction errors
    u_i = y_i - Z a_pred,i and predictive covariances F_i = Z P Z' + H
    at every step where a measurement update happens (ok); u/F are
    zero-filled elsewhere. Whitened residuals chol(F)^{-1} u are iid
    N(0, I) under the model — the SSM extension of the reference's
    closed-form residuals (R/sde.R:1186-1228, which error out for SSM
    types).
    """
    s = steps.T.shape[-1]
    eye = jnp.eye(s, dtype=steps.T.dtype)

    def step(carry, x):
        a, P = carry
        (T, b, Q, Z, H, y, a0, P0, reset, valid) = x
        a_pred = jnp.where(reset, a0, a)
        P_pred = jnp.where(reset, P0, P)

        u = y - Z @ a_pred
        F = Z @ P_pred @ Z.T + H
        sign, logdetF = jnp.linalg.slogdet(F)
        ok = valid & (~reset) & (sign > 0) & jnp.isfinite(logdetF)
        F_safe = jnp.where(ok, F, jnp.eye(F.shape[-1], dtype=F.dtype))

        PZt = P_pred @ Z.T
        K_gain = jnp.linalg.solve(F_safe, PZt.T).T
        a_filt = jnp.where(ok, a_pred + K_gain @ u, a_pred)
        P_filt = jnp.where(ok, (eye - K_gain @ Z) @ P_pred, P_pred)
        a_prop = T @ a_filt + b
        P_prop = _sym(T @ P_filt @ T.T + Q)
        a_next = jnp.where(reset, a_pred, a_prop)
        P_next = jnp.where(reset, P_pred, P_prop)
        return (a_next, P_next), (
            jnp.where(ok, u, 0.0),
            jnp.where(ok, F, jnp.eye(F.shape[-1], dtype=F.dtype)),
            ok,
        )

    init = (steps.a0[0], steps.P0[0])
    (_, _), (u, F, ok) = jax.lax.scan(step, init, steps)
    return u, F, ok


@_full_precision
def filtered_to_reported_states(steps: KalmanSteps, m_f: jax.Array):
    """Convert filtered means to the reference's aest_all convention
    (propagated one step forward; a0 at resets), nllk_ctcrw.hpp:230-246."""
    prop = (steps.T @ m_f[..., None])[..., 0] + steps.b
    return jnp.where(steps.reset[:, None], steps.a0, prop)
