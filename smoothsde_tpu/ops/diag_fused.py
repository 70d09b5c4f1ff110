"""Fused Pallas filter + Fisher-identity backward for the scalar-state
SSMs (BM_SSM / OU_SSM, per response dimension).

Same two-pass recompute-instead-of-store design as ops/ctcrw_fused.py,
specialized to state dim 1: filtering elements are 5 scalars
(A, b, C, eta, J), smoothing elements are 3 (E, g, L), and every
operation is closed-form scalar arithmetic over (8, 128) lane tiles.

Model conventions follow ops/kalman_soa.diag_ssm_loglik_soa: per-step
transition x_i -> x_{i+1} given by (t_i, c_i, q_i) shifted/masked so the
state is frozen across each track's first interval, observation
y_i = x_i + N(0, h), prior N(y_s, p0) at reset indices (reference
loops: nllk_bm_ssm.hpp:127-175, nllk_ou_ssm.hpp:163-213).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def _interpret() -> bool:
    return bool(int(os.environ.get("SMOOTHSDE_PALLAS_INTERPRET", "0")))


class _Tiles1(NamedTuple):
    t: jax.Array  # transition entering step i
    q: jax.Array
    c: jax.Array
    y: jax.Array
    rst: jax.Array
    upd: jax.Array


def _elem1(t, h, p0, l):
    """(A, b, C, eta, J) filtering element at step l, branch-free."""
    tt = t.t[l]
    q = t.q[l]
    c = t.c[l]
    y = t.y[l]
    R = t.rst[l]
    U = t.upd[l]
    S = q + h
    K = q / S
    r = y - c
    prop = (1.0 - R) * (1.0 - U)
    updm = (1.0 - R) * U
    A = updm * (1.0 - K) * tt + prop * tt
    b = R * y + updm * (c + K * r) + prop * c
    C = R * p0 + updm * (1.0 - K) * q + prop * q
    eta = updm * tt * r / S
    J = updm * tt * tt / S
    return A, b, C, eta, J


def _comb1(e1, e2):
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


def _comb1_rev(acc, new):
    """Smoothing composition: new applied outside the accumulator."""
    Ea, ga, La = acc
    En, gn, Ln = new
    return (En * Ea, En * ga + gn, En * En * La + Ln)


_ID1 = (1.0, 0.0, 0.0, 0.0, 0.0)
_ID1_SM = (1.0, 0.0, 0.0)


def _plan(d, n):
    base = 1024 // int(np.gcd(d, 1024))
    NB = base
    while NB * 2 <= min(2048, max(n, base)):
        NB *= 2
    L = -(-n // NB)
    L_CH = 16
    L_pad = -(-L // L_CH) * L_CH
    lanes = d * NB
    return NB, L, L_CH, L_pad, lanes, lanes // 128, L_pad // L_CH


# stacked tile layout helpers shared with the s=2 kernels: all per-step
# inputs travel as ONE (L_pad, k, MID, 128) array (one HBM buffer, one
# BlockSpec, one fused materialization pass)
from smoothsde_tpu.ops.ctcrw_fused import (  # noqa: E402
    _Row,
    _stack_tiles,
    _unstack_tiles,
)


class DiagSystem(NamedTuple):
    """Per-step scalar system (all (d, n) or (n,) arrays)."""

    t: jax.Array
    q: jax.Array
    c: jax.Array
    yd: jax.Array
    h: jax.Array
    reset: jax.Array
    prev_reset: jax.Array
    update: jax.Array
    p0: float


def diag_system(type, par_mat, obs, times, ids, sigma_obs, p0=10.0, dt=None):
    """Build the shifted/masked per-step scalar system (mirrors
    kalman_soa.diag_ssm_loglik_soa's preamble)."""
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
        tau = jnp.exp(par_mat[:, n_dim])
        kappa = jnp.exp(par_mat[:, n_dim + 1])
        decay = jnp.exp(-dt / tau)
        t_s = decay
        b_s = (1.0 - decay)[None, :] * mu.T
        q_s = kappa * (1.0 - decay**2)
    else:
        raise ValueError(type)
    h = jnp.asarray(sigma_obs, dtype) ** 2

    def shift(x, fill=0.0):
        return jnp.concatenate(
            [jnp.full(x.shape[:-1] + (1,), fill, x.dtype), x[..., :-1]],
            axis=-1,
        )

    prev_reset = jnp.concatenate([jnp.ones((1,), bool), reset[:-1]])
    t_in = jnp.where(prev_reset, 1.0, shift(t_s, 1.0))
    q_in = jnp.where(prev_reset, 0.0, shift(q_s))
    c_in = jnp.where(
        jnp.broadcast_to(prev_reset, (n_dim, n)), 0.0, shift(b_s)
    )
    return DiagSystem(
        t=t_in, q=q_in, c=c_in, yd=y.T, h=h, reset=reset,
        prev_reset=prev_reset, update=valid & (~reset), p0=float(p0),
    )


DIAG_IDENTITY = (1.0, 0.0, 0.0, 0.0, 0.0)


def diag_elements(sysd: DiagSystem):
    """Vectorized (A, b, C, eta, J) filtering elements from a
    DiagSystem — the XLA-level SoA form (leaves (d, n)), combine with
    `_comb1` / identity `DIAG_IDENTITY`. Shared by the time-sharded
    scan (parallel/time_scan.py)."""
    t, q, c, yd, h = sysd.t, sysd.q, sysd.c, sysd.yd, sysd.h
    reset, update = sysd.reset, sysd.update
    S = q + h
    K = q / S
    r = yd - c
    A_upd = (1.0 - K) * t
    b_upd = c + K * r
    C_upd = (1.0 - K) * q
    eta_upd = t * r / S
    J_upd = t * t / S
    zero = jnp.zeros_like(yd)
    bc = lambda x: jnp.broadcast_to(x, yd.shape)  # noqa: E731
    A = bc(jnp.where(reset, 0.0, jnp.where(update, A_upd, t)))
    b = jnp.where(reset, yd, jnp.where(update, b_upd, c))
    C = bc(jnp.where(reset, sysd.p0, jnp.where(update, C_upd, q)))
    eta = jnp.where(update, eta_upd, zero)
    J = bc(jnp.where(update, J_upd, zero))
    return (A, b, C, eta, J)


def diag_llk_from_filtered(sysd: DiagSystem, bf, Cf):
    """Predictive log-likelihood recovery from filtered scalar moments
    (elementwise; mirrors kalman_soa.diag_ssm_loglik_soa's tail)."""

    def shift(x, fill=0.0):
        return jnp.concatenate(
            [jnp.full(x.shape[:-1] + (1,), fill, x.dtype), x[..., :-1]],
            axis=-1,
        )

    m_prev = shift(bf)
    P_prev = shift(Cf)
    a_pred = jnp.where(sysd.reset, sysd.yd, sysd.t * m_prev + sysd.c)
    P_pred = jnp.where(sysd.reset, sysd.p0, sysd.t**2 * P_prev + sysd.q)
    F = P_pred + sysd.h
    u = sysd.yd - a_pred
    return jnp.sum(
        jnp.where(sysd.update, -0.5 * (jnp.log(F) + u * u / F), 0.0)
    )


def _diag_fwd(t, q, c, yd, h, resetf, updatef, p0, stitch=None):
    """Fused diag forward: (llk, tiled moments).

    stitch: optional callable mapping this call's chunk-total filtering
    element (5-tuple of (d,) arrays) to the exclusive device-PREFIX
    element — the time-sharded composition hook, mirroring
    ctcrw_fused.fused_filter's stitch."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d, n = yd.shape
    dtype = yd.dtype
    NB, L, L_CH, L_pad, lanes, MID, n_lc = _plan(d, n)
    raw = [t, q, c, yd, resetf, updatef]
    pad_vals = [1.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    tiles = _stack_tiles(raw, pad_vals, d, n, NB, L, L_pad, MID, dtype)
    h_arr = jnp.asarray(h, dtype).reshape(1, 1)
    grid = (MID // 8, n_lc)
    in_spec = pl.BlockSpec(
        (L_CH, 6, 8, 128), lambda m, lc: (lc, 0, m, 0),
        memory_space=pltpu.VMEM,
    )
    mom_spec = pl.BlockSpec(
        (L_CH, 2, 8, 128), lambda m, lc: (lc, 0, m, 0),
        memory_space=pltpu.VMEM,
    )
    tot_spec = pl.BlockSpec(
        (8, 128), lambda m, lc: (m, 0), memory_space=pltpu.VMEM
    )
    h_spec = pl.BlockSpec(
        (1, 1), lambda m, lc: (0, 0), memory_space=pltpu.SMEM
    )

    def totals_kernel(h_ref, in_ref, *refs):
        ins = _Tiles1(*(_Row(in_ref, i) for i in range(6)))
        outs = refs[:5]
        car = refs[5:]
        lc = pl.program_id(1)
        hh = h_ref[0, 0]

        @pl.when(lc == 0)
        def _():
            for i in range(5):
                car[i][...] = jnp.full((8, 128), _ID1[i], dtype)

        cur = tuple(r[...] for r in car)
        for l in range(L_CH):
            cur = _comb1(cur, _elem1(ins, hh, p0, l))
        for i in range(5):
            car[i][...] = cur[i]

        @pl.when(lc == n_lc - 1)
        def _():
            for i in range(5):
                outs[i][...] = car[i][...]

    totals = pl.pallas_call(
        totals_kernel,
        grid=grid,
        in_specs=[h_spec, in_spec],
        out_specs=[tot_spec] * 5,
        out_shape=[jax.ShapeDtypeStruct((MID, 128), dtype)] * 5,
        scratch_shapes=[pltpu.VMEM((8, 128), dtype)] * 5,
        interpret=_interpret(),
    )(h_arr, tiles)

    RPD = NB // 128
    if NB % 128 == 0 and RPD & (RPD - 1) == 0:
        # single-launch cross-block scan (the XLA associative_scan
        # unrolls into thousands of tiny HLOs; ctcrw_fused)
        from smoothsde_tpu.ops.ctcrw_fused import _block_prefix_pallas

        excl_tiles = _block_prefix_pallas(
            list(totals), list(_ID1), tuple, list, _comb1,
            NB, MID, dtype, reverse=False, interpret=_interpret(),
        )
    else:
        tot_dnb = tuple(
            x.reshape(lanes).reshape(d, NB) for x in totals
        )
        incl = jax.lax.associative_scan(_comb1, tot_dnb, axis=-1)
        excl = [
            jnp.concatenate(
                [jnp.full((d, 1), _ID1[i], dtype), x[:, :-1]], axis=1
            )
            for i, x in enumerate(incl)
        ]
        excl_tiles = [
            x.reshape(lanes).reshape(MID, 128) for x in excl
        ]

    if stitch is not None:
        # chunk-total element per dim = excl-at-last-block composed
        # with that block's total; seed every block's prefix with the
        # device prefix returned by stitch
        last_idx = (np.arange(d) + 1) * NB - 1
        excl_last = tuple(x.reshape(lanes)[last_idx] for x in excl_tiles)
        tot_last = tuple(x.reshape(lanes)[last_idx] for x in totals)
        chunk_total = _comb1(excl_last, tot_last)
        seed = stitch(chunk_total)
        lane_dim = np.arange(lanes) // NB

        def _expand(cv):
            return jnp.take(cv, lane_dim, axis=0).reshape(MID, 128)

        seed_e = tuple(_expand(cv) for cv in seed)
        excl_tiles = list(_comb1(seed_e, tuple(excl_tiles)))

    def scan_kernel(h_ref, in_ref, *refs):
        ins = _Tiles1(*(_Row(in_ref, i) for i in range(6)))
        pref = refs[:5]
        mom_out, llk_out = refs[5], refs[6]
        car = refs[7:12]
        lacc = refs[12]
        lc = pl.program_id(1)
        hh = h_ref[0, 0]

        @pl.when(lc == 0)
        def _():
            for i in range(5):
                car[i][...] = pref[i][...]
            lacc[...] = jnp.zeros((8, 128), dtype)

        cur = tuple(r[...] for r in car)
        acc = lacc[...]
        for l in range(L_CH):
            a_pred = ins.t[l] * cur[1] + ins.c[l]
            Pp = ins.t[l] * ins.t[l] * cur[2] + ins.q[l]
            F = Pp + hh
            u = ins.y[l] - a_pred
            acc = acc + ins.upd[l] * (-0.5) * (jnp.log(F) + u * u / F)
            cur = _comb1(cur, _elem1(ins, hh, p0, l))
            mom_out[l, 0] = cur[1]
            mom_out[l, 1] = cur[2]
        for i in range(5):
            car[i][...] = cur[i]
        lacc[...] = acc

        @pl.when(lc == n_lc - 1)
        def _():
            llk_out[...] = lacc[...]

    outs = pl.pallas_call(
        scan_kernel,
        grid=grid,
        in_specs=[h_spec, in_spec] + [tot_spec] * 5,
        out_specs=[mom_spec, tot_spec],
        out_shape=(
            jax.ShapeDtypeStruct((L_pad, 2, MID, 128), dtype),
            jax.ShapeDtypeStruct((MID, 128), dtype),
        ),
        scratch_shapes=[pltpu.VMEM((8, 128), dtype)] * 6,
        interpret=_interpret(),
    )(h_arr, tiles, *excl_tiles)
    # moments stay in the kernel's stacked tile layout — they are
    # only ever consumed by the backward (rows: m_f, P_f); padded
    # slots hold real pos-def filter states, which form identity
    # smoothing elements under t = 1 / q = 0 / te = 0 (see
    # smooth_elem: G = 1, g = 0, L = 0)
    return jnp.sum(outs[1]), outs[0]


def _diag_bwd(tn, qn, cn, te, tvn, yd, resetf, updatef, h, mom, p0,
              stitch=None):
    """Fused diag smoother + Fisher score over LEAVING-transition rows.

    tn / qn / cn hold the transition LEAVING slot i at row i (the
    sb-shifts of the entering arrays for a whole sequence; globally
    shifted copies for a time chunk — a local shift would lose the
    cross-chunk transition). Returns per-slot cotangents in the SAME
    leaving indexing: (c_t, c_q, c_c, c_y, hbar_sum) — callers apply
    gbar and any indexing shift.

    stitch: optional chunk-total (3-tuple of (d,)) -> exclusive device
    SUFFIX hook (time sharding)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d, n = yd.shape
    dtype = yd.dtype
    NB, L, L_CH, L_pad, lanes, MID, n_lc = _plan(d, n)

    raw = [tn, qn, cn, te, tvn, yd, updatef, resetf]
    # identity smoothing elements in padding: q = 0, t = 1, te = 0
    # -> G = 1, g = 0, L = 0 (the moment rows carry real pos-def
    # filter states in their padded slots, see _diag_fwd)
    pad_vals = [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    tiles = _stack_tiles(raw, pad_vals, d, n, NB, L, L_pad, MID, dtype)
    h_arr = jnp.asarray(h, dtype).reshape(1, 1)
    grid = (MID // 8, n_lc)
    rev_spec = pl.BlockSpec(
        (L_CH, 8, 8, 128), lambda m, lc: (n_lc - 1 - lc, 0, m, 0),
        memory_space=pltpu.VMEM,
    )
    mf_spec = pl.BlockSpec(
        (L_CH, 2, 8, 128), lambda m, lc: (n_lc - 1 - lc, 0, m, 0),
        memory_space=pltpu.VMEM,
    )
    cot_spec = pl.BlockSpec(
        (L_CH, 4, 8, 128), lambda m, lc: (n_lc - 1 - lc, 0, m, 0),
        memory_space=pltpu.VMEM,
    )
    tot_spec = pl.BlockSpec(
        (8, 128), lambda m, lc: (m, 0), memory_space=pltpu.VMEM
    )
    h_spec = pl.BlockSpec(
        (1, 1), lambda m, lc: (0, 0), memory_space=pltpu.SMEM
    )

    def _ins(in_ref, mf_ref):
        # field order as the kernels index it:
        # 0 t, 1 q, 2 c, 3 m_f, 4 P_f, 5 te, 6 tvn, 7 y, 8 upd, 9 rst
        return (
            _Row(in_ref, 0), _Row(in_ref, 1), _Row(in_ref, 2),
            _Row(mf_ref, 0), _Row(mf_ref, 1),
            _Row(in_ref, 3), _Row(in_ref, 4), _Row(in_ref, 5),
            _Row(in_ref, 6), _Row(in_ref, 7),
        )

    def smooth_elem(ins, l):
        tn, qn, cn, mf, Pf, TE = (
            ins[0][l], ins[1][l], ins[2][l], ins[3][l], ins[4][l],
            ins[5][l],
        )
        Pp = tn * tn * Pf + qn
        G = Pf * tn / Pp
        g = mf - G * (tn * mf + cn)
        Lm = Pf - G * G * Pp
        nTE = 1.0 - TE
        return (nTE * G, TE * mf + nTE * g, TE * Pf + nTE * Lm), G

    def sm_totals_kernel(h_ref, in_ref, mf_ref, *refs):
        ins = _ins(in_ref, mf_ref)
        outs = refs[:3]
        car = refs[3:]
        lc = pl.program_id(1)

        @pl.when(lc == 0)
        def _():
            for i in range(3):
                car[i][...] = jnp.full((8, 128), _ID1_SM[i], dtype)

        acc = tuple(r[...] for r in car)
        for l in reversed(range(L_CH)):
            e, _ = smooth_elem(ins, l)
            acc = _comb1_rev(acc, e)
        for i in range(3):
            car[i][...] = acc[i]

        @pl.when(lc == n_lc - 1)
        def _():
            for i in range(3):
                outs[i][...] = car[i][...]

    totals = pl.pallas_call(
        sm_totals_kernel,
        grid=grid,
        in_specs=[h_spec, rev_spec, mf_spec],
        out_specs=[tot_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((MID, 128), dtype)] * 3,
        scratch_shapes=[pltpu.VMEM((8, 128), dtype)] * 3,
        interpret=_interpret(),
    )(h_arr, tiles, mom)

    RPD = NB // 128
    if NB % 128 == 0 and RPD & (RPD - 1) == 0:
        from smoothsde_tpu.ops.ctcrw_fused import _block_prefix_pallas

        excl_tiles = _block_prefix_pallas(
            list(totals), list(_ID1_SM), tuple, list, _comb1_rev,
            NB, MID, dtype, reverse=True, interpret=_interpret(),
        )
    else:
        tot_dnb = tuple(
            x.reshape(lanes).reshape(d, NB) for x in totals
        )
        flipped = jax.tree.map(lambda x: jnp.flip(x, -1), tot_dnb)
        incl = jax.lax.associative_scan(_comb1_rev, flipped, axis=-1)
        incl = jax.tree.map(lambda x: jnp.flip(x, -1), incl)
        excl = [
            jnp.concatenate(
                [x[:, 1:], jnp.full((d, 1), _ID1_SM[i], dtype)],
                axis=1,
            )
            for i, x in enumerate(incl)
        ]
        excl_tiles = [
            x.reshape(lanes).reshape(MID, 128) for x in excl
        ]

    if stitch is not None:
        # total reverse element of THIS chunk per dim: suffix at each
        # dim's FIRST block composed (outside) with that block's total;
        # seed every block's suffix with the device suffix from stitch
        first_idx = np.arange(d) * NB
        excl_first = tuple(x.reshape(lanes)[first_idx] for x in excl_tiles)
        tot_first = tuple(x.reshape(lanes)[first_idx] for x in totals)
        chunk_total = _comb1_rev(excl_first, tot_first)
        seed = stitch(chunk_total)
        lane_dim = np.arange(lanes) // NB

        def _expand(cv):
            return jnp.take(cv, lane_dim, axis=0).reshape(MID, 128)

        seed_e = tuple(_expand(cv) for cv in seed)
        excl_tiles = list(_comb1_rev(seed_e, tuple(excl_tiles)))

    def score_kernel(h_ref, in_ref, mf_ref, *refs):
        ins = _ins(in_ref, mf_ref)
        pref = refs[:3]
        cot = refs[3]  # rows: tbar qbar cbar ybar
        hbar_out = refs[4]
        car = refs[5:8]
        hacc = refs[8]
        lc = pl.program_id(1)
        hh = h_ref[0, 0]

        @pl.when(lc == 0)
        def _():
            for i in range(3):
                car[i][...] = pref[i][...]
            hacc[...] = jnp.zeros((8, 128), dtype)

        acc = tuple(r[...] for r in car)
        ha = hacc[...]
        for l in reversed(range(L_CH)):
            ms1, Ps1 = acc[1], acc[2]
            e, G = smooth_elem(ins, l)
            acc = _comb1_rev(acc, e)
            ms, Ps = acc[1], acc[2]

            TVn = ins[6][l]
            tn = ins[0][l]
            cn = ins[2][l]
            qs = TVn * ins[1][l] + (1.0 - TVn)
            qi = 1.0 / qs
            C = Ps1 * G  # lag-one Cov(x_{i+1}, x_i | y)
            Exx = Ps + ms * ms
            Ex2x1 = C + ms1 * ms
            rb = ms1 - tn * ms - cn
            tb = qi * (Ex2x1 - tn * Exx - cn * ms)
            cb = qi * rb
            Err = Ps1 + tn * tn * Ps - 2.0 * tn * C + rb * rb
            qb = 0.5 * (qi * Err * qi - qi)
            cot[l, 0] = TVn * tb
            cot[l, 1] = TVn * qb
            cot[l, 2] = TVn * cb
            U = ins[8][l]
            R = ins[9][l]
            resid = ins[7][l] - ms
            cot[l, 3] = U * (-resid / hh) + R * (-resid / p0)
            ha = ha + U * (0.5 * (resid * resid + Ps) / (hh * hh)
                           - 0.5 / hh)
        for i in range(3):
            car[i][...] = acc[i]
        hacc[...] = ha

        @pl.when(lc == n_lc - 1)
        def _():
            hbar_out[...] = hacc[...]

    outs = pl.pallas_call(
        score_kernel,
        grid=grid,
        in_specs=[h_spec, rev_spec, mf_spec] + [tot_spec] * 3,
        out_specs=[cot_spec, tot_spec],
        out_shape=(
            jax.ShapeDtypeStruct((L_pad, 4, MID, 128), dtype),
            jax.ShapeDtypeStruct((MID, 128), dtype),
        ),
        scratch_shapes=[pltpu.VMEM((8, 128), dtype)] * 4,
        interpret=_interpret(),
    )(h_arr, tiles, mom, *excl_tiles)

    c_t, c_q, c_c, c_y = _unstack_tiles(outs[0], d, n, NB, L, L_pad, MID)
    return c_t, c_q, c_c, c_y, jnp.sum(outs[1])


def diag_fused_loglik(sys: DiagSystem):
    """Fused forward + Fisher-identity custom_vjp log-likelihood.

    The masks ride as EXPLICIT primal arguments (0/1 floats) rather
    than closure state: a custom_vjp that closes over traced values
    leaks tracers when traced inside shard_map (the sharded fast path,
    parallel/dist._build_sharded_soa_loglik)."""
    p0 = sys.p0

    @jax.custom_vjp
    def core(t, q, c, yd, h, resetf, updatef):
        return _diag_fwd(t, q, c, yd, h, resetf, updatef, p0)[0]

    def core_fwd(t, q, c, yd, h, resetf, updatef):
        llk, mom = _diag_fwd(t, q, c, yd, h, resetf, updatef, p0)
        return llk, (t, q, c, yd, h, resetf, updatef, mom)

    def core_bwd(res, gbar):
        t, q, c, yd, h, resetf, updatef, mom = res
        reset = resetf > 0.5
        prev_reset = jnp.concatenate([jnp.ones((1,), bool), reset[:-1]])
        dtype = yd.dtype
        sb = lambda x: jnp.concatenate(  # noqa: E731
            [x[..., 1:], jnp.zeros(x.shape[:-1] + (1,), x.dtype)], axis=-1
        )
        sb1 = lambda x: jnp.concatenate(  # noqa: E731
            [x[..., 1:], jnp.ones(x.shape[:-1] + (1,), x.dtype)], axis=-1
        )
        te = jnp.concatenate([reset[1:], jnp.ones((1,), bool)])
        tv = (~reset) & (~prev_reset)
        tvn = sb(tv.astype(dtype))

        c_t, c_q, c_c, c_y, hsum = _diag_bwd(
            sb1(t), sb(q), sb(c), te.astype(dtype), tvn, yd,
            resetf, updatef, h, mom, p0,
        )
        c_t, c_q, c_c, c_y = (gbar * x for x in (c_t, c_q, c_c, c_y))
        hbar = gbar * hsum

        def fwd1(x):
            return jnp.concatenate(
                [jnp.zeros(x.shape[:-1] + (1,), x.dtype), x[..., :-1]],
                axis=-1,
            )

        # leaving-slot cotangents -> entering-array indexing (slot i's
        # leaving transition is the entering array's slot i+1)
        tbar = jnp.sum(fwd1(c_t), axis=0)
        qbar = jnp.sum(fwd1(c_q), axis=0)
        cbar = fwd1(c_c)
        # masks are data, not parameters: zero cotangents
        return (tbar, qbar, cbar, c_y, hbar.reshape(jnp.shape(h)),
                jnp.zeros_like(resetf), jnp.zeros_like(updatef))

    core.defvjp(core_fwd, core_bwd)
    dtype = sys.yd.dtype
    return core(sys.t, sys.q, sys.c, sys.yd, sys.h,
                sys.reset.astype(dtype), sys.update.astype(dtype))


def diag_fused_core_time_sharded(t, q, c, tn, qn, cn, te, tvn, yd, h,
                                 resetf, updatef, *, axis, n_dev,
                                 p0=10.0):
    """Time-sharded diag (scalar-state) value+gradient on the fused
    kernels — the BM_SSM / OU_SSM mirror of
    kalman_soa.fused_par_core_time_sharded (SURVEY §2 Parallelism 2 at
    single-chip kernel speed for the diag family; nllk_bm_ssm.hpp
    127-175 is the reference's sequential loop).

    Call INSIDE a shard_map body whose `axis` shards the step axis.
    Entering rows (t, q, c) AND leaving rows (tn, qn, cn) plus the
    look-ahead masks (te, tvn) must be computed on the FULL sequence
    and sharded like the data — local shifts would replace every
    cross-chunk transition with the identity. The forward all-gathers
    the 5-component chunk-total filtering elements, the backward the
    3-component smoothing totals; no AD crosses the collectives.

    The Fisher score lands wholly on the LEAVING rows (tn, qn, cn);
    the entering rows carry exact-zero cotangents — outer code derives
    both from the same per-step scalars, so the chain rule sums to the
    full gradient (same split as fused_par_core_time_sharded's
    par/par_ent). Returns the LOCAL llk scalar (sum over devices done
    by the caller outside shard_map)."""
    dtype = yd.dtype
    d = yd.shape[0]

    def _idx(tree, k):
        return tuple(x[k] for x in tree)

    def stitch_fwd(chunk_total):
        gathered = tuple(
            jax.lax.all_gather(x, axis) for x in chunk_total
        )  # leaves (n_dev, d)
        my = jax.lax.axis_index(axis)
        pref = tuple(jnp.full((d,), v, dtype) for v in _ID1)
        for k in range(n_dev - 1):
            cand = _comb1(pref, _idx(gathered, k))
            pref = tuple(
                jnp.where(k < my, cv, pv) for pv, cv in zip(pref, cand)
            )
        return pref

    def stitch_bwd(chunk_total):
        gathered = tuple(
            jax.lax.all_gather(x, axis) for x in chunk_total
        )
        my = jax.lax.axis_index(axis)
        suf = tuple(jnp.full((d,), v, dtype) for v in _ID1_SM)
        for k in range(n_dev - 1, 0, -1):
            cand = _comb1_rev(suf, _idx(gathered, k))
            suf = tuple(
                jnp.where(my < k, cv, sv) for sv, cv in zip(suf, cand)
            )
        return suf

    @jax.custom_vjp
    def core(t, q, c, tn, qn, cn, te, tvn, yd, h, resetf, updatef):
        return _diag_fwd(
            t, q, c, yd, h, resetf, updatef, p0, stitch=stitch_fwd
        )[0]

    def core_fwd(t, q, c, tn, qn, cn, te, tvn, yd, h, resetf, updatef):
        llk, mom = _diag_fwd(
            t, q, c, yd, h, resetf, updatef, p0, stitch=stitch_fwd
        )
        return llk, (tn, qn, cn, te, tvn, yd, h, resetf, updatef, mom)

    def core_bwd(res, gbar):
        tn, qn, cn, te, tvn, yd, h, resetf, updatef, mom = res
        c_t, c_q, c_c, c_y, hsum = _diag_bwd(
            tn, qn, cn, te, tvn, yd, resetf, updatef, h, mom, p0,
            stitch=stitch_bwd,
        )
        # entering rows: exact-zero cotangents (see docstring); the
        # leaving-row cotangents stay in leaving indexing — the caller
        # built tn/qn/cn directly from the per-step scalars, so no
        # re-shift is needed on this side
        return (
            jnp.zeros_like(tn),                   # t
            jnp.zeros_like(qn),                   # q
            jnp.zeros_like(cn),                   # c
            gbar * jnp.sum(c_t, axis=0),          # tn (n,)
            gbar * jnp.sum(c_q, axis=0),          # qn (n,)
            gbar * c_c,                           # cn (d, n)
            jnp.zeros_like(te), jnp.zeros_like(tvn),
            gbar * c_y,                           # yd
            (gbar * hsum).reshape(jnp.shape(h)),  # h
            jnp.zeros_like(resetf), jnp.zeros_like(updatef),
        )

    core.defvjp(core_fwd, core_bwd)
    return core(t, q, c, tn, qn, cn, te, tvn, yd, h, resetf, updatef)


def diag_ssm_loglik_fused(type, par_mat, obs, times, ids, sigma_obs,
                          p0=10.0, dt=None):
    """BM_SSM / OU_SSM log-likelihood via the fused Pallas kernels with
    analytic gradients."""
    sys = diag_system(type, par_mat, obs, times, ids, sigma_obs, p0, dt=dt)
    return diag_fused_loglik(sys)
