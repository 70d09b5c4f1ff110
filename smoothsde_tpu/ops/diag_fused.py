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


def _make_tiler(d, n, NB, L, L_pad, lanes, MID, dtype):
    def to_tiles(x, pv):
        pad_n = NB * L - n
        if pad_n:
            x = jnp.concatenate(
                [x, jnp.full((d, pad_n), pv, dtype)], axis=1
            )
        x = x.reshape(d, NB, L)
        x = jnp.moveaxis(x, -1, 0).reshape(L, lanes)
        if L_pad != L:
            x = jnp.concatenate(
                [x, jnp.full((L_pad - L, lanes), pv, dtype)], axis=0
            )
        return x.reshape(L_pad, MID, 128)

    def from_tiles(x):
        x = x.reshape(L_pad, lanes)[:L]
        x = x.reshape(L, d, NB)
        return jnp.moveaxis(x, 0, -1).reshape(d, NB * L)[:, :n]

    return to_tiles, from_tiles


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


def diag_fused_loglik(sys: DiagSystem):
    """Fused forward + Fisher-identity custom_vjp log-likelihood."""
    reset, prev_reset, update = sys.reset, sys.prev_reset, sys.update
    p0 = sys.p0

    @jax.custom_vjp
    def core(t, q, c, yd, h):
        return _fwd(t, q, c, yd, h)[0]

    def _fwd(t, q, c, yd, h):
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        d, n = yd.shape
        dtype = yd.dtype
        NB, L, L_CH, L_pad, lanes, MID, n_lc = _plan(d, n)
        to_tiles, from_tiles = _make_tiler(
            d, n, NB, L, L_pad, lanes, MID, dtype
        )
        bc = lambda x: jnp.broadcast_to(x, (d, n))  # noqa: E731
        raw = [bc(t), bc(q), c, yd,
               bc(reset.astype(dtype)), bc(update.astype(dtype))]
        pad_vals = [1.0, 0.0, 0.0, 0.0, 0.0, 0.0]
        tiles = _Tiles1(*[to_tiles(x, pv) for x, pv in zip(raw, pad_vals)])
        h_arr = jnp.asarray(h, dtype).reshape(1, 1)
        grid = (MID // 8, n_lc)
        in_spec = pl.BlockSpec(
            (L_CH, 8, 128), lambda m, lc: (lc, m, 0),
            memory_space=pltpu.VMEM,
        )
        tot_spec = pl.BlockSpec(
            (8, 128), lambda m, lc: (m, 0), memory_space=pltpu.VMEM
        )
        h_spec = pl.BlockSpec(
            (1, 1), lambda m, lc: (0, 0), memory_space=pltpu.SMEM
        )

        def totals_kernel(h_ref, *refs):
            ins = _Tiles1(*refs[:6])
            outs = refs[6:11]
            car = refs[11:]
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
            in_specs=[h_spec] + [in_spec] * 6,
            out_specs=[tot_spec] * 5,
            out_shape=[jax.ShapeDtypeStruct((MID, 128), dtype)] * 5,
            scratch_shapes=[pltpu.VMEM((8, 128), dtype)] * 5,
            interpret=_interpret(),
        )(h_arr, *tiles)

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

        def scan_kernel(h_ref, *refs):
            ins = _Tiles1(*refs[:6])
            pref = refs[6:11]
            m_out, P_out, llk_out = refs[11], refs[12], refs[13]
            car = refs[14:19]
            lacc = refs[19]
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
                m_out[l] = cur[1]
                P_out[l] = cur[2]
            for i in range(5):
                car[i][...] = cur[i]
            lacc[...] = acc

            @pl.when(lc == n_lc - 1)
            def _():
                llk_out[...] = lacc[...]

        outs = pl.pallas_call(
            scan_kernel,
            grid=grid,
            in_specs=[h_spec] + [in_spec] * 6 + [tot_spec] * 5,
            out_specs=[in_spec] * 2 + [tot_spec],
            out_shape=(
                [jax.ShapeDtypeStruct((L_pad, MID, 128), dtype)] * 2
                + [jax.ShapeDtypeStruct((MID, 128), dtype)]
            ),
            scratch_shapes=[pltpu.VMEM((8, 128), dtype)] * 6,
            interpret=_interpret(),
        )(h_arr, *tiles, *excl_tiles)
        return jnp.sum(outs[2]), from_tiles(outs[0]), from_tiles(outs[1])

    def core_fwd(t, q, c, yd, h):
        llk, m_f, P_f = _fwd(t, q, c, yd, h)
        return llk, (t, q, c, yd, h, m_f, P_f)

    def core_bwd(res, gbar):
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        t, q, c, yd, h, m_f, P_f = res
        d, n = yd.shape
        dtype = yd.dtype
        NB, L, L_CH, L_pad, lanes, MID, n_lc = _plan(d, n)
        to_tiles, from_tiles = _make_tiler(
            d, n, NB, L, L_pad, lanes, MID, dtype
        )
        bc = lambda x: jnp.broadcast_to(x, (d, n))  # noqa: E731
        sb = lambda x: jnp.concatenate(  # noqa: E731
            [x[..., 1:], jnp.zeros(x.shape[:-1] + (1,), x.dtype)], axis=-1
        )
        sb1 = lambda x: jnp.concatenate(  # noqa: E731
            [x[..., 1:], jnp.ones(x.shape[:-1] + (1,), x.dtype)], axis=-1
        )
        te = jnp.concatenate([reset[1:], jnp.ones((1,), bool)])
        tv = (~reset) & (~prev_reset)
        tvn = sb(tv.astype(dtype))

        raw = [bc(sb1(t)), bc(sb(q)), sb(c), m_f, P_f,
               bc(te.astype(dtype)), bc(tvn), yd,
               bc(update.astype(dtype)), bc(reset.astype(dtype))]
        # identity smoothing elements in padding: P = 1, q = 0, t = 1,
        # te = 0 -> G = 1, g = 0, L = 0
        pad_vals = [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0]
        tiles = [to_tiles(x, pv) for x, pv in zip(raw, pad_vals)]
        h_arr = jnp.asarray(h, dtype).reshape(1, 1)
        grid = (MID // 8, n_lc)
        rev_spec = pl.BlockSpec(
            (L_CH, 8, 128), lambda m, lc: (n_lc - 1 - lc, m, 0),
            memory_space=pltpu.VMEM,
        )
        tot_spec = pl.BlockSpec(
            (8, 128), lambda m, lc: (m, 0), memory_space=pltpu.VMEM
        )
        h_spec = pl.BlockSpec(
            (1, 1), lambda m, lc: (0, 0), memory_space=pltpu.SMEM
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

        def sm_totals_kernel(h_ref, *refs):
            ins = refs[:10]
            outs = refs[10:13]
            car = refs[13:]
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
            in_specs=[h_spec] + [rev_spec] * 10,
            out_specs=[tot_spec] * 3,
            out_shape=[jax.ShapeDtypeStruct((MID, 128), dtype)] * 3,
            scratch_shapes=[pltpu.VMEM((8, 128), dtype)] * 3,
            interpret=_interpret(),
        )(h_arr, *tiles)

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

        def score_kernel(h_ref, *refs):
            ins = refs[:10]
            pref = refs[10:13]
            cot = refs[13:17]  # tbar qbar cbar ybar
            hbar_out = refs[17]
            car = refs[18:21]
            hacc = refs[21]
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
                cot[0][l] = TVn * tb
                cot[1][l] = TVn * qb
                cot[2][l] = TVn * cb
                U = ins[8][l]
                R = ins[9][l]
                resid = ins[7][l] - ms
                cot[3][l] = U * (-resid / hh) + R * (-resid / p0)
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
            in_specs=[h_spec] + [rev_spec] * 10 + [tot_spec] * 3,
            out_specs=[rev_spec] * 4 + [tot_spec],
            out_shape=(
                [jax.ShapeDtypeStruct((L_pad, MID, 128), dtype)] * 4
                + [jax.ShapeDtypeStruct((MID, 128), dtype)]
            ),
            scratch_shapes=[pltpu.VMEM((8, 128), dtype)] * 4,
            interpret=_interpret(),
        )(h_arr, *tiles, *excl_tiles)

        c_t, c_q, c_c, c_y = (gbar * from_tiles(x) for x in outs[:4])
        hbar = gbar * jnp.sum(outs[4])

        def fwd1(x):
            return jnp.concatenate(
                [jnp.zeros(x.shape[:-1] + (1,), x.dtype), x[..., :-1]],
                axis=-1,
            )

        tbar = jnp.sum(fwd1(c_t), axis=0)
        qbar = jnp.sum(fwd1(c_q), axis=0)
        cbar = fwd1(c_c)
        return (tbar, qbar, cbar, c_y, hbar.reshape(jnp.shape(h)))

    core.defvjp(core_fwd, core_bwd)
    return core(sys.t, sys.q, sys.c, sys.yd, sys.h)


def diag_ssm_loglik_fused(type, par_mat, obs, times, ids, sigma_obs,
                          p0=10.0, dt=None):
    """BM_SSM / OU_SSM log-likelihood via the fused Pallas kernels with
    analytic gradients."""
    sys = diag_system(type, par_mat, obs, times, ids, sigma_obs, p0, dt=dt)
    return diag_fused_loglik(sys)
