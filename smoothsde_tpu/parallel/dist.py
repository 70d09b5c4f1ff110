"""Track-sharded (data-parallel) likelihood over a device mesh, wired
into the objective layer so `SDE.fit(mesh=...)` runs distributed.

The reference evaluates one flat sequential loop that skips cross-ID
transitions (nllk_sde.hpp:79, nllk_ctcrw.hpp:196-200); tracks are
statistically independent, so the likelihood is a sum of per-track
terms. Here the flat dataset is packed into a padded
(n_tracks, track_len) batch whose leading axis is sharded over a
`jax.sharding.Mesh`; the per-track likelihood (closed-form density sum
or Kalman filter) is vmapped over the batch, and the final scalar
reduction becomes an XLA psum over ICI under GSPMD (SURVEY.md §2,
"Parallelism" item 1).

Design matrices stay replicated: the (n, n_par) linear-predictor matrix
is computed once per step on every device, then gathered into the
sharded (K, L, n_par) batch layout by a sharded row-index array — the
gather output follows the index sharding, so all per-track work and its
gradient are fully partitioned.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class PackedLayout(NamedTuple):
    """Host-side description of the padded track batch."""

    row_idx: np.ndarray  # (K_pad, L) flat-row index per slot (clamped)
    valid_row: np.ndarray  # (K_pad, L) slot holds a real observation
    times_p: np.ndarray  # (K_pad, L) strictly increasing per track
    n_tracks: int  # real tracks (before device padding)
    lengths: np.ndarray  # (K_pad,) real rows per track (0 for dummies)


def pack_layout(
    times: np.ndarray,
    ids: np.ndarray,
    n_devices: int,
    pad_multiple: int = 8,
) -> PackedLayout:
    """Compute the padded (K_pad, L) batch layout for a flat dataset.

    - tracks are maximal runs of equal `ids` (reference track semantics,
      nllk_sde.hpp:79);
    - L is the longest track rounded up to `pad_multiple`; padding slots
      clamp to the track's last row and extend time by +1 per slot so
      dt stays positive;
    - K is rounded up to a multiple of `n_devices` with dummy tracks
      (valid_row all False) that contribute exactly zero likelihood.
    """
    times = np.asarray(times, float)
    ids = np.asarray(ids)
    n = len(ids)
    starts = np.concatenate(
        [[0], np.where(ids[1:] != ids[:-1])[0] + 1, [n]]
    )
    K = len(starts) - 1
    lens = np.diff(starts)
    L = int(-(-int(lens.max()) // pad_multiple) * pad_multiple)
    K_pad = int(-(-K // n_devices) * n_devices)

    row_idx = np.zeros((K_pad, L), np.int32)
    valid = np.zeros((K_pad, L), bool)
    t_p = np.tile(np.arange(L, dtype=float), (K_pad, 1))
    lengths = np.zeros(K_pad, np.int64)
    for k in range(K):
        s, e = starts[k], starts[k + 1]
        m = e - s
        row_idx[k, :m] = np.arange(s, e)
        row_idx[k, m:] = e - 1
        valid[k, :m] = True
        t_p[k, :m] = times[s:e]
        t_p[k, m:] = times[e - 1] + 1.0 + np.arange(L - m)
        lengths[k] = m
    return PackedLayout(row_idx, valid, t_p, K, lengths)


def _mesh_on_tpu(mesh: Mesh) -> bool:
    return mesh.devices.flat[0].platform == "tpu"


def _build_sharded_soa_loglik(
    spec,
    obs: np.ndarray,
    times: np.ndarray,
    ids: np.ndarray,
    mesh: Mesh,
    axis: str,
    layout: PackedLayout,
):
    """Track-sharded likelihood riding the SoA / fused-Pallas kernels.

    The round-2 sharded path vmapped the generic (n, s, s) element
    filter per track — the exact layout ops/kalman_soa.py exists to
    escape (~10x slower per step on TPU). Here each device instead
    FLATTENS its local padded tracks back into one concatenated
    sequence (track boundaries become in-scan resets, padding rows are
    NaN-missing) and runs the same single-device fast kernel the
    unsharded path uses: the fused-Pallas filter with the
    Fisher-identity parameter-space custom_vjp on TPU
    (ops/ctcrw_fused.py / ops/diag_fused.py), the SoA sequential scan
    on CPU (reverse-AD-safe, see ops/kalman.default_filter_impl). One
    psum of the per-device scalar is the only communication; the
    replicated (n, n_par) linear predictor is permuted into the padded
    layout with static slices (never a runtime gather — see permute_par
    below) and its cotangent handled by the shard_map transpose.

    Covers CTCRW / BM_SSM / OU_SSM with isotropic observation noise and
    default P0 (the SoA kernels' contract, identical to the single-
    device dispatch in infer/objective.py); other cases fall back to
    the generic element filter in build_sharded_loglik.
    """
    on_tpu = _mesh_on_tpu(mesh)
    K_pad, L = layout.row_idx.shape
    n = len(np.asarray(ids))

    obs = np.asarray(obs, float)
    obs_p = obs[layout.row_idx]
    obs_p[~layout.valid_row] = np.nan  # padding = missing observation

    dt_host = np.concatenate(
        [np.diff(layout.times_p, axis=1), np.ones((K_pad, 1))], axis=1
    )

    shard = NamedSharding(mesh, P(axis))
    obs_j = jax.device_put(jnp.asarray(obs_p), shard)
    dt_j = jax.device_put(jnp.asarray(dt_host), shard)

    # The theta-dependent linear predictor is permuted into the padded
    # (K_pad, L) layout with STATIC per-track slices + edge pads, NOT a
    # runtime row gather: row_idx is concat-of-slices by construction
    # (pack_layout above), and a (1M, 4) row gather costs ~6.6 ms
    # forward / ~47 ms with its scatter-add transpose on TPU — 10x the
    # entire fused filter (probe recorded in docs/BENCH_DETAILS.md).
    # Slices + pads compile to bandwidth-only copies.
    starts = [int(layout.row_idx[k, 0]) for k in range(K_pad)]
    lens = [int(m) for m in layout.lengths]
    identity_layout = K_pad * L == n and bool(
        np.array_equal(layout.row_idx.reshape(-1), np.arange(n))
    )

    def permute_par(par_full):
        if identity_layout:
            return par_full.reshape(K_pad, L, -1)
        rows = []
        for k in range(K_pad):
            m = lens[k]
            if m == 0:  # dummy track (device-count padding)
                rows.append(
                    jnp.zeros((L, par_full.shape[1]), par_full.dtype)
                )
                continue
            seg = jax.lax.slice_in_dim(par_full, starts[k], starts[k] + m)
            if m < L:
                seg = jnp.pad(seg, ((0, L - m), (0, 0)), mode="edge")
            rows.append(seg)
        return jnp.stack(rows)

    from smoothsde_tpu.ops.kalman_soa import (
        ctcrw_loglik_soa,
        diag_ssm_loglik_soa,
    )

    def local(obs_l, dt_l, par_l, sobs_rep):
        K_loc, L_loc = obs_l.shape[0], obs_l.shape[1]
        par_f = par_l.reshape(K_loc * L_loc, -1)
        obs_f = obs_l.reshape(K_loc * L_loc, -1)
        dt_f = dt_l.reshape(-1)
        ids_f = jnp.repeat(
            jnp.arange(K_loc, dtype=jnp.int32), L_loc, total_repeat_length=K_loc * L_loc
        )
        times_f = jnp.zeros_like(dt_f)  # unused: dt supplied explicitly
        if spec.type == "CTCRW":
            if on_tpu:
                val = ctcrw_loglik_soa(
                    par_f, obs_f, times_f, ids_f, sigma_obs=sobs_rep,
                    scan="fused", analytic_grad=True, dt=dt_f,
                )
            else:
                val = ctcrw_loglik_soa(
                    par_f, obs_f, times_f, ids_f, sigma_obs=sobs_rep,
                    scan="sequential", dt=dt_f,
                )
        else:
            if on_tpu:
                from smoothsde_tpu.ops.diag_fused import (
                    diag_ssm_loglik_fused,
                )

                val = diag_ssm_loglik_fused(
                    spec.type, par_f, obs_f, times_f, ids_f,
                    sigma_obs=sobs_rep, dt=dt_f,
                )
            else:
                val = diag_ssm_loglik_soa(
                    spec.type, par_f, obs_f, times_f, ids_f,
                    sigma_obs=sobs_rep, scan="sequential", dt=dt_f,
                )
        return jax.lax.psum(val, axis)

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )

    def loglik(full, par_full):
        sobs = jnp.exp(full["log_sigma_obs"][0])
        return sharded(obs_j, dt_j, permute_par(par_full), sobs)

    return loglik


def build_time_sharded_loglik(
    spec,
    obs: np.ndarray,
    times: np.ndarray,
    ids: np.ndarray,
    mesh: Mesh,
    axis: str = "time",
    other_data: Optional[dict] = None,
    H_array=None,
    P0=None,
):
    """Build `loglik(full, par_full) -> scalar` with the TIME axis of
    the (single- or multi-track) step sequence sharded over the mesh:
    each device scans its block of filtering elements, one all_gather
    of block totals over ICI stitches the prefixes
    (parallel/time_scan.kalman_filter_time_sharded; SURVEY.md §2
    "Parallelism" item 2). The right layout for ONE enormous track,
    where track sharding has nothing to split.

    Closed-form models need no special path (their per-step map-reduce
    is GSPMD-shardable as-is); this builder covers the Kalman family.
    """
    import jax

    from smoothsde_tpu.models.ssm import SSM_STEP_BUILDERS
    from smoothsde_tpu.ops.kalman import KalmanSteps
    from smoothsde_tpu.ops.kalman_soa import precompute_dt
    from smoothsde_tpu.parallel.time_scan import kalman_filter_time_sharded

    if spec.kind != "ssm":
        raise NotImplementedError(
            "time-sharded likelihood covers the Kalman family "
            "(closed-form models are GSPMD-shardable as-is)"
        )
    other_data = dict(other_data or {})
    n_dev = int(mesh.shape[axis])
    n = len(ids)
    pad = (-n) % n_dev
    builder = SSM_STEP_BUILDERS[spec.type]

    # Fast path: isotropic-noise SSMs with default P0 scan SoA elements
    # (elementwise-VPU combine) instead of generic (n, s, s) elements —
    # the time-axis analogue of _build_sharded_soa_loglik.
    if (
        spec.type in ("CTCRW", "BM_SSM", "OU_SSM")
        and H_array is None
        and P0 is None
    ):
        return _build_time_sharded_soa_loglik(
            spec, obs, times, ids, mesh, axis
        )

    obs_j = jnp.asarray(np.asarray(obs, float))
    times_j = jnp.asarray(np.asarray(times, float))
    ids_j = jnp.asarray(np.asarray(ids))
    dt_j = jnp.asarray(precompute_dt(times, ids), float)
    P0_j = None if P0 is None else jnp.asarray(np.asarray(P0, float))
    H_j = None
    if H_array is not None:
        H_np = np.asarray(H_array, float)
        if H_np.ndim == 3 and H_np.shape[0] != n and H_np.shape[-1] == n:
            H_np = np.moveaxis(H_np, -1, 0)
        H_j = jnp.asarray(H_np)

    if spec.type == "ESEAL_SSM":
        h_j = jnp.asarray(np.asarray(other_data["h"], float))
        R_j = jnp.asarray(np.asarray(other_data["R"], float))
        dep_j = jnp.asarray(np.asarray(other_data["dep_fat"], float))

    # local scan: log-depth associative on TPU; sequential composition
    # on CPU (same math; reverse-AD through lax.associative_scan
    # miscompiles on this environment's CPU backend, see ops/kalman.py)
    local_scan = (
        "associative" if jax.default_backend() == "tpu" else "sequential"
    )

    def _pad_steps(steps: KalmanSteps) -> KalmanSteps:
        """Append propagate-only identity rows so the step axis divides
        the device count: T=I, Q=0, b=0, valid=False, reset=False —
        exactly zero likelihood and an unchanged carry."""
        if pad == 0:
            return steps
        s_dim = steps.T.shape[-1]
        m_dim = steps.Z.shape[1]
        eye = jnp.broadcast_to(
            jnp.eye(s_dim, dtype=steps.T.dtype), (pad, s_dim, s_dim)
        )
        zmat = jnp.zeros((pad, m_dim, s_dim), steps.Z.dtype)
        return KalmanSteps(
            T=jnp.concatenate([steps.T, eye]),
            b=jnp.concatenate([steps.b, jnp.zeros((pad, s_dim))]),
            Q=jnp.concatenate([steps.Q, jnp.zeros((pad, s_dim, s_dim))]),
            Z=jnp.concatenate([steps.Z, zmat]),
            H=jnp.concatenate(
                [steps.H,
                 jnp.broadcast_to(jnp.eye(m_dim, dtype=steps.H.dtype),
                                  (pad, m_dim, m_dim))]
            ),
            y=jnp.concatenate([steps.y, jnp.zeros((pad, m_dim))]),
            a0=jnp.concatenate([steps.a0, jnp.zeros((pad, s_dim))]),
            P0=jnp.concatenate(
                [steps.P0,
                 jnp.broadcast_to(jnp.eye(s_dim, dtype=steps.P0.dtype),
                                  (pad, s_dim, s_dim))]
            ),
            reset=jnp.concatenate([steps.reset, jnp.zeros(pad, bool)]),
            valid=jnp.concatenate([steps.valid, jnp.zeros(pad, bool)]),
        )

    def loglik(full, par_full):
        if spec.type == "ESEAL_SSM":
            steps = builder(
                par_full, obs_j, times_j, ids_j,
                full["log_tau"][0], full["a1"][0], full["log_a2"][0],
                h_j, R_j, dep_j, P0=P0_j, dt=dt_j,
            )
        else:
            sobs = jnp.exp(full["log_sigma_obs"][0])
            steps = builder(
                par_full, obs_j, times_j, ids_j, sigma_obs=sobs,
                H_array=H_j, P0=P0_j, dt=dt_j,
            )
        steps = _pad_steps(steps)
        llk, _ = kalman_filter_time_sharded(
            steps, mesh, axis=axis, local_scan=local_scan
        )
        return llk

    return loglik


def _build_time_sharded_fused_ctcrw(
    obs: np.ndarray,
    times: np.ndarray,
    ids: np.ndarray,
    mesh: Mesh,
    axis: str,
):
    """Time-sharded CTCRW likelihood at single-chip fused-kernel speed.

    Each device runs the fused-Pallas filter (and, for the gradient,
    the Fisher-identity smoother/score kernels) on its OWN time chunk;
    one all-gather of the per-chunk total elements (14 floats per dim
    forward, 9 backward) stitches the chunks exactly
    (ops/kalman_soa.fused_par_core_time_sharded). This replaces the
    plain-AD blocked-scan path that ran ~7x slower than the unsharded
    fused kernel (docs/BENCH_DETAILS.md, VERDICT r2 item 1).

    Host-side: pad the flat sequence to a multiple of the device count
    with a dummy NaN track and precompute ALL step masks globally —
    te / tvn look one step ahead, across chunk edges.
    """
    from smoothsde_tpu.ops.kalman_soa import (
        fused_par_core_time_sharded,
        precompute_dt,
    )

    n_dev = int(mesh.shape[axis])
    n = len(ids)
    pad = (-n) % n_dev

    obs_np = np.asarray(obs, float)
    times_np = np.asarray(times, float)
    ids_codes = np.unique(np.asarray(ids), return_inverse=True)[1]
    dt_np = precompute_dt(times_np, ids_codes)
    if pad:
        obs_np = np.concatenate(
            [obs_np, np.full((pad, obs_np.shape[1]), np.nan)]
        )
        ids_codes = np.concatenate(
            [ids_codes, np.full(pad, ids_codes.max() + 1)]
        )
        dt_np = np.concatenate([dt_np[:-1], [1.0], np.ones(pad)])
    n_pad = n + pad
    n_dim = obs_np.shape[1]

    # global masks (conventions of kalman_soa._llk2_fused_par); the
    # entering-transition inputs (par_ent / dt_ent / prev_reset) are
    # shifted GLOBALLY before sharding — a chunk-local shift would
    # replace the real transition crossing every chunk edge with the
    # identity element
    reset = np.concatenate([[True], ids_codes[1:] != ids_codes[:-1]])
    prev_reset = np.concatenate([[True], reset[:-1]])
    valid = np.isfinite(obs_np[:, 0])
    te = np.concatenate([reset[1:], [True]])
    tv = (~reset) & (~prev_reset)
    tvn = np.concatenate([tv[1:], [False]])  # transition i -> i+1
    dt_ent = np.concatenate([[1.0], dt_np[:-1]])

    shard = NamedSharding(mesh, P(axis))
    shard2 = NamedSharding(mesh, P(None, axis))
    # ambient precision, like the generic SoA path: f64 under jax x64
    # (the CPU-mesh parity tests), f32 otherwise (TPU) — a hard f32
    # cast here would mix dtypes against a float64 par_full
    # (ADVICE r3 #2)
    fdt = np.float64 if jax.config.jax_enable_x64 else np.float32
    yd_j = jax.device_put(
        jnp.asarray(np.nan_to_num(obs_np).T.astype(fdt)), shard2
    )
    dt_j = jax.device_put(jnp.asarray(dt_np.astype(fdt)), shard)
    dte_j = jax.device_put(jnp.asarray(dt_ent.astype(fdt)), shard)
    rst_j = jax.device_put(jnp.asarray(reset.astype(fdt)), shard)
    prst_j = jax.device_put(jnp.asarray(prev_reset.astype(fdt)), shard)
    vld_j = jax.device_put(jnp.asarray(valid.astype(fdt)), shard)
    te_j = jax.device_put(jnp.asarray(te.astype(fdt)), shard)
    tvn_j = jax.device_put(jnp.asarray(tvn.astype(fdt)), shard)

    def local(par_c, pare_c, yd_c, h, dte_c, dt_c, rst_c, prst_c,
              vld_c, te_c, tvn_c):
        llk_local = fused_par_core_time_sharded(
            par_c, pare_c, yd_c, h, dte_c, dt_c, rst_c, prst_c,
            vld_c, te_c, tvn_c,
            axis=axis, n_dev=n_dev, n_dim=n_dim,
        )
        # local partial sums leave as a sharded (1,) vector and are
        # summed OUTSIDE shard_map: a psum inside the custom_vjp would
        # make the replicated-output cotangent convention (gbar / n_dev
        # per shard) silently scale the hand-written backward
        return jnp.reshape(llk_local, (1,))

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(axis, None), P(axis, None), P(None, axis), P(),
            P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
            P(axis),
        ),
        out_specs=P(axis),
        check_vma=False,
    )

    def loglik(full, par_full):
        dtp = par_full.dtype
        sobs = jnp.exp(full["log_sigma_obs"][0])
        h = (sobs * sobs).astype(dtp)
        par_p = (
            jnp.concatenate(
                [
                    par_full,
                    jnp.broadcast_to(
                        par_full[-1:], (pad, par_full.shape[1])
                    ),
                ]
            )
            if pad
            else par_full
        )
        # entering-transition par rows (global one-step shift; slot 0's
        # value is masked by prev_reset[0] = True)
        par_ent = jnp.concatenate([par_p[:1], par_p[:-1]])
        # buffers follow the CALLER's par dtype (no-op casts when they
        # already match; an f32 theta under ambient x64 stays f32)
        return jnp.sum(sharded(
            par_p, par_ent, yd_j.astype(dtp), h, dte_j.astype(dtp),
            dt_j.astype(dtp), rst_j.astype(dtp), prst_j.astype(dtp),
            vld_j.astype(dtp), te_j.astype(dtp), tvn_j.astype(dtp),
        ))

    return loglik


def _build_time_sharded_fused_diag(
    spec,
    obs: np.ndarray,
    times: np.ndarray,
    ids: np.ndarray,
    mesh: Mesh,
    axis: str,
):
    """Time-sharded BM_SSM / OU_SSM likelihood at single-chip
    fused-kernel speed (ops/diag_fused.diag_fused_core_time_sharded).

    The par-dependent per-step scalars (t_s, q_s, b_s) are computed
    in-graph on the FULL sequence; the entering rows (one-step shift
    masked by prev_reset) and the backward's leaving rows (shift-back)
    are GLOBAL shifts executed under GSPMD (one-slot halo exchanges),
    so every cross-chunk transition survives sharding. Masks are
    precomputed host-side with the padded dummy track.
    """
    from smoothsde_tpu.ops.diag_fused import diag_fused_core_time_sharded
    from smoothsde_tpu.ops.kalman_soa import precompute_dt

    n_dev = int(mesh.shape[axis])
    n = len(ids)
    pad = (-n) % n_dev

    obs_np = np.asarray(obs, float)
    times_np = np.asarray(times, float)
    ids_codes = np.unique(np.asarray(ids), return_inverse=True)[1]
    dt_np = precompute_dt(times_np, ids_codes)
    if pad:
        obs_np = np.concatenate(
            [obs_np, np.full((pad, obs_np.shape[1]), np.nan)]
        )
        ids_codes = np.concatenate(
            [ids_codes, np.full(pad, ids_codes.max() + 1)]
        )
        dt_np = np.concatenate([dt_np[:-1], [1.0], np.ones(pad)])
    n_pad = n + pad
    n_dim = obs_np.shape[1]

    reset = np.concatenate([[True], ids_codes[1:] != ids_codes[:-1]])
    prev_reset = np.concatenate([[True], reset[:-1]])
    valid = np.isfinite(obs_np[:, 0])
    update = valid & (~reset)
    te = np.concatenate([reset[1:], [True]])
    tv = (~reset) & (~prev_reset)
    tvn = np.concatenate([tv[1:], [False]])

    shard = NamedSharding(mesh, P(axis))
    shard2 = NamedSharding(mesh, P(None, axis))
    fdt = np.float64 if jax.config.jax_enable_x64 else np.float32
    yd_j = jax.device_put(
        jnp.asarray(np.nan_to_num(obs_np).T.astype(fdt)), shard2
    )
    dt_j = jax.device_put(jnp.asarray(dt_np.astype(fdt)), shard)
    rst_j = jax.device_put(jnp.asarray(reset.astype(fdt)), shard)
    prst_j = jax.device_put(jnp.asarray(prev_reset.astype(fdt)), shard)
    upd_j = jax.device_put(jnp.asarray(update.astype(fdt)), shard)
    te_j = jax.device_put(jnp.asarray(te.astype(fdt)), shard)
    tvn_j = jax.device_put(jnp.asarray(tvn.astype(fdt)), shard)

    def local(t, q, c, tn, qn, cn, te_c, tvn_c, yd_c, h, rst_c, upd_c):
        llk_local = diag_fused_core_time_sharded(
            t, q, c, tn, qn, cn, te_c, tvn_c, yd_c, h, rst_c, upd_c,
            axis=axis, n_dev=n_dev,
        )
        # summed OUTSIDE shard_map (see _build_time_sharded_fused_ctcrw
        # on the replicated-output cotangent convention)
        return jnp.reshape(llk_local, (1,))

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(axis), P(axis), P(None, axis),
            P(axis), P(axis), P(None, axis),
            P(axis), P(axis), P(None, axis), P(),
            P(axis), P(axis),
        ),
        out_specs=P(axis),
        check_vma=False,
    )

    def loglik(full, par_full):
        dtp = par_full.dtype
        sobs = jnp.exp(full["log_sigma_obs"][0])
        h = (sobs * sobs).astype(dtp)
        par_p = (
            jnp.concatenate(
                [
                    par_full,
                    jnp.broadcast_to(
                        par_full[-1:], (pad, par_full.shape[1])
                    ),
                ]
            )
            if pad
            else par_full
        )
        dt_c = dt_j.astype(dtp)
        prst = prst_j.astype(dtp)
        mu = par_p[:, :n_dim].T  # (d, n_pad)
        if spec.type == "BM_SSM":
            sigma = jnp.exp(par_p[:, n_dim])
            t_s = jnp.ones_like(sigma)
            b_s = dt_c[None, :] * mu
            q_s = sigma**2 * dt_c
        else:  # OU_SSM
            tau = jnp.exp(par_p[:, n_dim])
            kappa = jnp.exp(par_p[:, n_dim + 1])
            decay = jnp.exp(-dt_c / tau)
            t_s = decay
            b_s = (1.0 - decay)[None, :] * mu
            q_s = kappa * (1.0 - decay**2)

        def shift(x, fill=0.0):
            return jnp.concatenate(
                [jnp.full(x.shape[:-1] + (1,), fill, x.dtype),
                 x[..., :-1]], axis=-1,
            )

        def sb(x, fill=0.0):
            return jnp.concatenate(
                [x[..., 1:],
                 jnp.full(x.shape[:-1] + (1,), fill, x.dtype)], axis=-1,
            )

        # entering rows (global one-step shift, masked at track starts)
        t_in = prst * 1.0 + (1.0 - prst) * shift(t_s, 1.0)
        q_in = (1.0 - prst) * shift(q_s)
        c_in = (1.0 - prst)[None, :] * shift(b_s)
        # leaving rows for the Fisher backward (global shift-back)
        tn = sb(t_in, 1.0)
        qn = sb(q_in)
        cn = sb(c_in)
        return jnp.sum(sharded(
            t_in, q_in, c_in, tn, qn, cn, te_j.astype(dtp),
            tvn_j.astype(dtp), yd_j.astype(dtp), h,
            rst_j.astype(dtp), upd_j.astype(dtp),
        ))

    return loglik


def _build_time_sharded_soa_loglik(
    spec,
    obs: np.ndarray,
    times: np.ndarray,
    ids: np.ndarray,
    mesh: Mesh,
    axis: str,
):
    """Time-sharded likelihood over SoA filtering elements.

    Host-side: pad the flat step sequence to a multiple of the device
    count with a dummy NaN-observation track (reset + no updates =
    exactly zero likelihood). Device-side: build the SoA system
    (ops/kalman_soa._ctcrw_system / ops/diag_fused.diag_system),
    run the block-decomposed sharded scan with the elementwise combine
    (parallel/time_scan.soa_sharded_prefix_scan), recover likelihood
    terms with one GSPMD-sharded elementwise pass.
    """
    from smoothsde_tpu.ops.diag_fused import (
        DIAG_IDENTITY,
        _comb1,
        diag_elements,
        diag_llk_from_filtered,
        diag_system,
    )
    from smoothsde_tpu.ops.ctcrw_fused import _interpret
    from smoothsde_tpu.ops.kalman_soa import (
        _ID2,
        _combine2,
        _ctcrw_system,
        _llk_from_filtered,
        precompute_dt,
    )
    from smoothsde_tpu.parallel.time_scan import soa_sharded_prefix_scan

    if spec.type == "CTCRW" and (_mesh_on_tpu(mesh) or _interpret()):
        # fused-Pallas local kernels + chunk-total stitching: same
        # per-eval speed as the unsharded fused path (interpret mode
        # lets the CPU-mesh tests drive the identical composition)
        return _build_time_sharded_fused_ctcrw(
            obs, times, ids, mesh, axis
        )
    if spec.type in ("BM_SSM", "OU_SSM") and (
        _mesh_on_tpu(mesh) or _interpret()
    ):
        # the scalar-state family's fused time path (VERDICT r3 item 3:
        # the CTCRW-only gate left BM_SSM/OU_SSM on the ~7x-slower
        # blocked SoA scan)
        return _build_time_sharded_fused_diag(
            spec, obs, times, ids, mesh, axis
        )

    n_dev = int(mesh.shape[axis])
    n = len(ids)
    pad = (-n) % n_dev

    obs_np = np.asarray(obs, float)
    times_np = np.asarray(times, float)
    ids_codes = np.unique(np.asarray(ids), return_inverse=True)[1]
    dt_np = precompute_dt(times_np, ids_codes)
    if pad:
        obs_np = np.concatenate(
            [obs_np, np.full((pad, obs_np.shape[1]), np.nan)]
        )
        times_np = np.concatenate(
            [times_np, times_np[-1] + 1.0 + np.arange(pad)]
        )
        ids_codes = np.concatenate(
            [ids_codes, np.full(pad, ids_codes.max() + 1)]
        )
        dt_np = np.concatenate([dt_np[:-1], [1.0], np.ones(pad)])

    obs_j = jnp.asarray(obs_np)
    times_j = jnp.asarray(times_np)
    ids_j = jnp.asarray(ids_codes)
    dt_j = jnp.asarray(dt_np, float)

    local_scan = "blocked" if _mesh_on_tpu(mesh) else "sequential"

    def loglik(full, par_full):
        sobs = jnp.exp(full["log_sigma_obs"][0])
        par_p = (
            jnp.concatenate(
                [
                    par_full,
                    jnp.broadcast_to(
                        par_full[-1:], (pad, par_full.shape[1])
                    ),
                ]
            )
            if pad
            else par_full
        )
        if spec.type == "CTCRW":
            sys = _ctcrw_system(
                par_p, obs_j, times_j, ids_j, sobs, dt=dt_j
            )
            scanned = soa_sharded_prefix_scan(
                _combine2, _ID2, sys.elem, mesh, axis, local_scan
            )
            return _llk_from_filtered(sys, scanned.b, scanned.C)
        sysd = diag_system(
            spec.type, par_p, obs_j, times_j, ids_j, sobs, dt=dt_j
        )
        elems = diag_elements(sysd)
        _, bf, Cf, _, _ = soa_sharded_prefix_scan(
            _comb1, DIAG_IDENTITY, elems, mesh, axis, local_scan
        )
        return diag_llk_from_filtered(sysd, bf, Cf)

    return loglik


def build_sharded_loglik(
    spec,
    obs: np.ndarray,
    times: np.ndarray,
    ids: np.ndarray,
    mesh: Mesh,
    axis: str = "tracks",
    other_data: Optional[dict] = None,
    kalman_impl: str = "auto",
    H_array=None,
    P0=None,
):
    """Build `loglik(full, par_full) -> scalar` with tracks sharded over
    `mesh`'s `axis`. `par_full` is the replicated (n, n_par)
    linear-predictor matrix from the objective layer.
    """
    other_data = dict(other_data or {})
    n_dev = int(mesh.shape[axis])
    layout = pack_layout(times, ids, n_dev)
    K_pad, L = layout.row_idx.shape

    # Fast path: isotropic-noise SSMs with default P0 ride the same SoA
    # / fused-Pallas kernels as the unsharded dispatch (VERDICT r2 item
    # 1 — multi-chip must keep the single-chip kernel speed).
    if (
        spec.type in ("CTCRW", "BM_SSM", "OU_SSM")
        and kalman_impl in ("auto", "soa")
        and H_array is None
        and P0 is None
    ):
        return _build_sharded_soa_loglik(
            spec, obs, times, ids, mesh, axis, layout
        )

    obs = np.asarray(obs, float)
    obs_p = obs[layout.row_idx]
    obs_p[~layout.valid_row] = np.nan  # padding = missing observation

    shard = NamedSharding(mesh, P(axis))
    row_idx = jax.device_put(jnp.asarray(layout.row_idx), shard)
    obs_p = jax.device_put(jnp.asarray(obs_p), shard)
    times_p = jax.device_put(jnp.asarray(layout.times_p), shard)
    zero_ids = jax.device_put(jnp.zeros((K_pad, L), jnp.int32), shard)
    # per-track intervals in host f64 (see kalman_soa.precompute_dt on
    # why dt must not come from f32 diff of absolute times)
    dt_host = np.concatenate(
        [np.diff(layout.times_p, axis=1), np.ones((K_pad, 1))], axis=1
    )
    dt_p = jax.device_put(jnp.asarray(dt_host), shard)

    if kalman_impl == "auto":
        # Per-track sequential scan: solid vjp on every backend (see
        # ops/kalman.default_filter_impl on the XLA:CPU associative-scan
        # issue); tracks supply the parallelism here.
        kalman_impl = (
            "parallel" if jax.default_backend() == "tpu" else "sequential"
        )

    if spec.kind == "closed_form":
        from smoothsde_tpu.ops.densities import closed_form_loglik

        other = (
            {"df": float(other_data["df"])} if spec.type == "BM_t" else None
        )

        def loglik(full, par_full):
            par_p = par_full[row_idx]

            def track(o, t, zid, p, dtk):
                return closed_form_loglik(
                    spec.type, o, t, zid, p, other, dt=dtk
                )

            vals = jax.vmap(track)(obs_p, times_p, zero_ids, par_p, dt_p)
            return jnp.sum(vals)

        return loglik

    # ---- state-space models ----
    from smoothsde_tpu.models.ssm import SSM_STEP_BUILDERS
    from smoothsde_tpu.ops.kalman import kalman_loglik

    builder = SSM_STEP_BUILDERS[spec.type]
    P0_j = None if P0 is None else jnp.asarray(np.asarray(P0, float))

    H_p = None
    if H_array is not None:
        H_np = np.asarray(H_array, float)
        if H_np.ndim == 3 and H_np.shape[0] != len(ids) and H_np.shape[-1] == len(ids):
            H_np = np.moveaxis(H_np, -1, 0)
        H_p = jax.device_put(jnp.asarray(H_np[layout.row_idx]), shard)

    if spec.type == "ESEAL_SSM":
        h_p = jax.device_put(
            jnp.asarray(np.asarray(other_data["h"], float)[layout.row_idx]),
            shard,
        )
        R_p = jax.device_put(
            jnp.asarray(np.asarray(other_data["R"], float)[layout.row_idx]),
            shard,
        )
        dep_p = jax.device_put(
            jnp.asarray(
                np.asarray(other_data["dep_fat"], float)[layout.row_idx]
            ),
            shard,
        )

        def loglik(full, par_full):
            par_p = par_full[row_idx]

            def track(o, t, zid, p, h_k, R_k, dep_k, dtk):
                steps = builder(
                    p, o, t, zid,
                    full["log_tau"][0], full["a1"][0], full["log_a2"][0],
                    h_k, R_k, dep_k, P0=P0_j, dt=dtk,
                )
                return kalman_loglik(steps, impl=kalman_impl)

            vals = jax.vmap(track)(
                obs_p, times_p, zero_ids, par_p, h_p, R_p, dep_p, dt_p
            )
            return jnp.sum(vals)

        return loglik

    def loglik(full, par_full):
        par_p = par_full[row_idx]
        sobs = jnp.exp(full["log_sigma_obs"][0])

        if H_p is None:
            def track(o, t, zid, p, dtk):
                steps = builder(
                    p, o, t, zid, sigma_obs=sobs, P0=P0_j, dt=dtk
                )
                return kalman_loglik(steps, impl=kalman_impl)

            vals = jax.vmap(track)(obs_p, times_p, zero_ids, par_p, dt_p)
        else:
            def track(o, t, zid, p, Hk, dtk):
                steps = builder(
                    p, o, t, zid, sigma_obs=sobs, H_array=Hk, P0=P0_j,
                    dt=dtk,
                )
                return kalman_loglik(steps, impl=kalman_impl)

            vals = jax.vmap(track)(
                obs_p, times_p, zero_ids, par_p, H_p, dt_p
            )
        return jnp.sum(vals)

    return loglik
