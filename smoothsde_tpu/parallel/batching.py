"""Across-track (data-parallel) batching and sharding.

The reference's likelihood is one flat sequential loop that skips
cross-ID transitions (nllk_sde.hpp:79, nllk_ctcrw.hpp:196-200). The
latent batch parallelism — tracks are independent — becomes explicit
here: tracks are packed into a padded (n_tracks, track_len, ...) batch,
the per-track likelihood is vmapped, and the batch axis is sharded over
a jax.sharding.Mesh with a psum reduction of the scalar nllk over ICI
(SURVEY.md section 2, "Parallelism" item 1).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class PackedTracks(NamedTuple):
    """Padded per-track arrays. Padding rows have valid=False and are
    flagged as track starts so they never contribute likelihood."""

    obs: jax.Array  # (K, L, d)
    times: jax.Array  # (K, L)
    lengths: jax.Array  # (K,)


def pack_tracks(
    obs: np.ndarray,
    times: np.ndarray,
    ids: np.ndarray,
    pad_multiple: int = 128,
) -> PackedTracks:
    """Split a flat (n, d) multi-track dataset into a padded batch.

    Pad rows repeat the last time (dt = 0 is masked out by length) and
    carry NaN observations.
    """
    obs = np.asarray(obs, float)
    times = np.asarray(times, float)
    ids = np.asarray(ids)
    starts = np.concatenate([[0], np.where(ids[1:] != ids[:-1])[0] + 1, [len(ids)]])
    K = len(starts) - 1
    L = int(np.max(np.diff(starts)))
    L = -(-L // pad_multiple) * pad_multiple
    d = obs.shape[1]
    obs_p = np.full((K, L, d), np.nan)
    t_p = np.zeros((K, L))
    lens = np.diff(starts)
    for k in range(K):
        s, e = starts[k], starts[k + 1]
        obs_p[k, : e - s] = obs[s:e]
        t_p[k, : e - s] = times[s:e]
        # continue time linearly into the padding so dt stays positive
        t_p[k, e - s :] = times[e - 1] + 1.0 + np.arange(L - (e - s))
    return PackedTracks(
        jnp.asarray(obs_p), jnp.asarray(t_p), jnp.asarray(lens)
    )


def make_mesh(n_devices: Optional[int] = None, axis: str = "tracks") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def auto_mesh(axis: str = "tracks") -> Mesh:
    """Device-count-aware mesh over every addressable device.

    Single-host: a 1-axis mesh over all local devices (track shards
    ride ICI). Multi-host (jax.process_count() > 1): a ("dcn", axis)
    mesh whose leading axis spans processes — per the standard
    DCN-outer/ICI-inner layout, the track batch shards across hosts on
    the slow network while each host's shard rides ICI; the scalar
    psum then reduces hierarchically. `SDE.fit(mesh="auto")` resolves
    to this.
    """
    n_proc = jax.process_count()
    devices = np.array(jax.devices())
    if n_proc <= 1:
        return Mesh(devices, (axis,))
    per_host = len(devices) // n_proc
    return Mesh(devices.reshape(n_proc, per_host), ("dcn", axis))


def shard_batch(tree, mesh: Mesh, axis: str = "tracks"):
    """Place a PackedTracks-style pytree with its leading axis sharded
    over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def batched_loglik(per_track_loglik, packed: PackedTracks, *args):
    """vmap a per-track log-likelihood over the batch and sum.

    per_track_loglik(obs_k, times_k, length_k, *args) -> scalar.
    Under jit with a sharded batch axis, XLA turns the final sum into a
    psum over ICI.
    """
    vals = jax.vmap(
        lambda o, t, l: per_track_loglik(o, t, l, *args)
    )(packed.obs, packed.times, packed.lengths)
    return jnp.sum(vals)
