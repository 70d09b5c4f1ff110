"""Along-time (sequence-parallel) Kalman filtering across a device mesh.

For a single track too long for one chip's step budget, the
associative-scan filter is distributed with the classic block-scan
decomposition: each device runs a local log-depth scan over its time
shard, the per-shard total elements are all-gathered over ICI, every
device composes the totals of its predecessors into a prefix element,
and the prefix is folded into the local results. One all-gather of
O(devices * s^2) bytes is the only communication
(SURVEY.md section 2, "Parallelism" item 2; PAPERS.md temporal-
parallelization references).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from smoothsde_tpu.ops.kalman import (
    KalmanSteps,
    _Element,
    _build_elements,
    _combine,
    predictive_loglik_terms,
)


def _identity_element(s: int, dtype) -> _Element:
    return _Element(
        A=jnp.eye(s, dtype=dtype),
        b=jnp.zeros((s,), dtype),
        C=jnp.zeros((s, s), dtype),
        eta=jnp.zeros((s,), dtype),
        J=jnp.zeros((s, s), dtype),
    )


def _sharded_prefix_scan(
    elems: _Element, mesh: Mesh, axis: str, local_scan: str = "associative"
) -> _Element:
    """Inclusive associative scan of filtering elements with the time
    axis sharded over `axis`.

    local_scan: how each device scans its own shard — "associative"
    (log-depth, the TPU path) or "sequential" (lax.scan; mathematically
    identical, used to test gradients through the sharded composition
    on the CPU backend where reverse-mode AD through
    lax.associative_scan miscompiles, see ops/kalman.py).
    """
    n_dev = mesh.shape[axis]
    s = elems.A.shape[-1]
    dtype = elems.A.dtype

    def local(elem_block: _Element) -> _Element:
        if local_scan == "sequential":
            def step(carry, x):
                new = _combine(carry, x)
                return new, new

            # the replicated identity must be marked as varying over the
            # mesh axis to serve as a scan carry inside shard_map
            init = jax.tree.map(
                lambda x: jax.lax.pcast(x, (axis,), to="varying"),
                _identity_element(s, dtype),
            )
            _, scanned = jax.lax.scan(step, init, elem_block)
        else:
            scanned = jax.lax.associative_scan(
                _combine, elem_block, axis=0
            )
        total = jax.tree.map(lambda x: x[-1], scanned)
        # all-gather each device's block total over ICI
        totals = jax.tree.map(
            lambda x: jax.lax.all_gather(x, axis), total
        )  # leaves have leading dim n_dev
        my = jax.lax.axis_index(axis)
        prefix = _identity_element(s, dtype)
        for k in range(n_dev - 1):
            candidate = _combine(
                prefix, jax.tree.map(lambda x: x[k], totals)
            )
            prefix = jax.tree.map(
                lambda p, c: jnp.where(k < my, c, p), prefix, candidate
            )
        # fold the predecessor prefix into every local element
        broadcast = jax.tree.map(
            lambda x: jnp.broadcast_to(
                x, scanned.A.shape[:1] + x.shape
            ),
            prefix,
        )
        return _combine(broadcast, scanned)

    spec = P(axis)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(_Element(*([spec] * 5)),),
        out_specs=_Element(*([spec] * 5)),
    )(elems)


def kalman_filter_time_sharded(
    steps: KalmanSteps, mesh: Mesh, axis: str = "time",
    local_scan: str = "associative",
):
    """Log-depth parallel Kalman filter with the step axis sharded.

    Element construction and the likelihood-recovery pass are plain
    elementwise jnp (GSPMD shards them; the one-step shifts become halo
    exchanges); only the scan itself runs under shard_map.
    Returns (llk, filtered_means).
    """
    elems = _build_elements(steps)
    scanned = _sharded_prefix_scan(elems, mesh, axis, local_scan)
    m_f, P_f = scanned.b, scanned.C
    llk_terms = predictive_loglik_terms(steps, m_f, P_f)
    return jnp.sum(llk_terms), m_f


def soa_sharded_prefix_scan(
    combine, identity, elems, mesh: Mesh, axis: str,
    local_scan: str = "blocked",
):
    """Inclusive associative scan along the LAST axis of every SoA leaf
    with that axis sharded over `mesh[axis]`.

    Same block-scan decomposition as `_sharded_prefix_scan`, but over
    structure-of-arrays elements (nested tuples of (d, n) arrays, see
    ops/kalman_soa.py) so each device's local scan runs the fast
    elementwise-VPU kernels instead of the generic (n, s, s) combine —
    the round-3 fix for the time-sharded path trading away the SoA
    kernel advantage (VERDICT r2 item 1).

    local_scan: 'blocked' (two-phase lax.scan, the TPU choice),
    'associative' (plain log-depth), or 'sequential' (reverse-AD-safe
    on the CPU backend, see ops/kalman.default_filter_impl).
    """
    from smoothsde_tpu.ops.kalman_soa import _scan_elements

    n_dev = int(mesh.shape[axis])

    def local(elem_block):
        scanned = _scan_elements(combine, identity, elem_block, local_scan)
        total = jax.tree.map(lambda x: x[..., -1], scanned)
        totals = jax.tree.map(
            lambda x: jax.lax.all_gather(x, axis), total
        )  # leaves gain a leading n_dev axis
        my = jax.lax.axis_index(axis)
        prefix = jax.tree.map(
            lambda x, idl: jnp.broadcast_to(
                jnp.asarray(idl, x.dtype), x.shape
            ),
            total,
            identity,
        )
        for k in range(n_dev - 1):
            cand = combine(
                prefix, jax.tree.map(lambda x: x[k], totals)
            )
            prefix = jax.tree.map(
                lambda p, c: jnp.where(k < my, c, p), prefix, cand
            )
        pb = jax.tree.map(lambda x: x[..., None], prefix)
        return combine(pb, scanned)

    spec = P(None, axis)  # every leaf is (d, n) with n the scan axis
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: spec, elems),),
        out_specs=jax.tree.map(lambda _: spec, elems),
        check_vma=False,
    )(elems)
