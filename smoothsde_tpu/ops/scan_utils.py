"""Blocked (two-phase) associative scan.

jax.lax.associative_scan lowers to ~log2(n) levels of strided
even/odd slicing — on TPU that is lane-shuffle heavy and was measured
at ~44 ms for a 1M-step filtering-element scan. This utility uses the
classic block decomposition instead:

  phase 1: reshape the scan axis into (L, NB) lanes-blocks and run ONE
           sequential lax.scan of length L whose carry is the running
           composition of all NB blocks simultaneously — every scan
           step is an elementwise combine over NB lanes (VPU-shaped);
  phase 2: associative_scan over the NB block totals (tiny);
  phase 3: one elementwise pass folds each block's exclusive prefix
           into its phase-1 results.

Total HBM traffic ~ 4x the element size, no strided access. The same
decomposition stitches across devices in parallel/time_scan.py.
"""

from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def pallas_phase1_scan(combine, identity, blocked, L, L_CH=32):
    """Phase-1 inclusive scan as one fused Pallas kernel.

    `blocked`: pytree with leaves (L_pad, MID, 128) — time-major blocked
    layout, lanes = (dims x blocks) tiled onto (MID, 128). The kernel
    keeps the running composition of 8x128 lane tiles in VMEM scratch
    across the L grid dimension, so element loads/stores happen exactly
    once (vs separate XLA kernels per scan step). Forward-only (wrap in
    custom_vjp for gradients — the Fisher-identity backward in
    ops/kalman_smooth.py needs only forward scans).

    Returns the within-block inclusive scan, same shapes as `blocked`.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    leaves, treedef = jax.tree.flatten(blocked)
    id_leaves = jax.tree.leaves(identity)
    n_leaves = len(leaves)
    L_pad, MID, lanes = leaves[0].shape
    assert lanes == 128 and L_pad % L_CH == 0 and MID % 8 == 0

    grid = (MID // 8, L_pad // L_CH)

    def kernel(*refs):
        ins = refs[:n_leaves]
        outs = refs[n_leaves : 2 * n_leaves]
        car = refs[2 * n_leaves :]
        lc = pl.program_id(1)

        @pl.when(lc == 0)
        def _():
            for i in range(n_leaves):
                car[i][...] = jnp.full(
                    (8, 128), id_leaves[i], dtype=ins[i].dtype
                )

        for l in range(L_CH):
            x = jax.tree.unflatten(
                treedef, [r[l] for r in ins]
            )
            c = jax.tree.unflatten(treedef, [r[...] for r in car])
            new = combine(c, x)
            new_leaves = jax.tree.leaves(new)
            for i in range(n_leaves):
                car[i][...] = new_leaves[i]
                outs[i][l] = new_leaves[i]

    in_spec = pl.BlockSpec(
        (L_CH, 8, 128), lambda m, lc: (lc, m, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in_spec] * n_leaves,
        out_specs=[in_spec] * n_leaves,
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype) for x in leaves
        ],
        scratch_shapes=[
            pltpu.VMEM((8, 128), x.dtype) for x in leaves
        ],
        interpret=bool(int(os.environ.get("SMOOTHSDE_PALLAS_INTERPRET", "0"))),
    )(*leaves)
    return jax.tree.unflatten(treedef, out)


def blocked_associative_scan(
    combine: Callable,
    identity,
    elems,
    block_count: int = 2048,
    unroll: int = 4,
    phase1: str = "xla",
):
    """Inclusive associative scan along the LAST axis of every leaf.

    Args:
      combine: associative combine(left, right) on element pytrees,
        elementwise over array components (must broadcast).
      identity: identity element pytree (leaves broadcastable scalars
        or arrays without the scan axis).
      elems: pytree whose leaves end in the scan axis (..., n).
      block_count: NB, number of lanes-blocks (power of two preferred).
    """
    leaves = jax.tree.leaves(elems)
    n = leaves[0].shape[-1]
    NB = min(block_count, n)
    L = -(-n // NB)  # ceil
    pad = NB * L - n

    def to_blocks(x):
        if pad:
            pad_width = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
            fill = jnp.zeros((), x.dtype)
            x = jnp.pad(x, pad_width)
        # (..., NB, L) -> (L, ..., NB): block b holds global [b*L, b*L+L)
        x = x.reshape(x.shape[:-1] + (NB, L))
        return jnp.moveaxis(x, -1, 0)

    def id_like(x_blocked, id_leaf):
        # identity broadcast to the carry shape (..., NB)
        return jnp.broadcast_to(
            jnp.asarray(id_leaf, x_blocked.dtype), x_blocked.shape[1:]
        )

    blocked = jax.tree.map(to_blocks, elems)
    if pad:
        # overwrite padded tail entries with the identity element so the
        # block totals stay correct
        idx = jnp.arange(NB * L).reshape(NB, L)
        valid = jnp.moveaxis(idx < n, -1, 0)  # (L, NB)

        def fix(x, id_leaf):
            idv = jnp.asarray(id_leaf, x.dtype)
            shape = [1] * x.ndim
            shape[0] = L
            shape[-1] = NB
            v = valid.reshape(L, *([1] * (x.ndim - 2)), NB)
            return jnp.where(v, x, idv)

        blocked = jax.tree.map(fix, blocked, identity)

    use_pallas = phase1 == "pallas"
    if use_pallas:
        lead = jax.tree.leaves(blocked)[0].shape[1:-1]
        lanes = int(np.prod(lead)) * NB if lead else NB
        uniform = all(
            x.shape == (L,) + lead + (NB,) for x in jax.tree.leaves(blocked)
        )
        if lanes % 1024 != 0 or not uniform:
            use_pallas = False  # fall back to the XLA lax.scan phase 1

    if use_pallas:
        L_CH = 32
        L_padded = -(-L // L_CH) * L_CH

        def to_tiles(x, idl):
            x = x.reshape(L, lanes)
            if L_padded != L:
                pad_rows = jnp.full(
                    (L_padded - L, lanes), jnp.asarray(idl, x.dtype)
                )
                x = jnp.concatenate([x, pad_rows], axis=0)
            return x.reshape(L_padded, lanes // 128, 128)

        tiled = jax.tree.map(to_tiles, blocked, identity)
        within_t = pallas_phase1_scan(combine, identity, tiled, L_padded, L_CH)

        def from_tiles(x):
            x = x.reshape(L_padded, lanes)[:L]
            return x.reshape((L,) + lead + (NB,))

        within = jax.tree.map(from_tiles, within_t)
        totals = jax.tree.map(lambda x: x[-1], within)
    else:
        init = jax.tree.map(id_like, blocked, identity)

        def step(carry, x):
            new = combine(carry, x)
            return new, new

        totals, within = jax.lax.scan(step, init, blocked, unroll=unroll)

    # phase 2: exclusive prefixes of the NB block totals
    incl = jax.lax.associative_scan(combine, totals, axis=-1)
    excl = jax.tree.map(
        lambda t, idl: jnp.concatenate(
            [
                jnp.broadcast_to(
                    jnp.asarray(idl, t.dtype), t.shape[:-1] + (1,)
                ),
                t[..., :-1],
            ],
            axis=-1,
        ),
        incl,
        identity,
    )

    # phase 3: fold exclusive prefixes into within-block results
    out = combine(excl, within)  # broadcast (.., NB) against (L, .., NB)

    def from_blocks(x):
        x = jnp.moveaxis(x, 0, -1)  # (..., NB, L)
        x = x.reshape(x.shape[:-2] + (NB * L,))
        return x[..., :n] if pad else x

    return jax.tree.map(from_blocks, out)
