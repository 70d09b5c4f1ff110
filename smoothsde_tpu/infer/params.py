"""Parameter packing: named parameter blocks <-> flat optimizer vectors,
with per-entry fixing (the TMB `map` mechanism, R/sde.R:621-632 and the
map entries built in setup, R/sde.R:511-518,563-568,644-648).

Blocks are named arrays (coeff_fe, log_lambda, coeff_re, log_sigma_obs,
...). Each entry is either free (estimated) or fixed at its initial
value. One block set is designated "inner" (coeff_re) for the Laplace
approximation; the remaining free entries form the outer vector.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class ParamBlock:
    name: str
    init: np.ndarray  # (k,)
    fixed: np.ndarray  # (k,) bool; True = not estimated


class ParamPacker:
    """inner: one block name, or a tuple of names — every free entry of
    an inner block is integrated out by the Laplace approximation
    (TMB's `random=` vector; `random=c("coeff_fe", "coeff_re")` is the
    TMB-documented REML construction)."""

    def __init__(self, blocks: List[ParamBlock], inner="coeff_re"):
        self.blocks = {b.name: b for b in blocks}
        self.order = [b.name for b in blocks]
        inner_names = (inner,) if isinstance(inner, str) else tuple(inner)
        self.inner = inner_names[0] if len(inner_names) == 1 else inner_names
        self._inner_set = set(inner_names)

        self._outer_index = []  # (block, idx) pairs in outer-vector order
        self._inner_index = []  # (block, idx) pairs in inner-vector order
        for name in self.order:
            b = self.blocks[name]
            target = (
                self._inner_index
                if name in self._inner_set
                else self._outer_index
            )
            for i in range(len(b.init)):
                if not b.fixed[i]:
                    target.append((name, i))
        self.n_outer = len(self._outer_index)
        self.n_inner = len(self._inner_index)

    # -- names --------------------------------------------------------------

    def outer_names(self) -> List[str]:
        return [name for name, _ in self._outer_index]

    def inner_names(self) -> List[str]:
        return [name for name, _ in self._inner_index]

    # -- packing ------------------------------------------------------------

    def outer_init(self) -> np.ndarray:
        return np.array(
            [self.blocks[n].init[i] for n, i in self._outer_index], float
        )

    def inner_init(self) -> np.ndarray:
        return np.array(
            [self.blocks[n].init[i] for n, i in self._inner_index], float
        )

    def unpack(self, outer, inner=None) -> Dict[str, jnp.ndarray]:
        """Build the full named parameter dict from flat free vectors,
        injecting fixed entries as constants."""
        outer = jnp.asarray(outer)
        full: Dict[str, jnp.ndarray] = {}
        per_block_idx: Dict[str, list] = {n: [] for n in self.order}
        for pos, (name, i) in enumerate(self._outer_index):
            per_block_idx[name].append((i, pos, "outer"))
        if inner is not None:
            inner = jnp.asarray(inner)
            for pos, (name, i) in enumerate(self._inner_index):
                per_block_idx[name].append((i, pos, "inner"))
        for name in self.order:
            b = self.blocks[name]
            base = jnp.asarray(b.init, outer.dtype)
            for src in ("outer", "inner"):
                pairs = [
                    (i, p) for i, p, tag in per_block_idx[name] if tag == src
                ]
                if pairs:
                    idx = np.array([i for i, _ in pairs])
                    pos = np.array([p for _, p in pairs])
                    vec = outer if src == "outer" else inner
                    base = base.at[idx].set(vec[pos])
            full[name] = base
        return full

    def split_estimates(self, outer, inner=None) -> Dict[str, np.ndarray]:
        """Full numpy dict of estimates (fixed entries at their values).

        Pure NumPy on purpose: this is host-side bookkeeping after a
        fit, and eager jnp scatter ops here would each pay a device
        dispatch (several seconds of a warm fit's wall-clock through a
        remote-TPU tunnel)."""
        outer = np.asarray(outer, float)
        inner_v = None if inner is None else np.asarray(inner, float)
        full: Dict[str, np.ndarray] = {}
        for name in self.order:
            full[name] = np.array(self.blocks[name].init, float)
        for pos, (name, i) in enumerate(self._outer_index):
            full[name][i] = outer[pos]
        if inner_v is not None:
            for pos, (name, i) in enumerate(self._inner_index):
                full[name][i] = inner_v[pos]
        return full
