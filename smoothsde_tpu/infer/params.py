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
    def __init__(self, blocks: List[ParamBlock], inner: str = "coeff_re"):
        self.blocks = {b.name: b for b in blocks}
        self.order = [b.name for b in blocks]
        self.inner = inner

        self._outer_index = []  # (block, idx) pairs in outer-vector order
        for name in self.order:
            if name == inner:
                continue
            b = self.blocks[name]
            for i in range(len(b.init)):
                if not b.fixed[i]:
                    self._outer_index.append((name, i))
        inner_b = self.blocks.get(inner)
        self._inner_free = (
            ~inner_b.fixed if inner_b is not None else np.zeros(0, bool)
        )
        self.n_outer = len(self._outer_index)
        self.n_inner = int(self._inner_free.sum()) if inner_b is not None else 0

    # -- names --------------------------------------------------------------

    def outer_names(self) -> List[str]:
        return [name for name, _ in self._outer_index]

    def inner_names(self) -> List[str]:
        return [self.inner] * self.n_inner

    # -- packing ------------------------------------------------------------

    def outer_init(self) -> np.ndarray:
        return np.array(
            [self.blocks[n].init[i] for n, i in self._outer_index], float
        )

    def inner_init(self) -> np.ndarray:
        b = self.blocks.get(self.inner)
        if b is None:
            return np.zeros(0)
        return np.asarray(b.init, float)[self._inner_free]

    def unpack(self, outer, inner=None) -> Dict[str, jnp.ndarray]:
        """Build the full named parameter dict from flat free vectors,
        injecting fixed entries as constants."""
        outer = jnp.asarray(outer)
        full: Dict[str, jnp.ndarray] = {}
        # scatter outer entries
        per_block_idx: Dict[str, list] = {n: [] for n in self.order}
        for pos, (name, i) in enumerate(self._outer_index):
            per_block_idx[name].append((i, pos))
        for name in self.order:
            b = self.blocks[name]
            base = jnp.asarray(b.init, outer.dtype)
            if name == self.inner:
                if inner is None:
                    full[name] = base
                else:
                    inner = jnp.asarray(inner)
                    idx = np.where(self._inner_free)[0]
                    full[name] = base.at[idx].set(inner)
                continue
            pairs = per_block_idx[name]
            if pairs:
                idx = np.array([i for i, _ in pairs])
                pos = np.array([p for _, p in pairs])
                full[name] = base.at[idx].set(outer[pos])
            else:
                full[name] = base
        return full

    def split_estimates(self, outer, inner=None) -> Dict[str, np.ndarray]:
        """Full numpy dict of estimates (fixed entries at their values)."""
        full = self.unpack(jnp.asarray(outer), None if inner is None else jnp.asarray(inner))
        return {k: np.asarray(v) for k, v in full.items()}
