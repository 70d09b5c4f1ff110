"""Smoothing penalty: Gaussian priors on smooth coefficients.

Reference semantics (nllk_sde.hpp:91-124 for closed-form models — a
fully normalized Gaussian log-prior N(0, (lambda S)^-1) — and the
constant-free variant used by the Kalman models, e.g.
nllk_ctcrw.hpp:256-280):

  nllk += sum_i [ -Sn_i/2 * log(lambda_i) + lambda_i/2 * b_i' S_i b_i
                  (+ Sn_i/2 log(2 pi) - 1/2 log det S_i  if normalize) ]

Multi-penalty groups (tensor-product smooths te/ti — BEYOND the
reference, whose TMB penalty assumes one lambda per block): a block's
prior precision is P(lambda) = sum_j lambda_j S_j over shared
coefficients, contributing

  nllk += 1/2 b' P b - 1/2 log det P (+ p/2 log 2pi if normalize)

with log det P evaluated in-graph (small dense blocks). Use shrinkage
margins (bs='cs') so P is SPD — the same proper-prior requirement the
single-penalty normalized path puts on S.

Single-matrix log-determinants are data constants precomputed on host.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np

_LOG_2PI = float(np.log(2.0 * np.pi))


def make_penalty(S_groups: List[List[np.ndarray]], normalize: bool):
    """Build penalty_fn(coeff_re, log_lambda) -> scalar nllk term.

    S_groups: one entry per coefficient block; each entry is the list
    of penalty matrices over that block's coefficients. log_lambda is
    indexed over the flattened matrix order.
    """
    # backward compatibility: a flat list of matrices = singleton groups
    if S_groups and isinstance(S_groups[0], np.ndarray):
        S_groups = [[S] for S in S_groups]
    sizes = [g[0].shape[0] for g in S_groups]
    offsets = np.concatenate([[0], np.cumsum(sizes)]).astype(int)
    groups_dev = [[jnp.asarray(S) for S in g] for g in S_groups]
    logdets = [
        float(np.linalg.slogdet(g[0])[1]) if (normalize and len(g) == 1)
        else 0.0
        for g in S_groups
    ]

    def penalty(coeff_re, log_lambda):
        total = jnp.asarray(0.0, dtype=jnp.result_type(coeff_re, float))
        li = 0
        for i, g in enumerate(groups_dev):
            b = coeff_re[offsets[i] : offsets[i + 1]]
            if len(g) == 1:
                quad = b @ (g[0] @ b)
                term = -0.5 * sizes[i] * log_lambda[li] + 0.5 * jnp.exp(
                    log_lambda[li]
                ) * quad
                if normalize:
                    term = (
                        term + 0.5 * sizes[i] * _LOG_2PI - 0.5 * logdets[i]
                    )
                li += 1
            else:
                lams = jnp.exp(log_lambda[li : li + len(g)])
                P = sum(lam * S for lam, S in zip(lams, g))
                quad = b @ (P @ b)
                sign, logdetP = jnp.linalg.slogdet(P)
                term = 0.5 * quad - 0.5 * logdetP
                if normalize:
                    term = term + 0.5 * sizes[i] * _LOG_2PI
                li += len(g)
            total = total + term
        return total

    return penalty
