"""Smoothing penalty: independent Gaussian priors on smooth coefficients.

Reference semantics (nllk_sde.hpp:91-124 for closed-form models — a
fully normalized Gaussian log-prior N(0, (lambda S)^-1) — and the
constant-free variant used by the Kalman models, e.g.
nllk_ctcrw.hpp:256-280):

  nllk += sum_i [ -Sn_i/2 * log(lambda_i) + lambda_i/2 * b_i' S_i b_i
                  (+ Sn_i/2 log(2 pi) - 1/2 log det S_i  if normalize) ]

S-block log-determinants are data constants and precomputed on host.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np

_LOG_2PI = float(np.log(2.0 * np.pi))


def make_penalty(S_blocks: List[np.ndarray], normalize: bool):
    """Build penalty_fn(coeff_re, log_lambda) -> scalar nllk term."""
    sizes = [S.shape[0] for S in S_blocks]
    offsets = np.concatenate([[0], np.cumsum(sizes)]).astype(int)
    S_dev = [jnp.asarray(S) for S in S_blocks]
    if normalize:
        logdets = [float(np.linalg.slogdet(S)[1]) for S in S_blocks]
    else:
        logdets = [0.0] * len(S_blocks)

    def penalty(coeff_re, log_lambda):
        total = jnp.asarray(0.0, dtype=jnp.result_type(coeff_re, float))
        for i, S in enumerate(S_dev):
            b = coeff_re[offsets[i] : offsets[i + 1]]
            quad = b @ (S @ b)
            term = -0.5 * sizes[i] * log_lambda[i] + 0.5 * jnp.exp(
                log_lambda[i]
            ) * quad
            if normalize:
                term = term + 0.5 * sizes[i] * _LOG_2PI - 0.5 * logdets[i]
            total = total + term
        return total

    return penalty
