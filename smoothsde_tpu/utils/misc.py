"""Small exported utilities mirroring /root/reference/R/utility.R."""

from __future__ import annotations

import warnings
from typing import Dict, List

import numpy as np


def prec_to_cov(prec_mat: np.ndarray) -> np.ndarray:
    """Invert a precision matrix, falling back to the Moore-Penrose
    pseudo-inverse with a warning when singular (utility.R:160-172)."""
    prec = np.asarray(prec_mat, float)
    if not np.all(np.isfinite(prec)):
        # pinv/SVD raise on non-finite input; zero the offending
        # entries and continue with the pseudo-inverse path below
        warnings.warn(
            "Precision matrix contains non-finite entries (the outer "
            "finite-difference Hessian hit a non-finite region); "
            "affected rows are dropped from the uncertainty estimates.",
            stacklevel=2,
        )
        prec = np.where(np.isfinite(prec), prec, 0.0)
    try:
        cov = np.linalg.solve(prec, np.eye(prec.shape[0]))
        if not np.all(np.isfinite(cov)):
            raise np.linalg.LinAlgError("non-finite inverse")
    except np.linalg.LinAlgError as err:
        warnings.warn(
            f"Inversion of precision matrix failed: {err}. Using the "
            "pseudo-inverse instead (uncertainty estimates may be "
            "unreliable).",
            stacklevel=2,
        )
        cov = np.linalg.pinv(prec)
    return cov


def term_indices(
    names_fe: List[str], names_re: List[str], term: str
) -> Dict[str, np.ndarray]:
    """Indices of coefficients whose names contain `term` as a substring
    (utility.R:137-144; same naive matching, documented as such)."""
    fe = np.array([i for i, nm in enumerate(names_fe) if term in nm], int)
    re = np.array([i for i, nm in enumerate(names_re) if term in nm], int)
    return {"fe": fe, "re": re}


def ctcrw_cov(beta: float, sigma: float, dt: float) -> np.ndarray:
    """Covariance of the joint (velocity, position) CTCRW transition
    (utility.R:188-196; row/col order (V, Z) as there). Uses the
    cancellation-free forms of ops/stable.py."""
    from smoothsde_tpu.ops.stable import ctcrw_transition_terms

    tt = ctcrw_transition_terms(
        np.asarray(beta, float), np.asarray(sigma, float) ** 2,
        np.asarray(dt, float), xp=np,
    )
    return np.array(
        [[tt["q11"], tt["q01"]], [tt["q01"], tt["q00"]]]
    )


def device_float(x):
    """Host-side dtype-exact transfer of `x` as the canonical JAX float.

    `jnp.asarray(x, float)` on a float64 NumPy array dispatches an eager
    convert_element_type op on the accelerator — through a remote-TPU
    tunnel each such op costs a ~0.5 s eager compile per process (no
    persistent-cache hit for eager ops). Casting in NumPy first makes
    the transfer a pure H2D copy.
    """
    import jax
    import jax.numpy as jnp

    dt = np.float64 if jax.config.jax_enable_x64 else np.float32
    return jnp.asarray(np.asarray(x, dt))


def device_int(x):
    """Same as device_float for the canonical JAX integer dtype."""
    import jax
    import jax.numpy as jnp

    dt = np.int64 if jax.config.jax_enable_x64 else np.int32
    return jnp.asarray(np.asarray(x, dt))
