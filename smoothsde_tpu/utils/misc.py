"""Small exported utilities mirroring /root/reference/R/utility.R."""

from __future__ import annotations

import warnings
from typing import Dict, List

import numpy as np


def prec_to_cov(prec_mat: np.ndarray) -> np.ndarray:
    """Invert a precision matrix, falling back to the Moore-Penrose
    pseudo-inverse with a warning when singular (utility.R:160-172)."""
    prec = np.asarray(prec_mat, float)
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
    (utility.R:188-196; row/col order (V, Z) as there)."""
    e1 = np.exp(-beta * dt)
    e2 = np.exp(-2.0 * beta * dt)
    q_vv = sigma**2 / (2.0 * beta) * (1.0 - e2)
    q_zz = (sigma / beta) ** 2 * (
        dt + (1.0 - e2) / (2.0 * beta) - 2.0 * (1.0 - e1) / beta
    )
    q_vz = sigma**2 / (2.0 * beta**2) * (1.0 - 2.0 * e1 + e2)
    return np.array([[q_vv, q_vz], [q_vz, q_zz]])
