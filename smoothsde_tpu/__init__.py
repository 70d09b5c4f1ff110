"""smoothsde-tpu: TPU-native JAX framework for varying-coefficient SDE inference.

A from-scratch rebuild of the capabilities of the R package smoothSDE
(Michelot et al. 2021, JABES): SDE models (BM, OU, CIR, CTCRW and
state-space variants) whose parameters vary with covariates through
mgcv-style penalized splines and random effects.

Architecture (TPU-first, not a translation):
  - transition-density likelihoods are vectorized map-reduces (VPU),
  - Kalman filters run as `lax.scan` or log-depth `lax.associative_scan`,
  - the Laplace approximation over spline coefficients uses an inner Newton
    solver with implicit-function-theorem gradients (custom_vjp),
  - batching across animal tracks uses `vmap`, scale-out uses
    `jax.sharding.Mesh` + `shard_map` with psum reductions over ICI.

Reference behaviors are cited as /root/reference/<file>:<lines> in docstrings.
"""

__version__ = "0.1.0"

from smoothsde_tpu.models.registry import MODEL_TYPES, get_model_spec  # noqa: F401

# Heavier API surface is loaded lazily (PEP 562) so low-level ops can be
# imported without pulling in the full stack.
_LAZY = {
    "SDE": ("smoothsde_tpu.api.sde", "SDE"),
    "enable_compilation_cache": (
        "smoothsde_tpu.utils.cache", "enable_compilation_cache",
    ),
    "prec_to_cov": ("smoothsde_tpu.utils.misc", "prec_to_cov"),
    "term_indices": ("smoothsde_tpu.utils.misc", "term_indices"),
    "ctcrw_cov": ("smoothsde_tpu.utils.misc", "ctcrw_cov"),
}

__all__ = ["MODEL_TYPES", "get_model_spec", *_LAZY]


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'smoothsde_tpu' has no attribute '{name}'")
