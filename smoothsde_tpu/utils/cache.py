"""Persistent XLA compilation cache for fits.

The reference pays TMB's C++ template compile once at install time
(src/ is built when the R package is); our equivalent one-time cost is
XLA compilation of the jitted marginal/gradient graphs, which for
Laplace (random-effects) models runs 30-70 s through a remote-TPU
tunnel. JAX's persistent compilation cache amortizes it: the first fit
of a given model shape pays the compile, every later process reuses
the executable from disk.

Enabled automatically on the first `SDE.fit()` (see infer/fit.py)
unless the user already configured a cache or opted out with
SMOOTHSDE_NO_COMPILE_CACHE=1. The cache key includes the jaxlib /
compiler version and all shapes, so stale or mismatched entries are
never reused.
"""

from __future__ import annotations

import os

_done = False


def enable_compilation_cache(
    cache_dir: str | None = None,
    min_compile_time_secs: float = 1.0,
) -> str | None:
    """Point JAX's persistent compilation cache at `cache_dir`.

    Defaults to $SMOOTHSDE_CACHE_DIR, else ~/.cache/smoothsde_tpu/xla.
    Returns the directory in use (None if disabled via
    SMOOTHSDE_NO_COMPILE_CACHE). Safe to call repeatedly; later calls
    with a different directory re-point the cache.
    """
    global _done
    import jax

    if os.environ.get("SMOOTHSDE_NO_COMPILE_CACHE"):
        return None
    if cache_dir is None:
        cache_dir = os.environ.get("SMOOTHSDE_CACHE_DIR") or os.path.join(
            os.path.expanduser("~"), ".cache", "smoothsde_tpu", "xla"
        )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_time_secs
    )
    _done = True
    return cache_dir


def maybe_enable_default_cache() -> None:
    """Idempotent auto-enable hook called from `fit_model`.

    No-op when the user (or a tool) already configured
    jax_compilation_cache_dir, or opted out via env.
    """
    global _done
    if _done or os.environ.get("SMOOTHSDE_NO_COMPILE_CACHE"):
        return
    import jax

    if jax.config.jax_compilation_cache_dir:
        _done = True  # respect the existing configuration
        return
    enable_compilation_cache()
