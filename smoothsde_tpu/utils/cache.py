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


def _aot_dir() -> str | None:
    """Directory for serialized jax.export artifacts (next to the XLA
    cache). None when caching is disabled."""
    if os.environ.get("SMOOTHSDE_NO_COMPILE_CACHE"):
        return None
    base = os.environ.get("SMOOTHSDE_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "smoothsde_tpu"
    )
    d = os.path.join(base, "aot")
    os.makedirs(d, exist_ok=True)
    return d


def aot_cached(name: str, token: str | None, make_fn, example_args):
    """Executable cache over Python tracing, not just XLA compilation.

    The persistent XLA cache (above) removes backend compile time, but
    a warm re-fit still paid seconds of Python tracing + StableHLO
    lowering of the Laplace/Pallas graphs on its FIRST call (measured
    7.4 s for the 1.5k-step CTCRW config). This layer serializes the
    traced computation itself via jax.export; a later process
    deserializes the StableHLO (milliseconds) and only pays an XLA
    compile that the persistent cache then serves.

    `token` must capture everything the trace closes over — model
    structure, DATA (embedded as constants), options — see
    ObjectiveBundle.cache_token. Returns a jitted callable; falls back
    to plain jax.jit(make_fn()) when caching is off, the artifact
    can't be built (export limitations), or the blob is stale.
    """
    import jax

    d = _aot_dir()
    if d is None or token is None:
        return jax.jit(make_fn())
    from jax import export as jexport

    path = os.path.join(d, f"{name}-{token}.jaxexp")
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                exp = jexport.deserialize(bytearray(f.read()))
            return jax.jit(exp.call)
        except Exception:
            try:
                os.remove(path)  # stale/corrupt blob: rebuild below
            except OSError:
                pass
    fn = jax.jit(make_fn())
    try:
        exp = jexport.export(fn)(*example_args)
        blob = exp.serialize()
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        # return the export-backed callable so THIS process compiles the
        # same wrapped module later processes will load (its XLA compile
        # lands in the persistent cache for them)
        return jax.jit(exp.call)
    except Exception:
        return fn


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
