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

# Bump on any change to the objective/kernel math that a source-digest
# miss could fail to capture (e.g. a change routed through data files).
# Part of the cache token's code identity.
CACHE_SCHEMA_VERSION = 1

_src_digest: str | None = None


def source_digest() -> str:
    """Digest of the installed smoothsde_tpu source (plus the schema
    version): the code-identity component of the AOT cache token.

    Without it, any change to the objective/Laplace/kernel math between
    installs would silently replay the OLD serialized computation for
    matching (model, data) keys — TMB's equivalent is recompiling
    whenever the C++ template changes (src/Makefile semantics).
    Computed once per process (~500 KB of source, <10 ms).
    """
    global _src_digest
    if _src_digest is None:
        import hashlib

        import smoothsde_tpu

        root = os.path.dirname(os.path.abspath(smoothsde_tpu.__file__))
        h = hashlib.sha256()
        h.update(f"schema={CACHE_SCHEMA_VERSION}".encode())
        h.update(getattr(smoothsde_tpu, "__version__", "0").encode())
        for dirpath, dirnames, filenames in sorted(os.walk(root)):
            dirnames.sort()
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if fn.endswith((".py", ".so")):
                    p = os.path.join(dirpath, fn)
                    h.update(os.path.relpath(p, root).encode())
                    with open(p, "rb") as f:
                        h.update(f.read())
        _src_digest = h.hexdigest()[:16]
    return _src_digest


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


def guard_first_call(exp_fn, path: str, make_fn, fallback=None):
    """Wrap an export-backed callable so a failure at CALL time falls
    back to plain jit and deletes the on-disk blob.

    jax.export records the device assignment of the exporting context;
    a mesh-closing computation exported "for 8 devices" raises only
    when exp.call is invoked under a different device context — outside
    any try/except that guards export itself. Worse, the blob was
    already persisted, so every later process with the same token would
    inherit the failure. This guard makes the failure self-healing:
    first failing call removes the blob and transparently re-runs via
    jax.jit(make_fn()).
    """
    state: dict = {}

    def call(*args):
        if "fn" in state:
            return state["fn"](*args)
        try:
            out = exp_fn(*args)
        except Exception:
            try:
                os.remove(path)
            except OSError:
                pass
            import jax

            state["fn"] = (
                fallback if fallback is not None else jax.jit(make_fn())
            )
            return state["fn"](*args)
        state["fn"] = exp_fn
        return out

    return call


def _export_backend_ok() -> bool:
    """Whether the jax.export replay layer is safe on this backend.

    TPU only (see `aot_cached` docstring). SMOOTHSDE_AOT_ANY_BACKEND=1
    is a test hook that lets the unit tests exercise the export
    round-trip machinery on CPU with trivial graphs; it is NOT safe
    for real fits on CPU.
    """
    if os.environ.get("SMOOTHSDE_AOT_ANY_BACKEND"):
        return True
    import jax

    return jax.default_backend() == "tpu"


# Process-level memo over aot_cached: (name, token) -> callable. A
# second fit of the same model in one process (multi-start, profile
# sweeps, bootstrap-style refits — the reference's driver.R workflow)
# otherwise rebuilds the jit wrapper and pays the multi-second
# executable reload through the remote tunnel again (measured: 3.8 s
# per fit on the 1M-step configs for a 55 ms dispatch). The token
# embeds the package source digest and the model/data content, so a
# stale hit is impossible within a process.
_live: dict = {}


def aot_cached(name: str, token: str | None, make_fn, example_args,
               allow_export: bool = True):
    """Executable cache over Python tracing, not just XLA compilation.

    The persistent XLA cache (above) removes backend compile time, but
    a warm re-fit still paid seconds of Python tracing + StableHLO
    lowering of the Laplace/Pallas graphs on its FIRST call (measured
    7.4 s for the 1.5k-step CTCRW config). This layer serializes the
    traced computation itself via jax.export; a later process
    deserializes the StableHLO (milliseconds) and only pays an XLA
    compile that the persistent cache then serves.

    `token` must capture everything the trace closes over — model
    structure, DATA (embedded as constants), options, and the package
    source digest (code identity) — see ObjectiveBundle.cache_token.
    Returns a jitted callable; falls back to plain jax.jit(make_fn())
    when caching is off, the artifact can't be built (export
    limitations), the blob is stale, or the deserialized executable
    fails on first call (guard_first_call).

    `allow_export=False` skips the export layer entirely (plain jit,
    still served by the persistent XLA cache). Mesh-closing
    computations MUST pass False: jax.export pins the exporting device
    assignment and the replayed call is only valid under an identical
    device context — the round-3 time-sharded-fit regression.

    TPU-only, like `maybe_enable_default_cache`: replaying an XLA:CPU
    executable serialized by an earlier process can crash the process
    outright (observed 2026-08-21: SIGSEGV inside the reloaded
    executable on the second warm-cache CPU run — jaxlib 0.9.0; same
    loader-feature-mismatch class as the `cpu_aot_loader` SIGILL
    documented below). A segfault cannot be caught in-process, so
    `guard_first_call` cannot self-heal it and the on-disk blob would
    permanently poison every later CPU process with the same token.
    CPU tracing is cheap; the layer exists to amortize remote-TPU
    compiles only.
    """
    import jax

    d = _aot_dir()
    if (d is None or token is None or not allow_export
            or not _export_backend_ok()):
        return jax.jit(make_fn())
    key = (name, token)
    if key in _live:
        return _live[key]
    from jax import export as jexport

    path = os.path.join(d, f"{name}-{token}.jaxexp")
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                exp = jexport.deserialize(bytearray(f.read()))
            out = guard_first_call(jax.jit(exp.call), path, make_fn)
            _live[key] = out
            return out
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
        # lands in the persistent cache for them); guarded so a call-time
        # failure un-persists the blob instead of poisoning every later
        # process with the same token
        out = guard_first_call(jax.jit(exp.call), path, make_fn,
                               fallback=fn)
        _live[key] = out
        return out
    except Exception:
        return fn


def maybe_enable_default_cache() -> None:
    """Idempotent auto-enable hook called from `fit_model`.

    No-op when the user (or a tool) already configured
    jax_compilation_cache_dir, or opted out via env.

    TPU-only by default: the cache exists to amortize the 30-70 s
    remote-tunnel compiles; CPU compiles are cheap AND reloading
    XLA:CPU AOT cache entries can crash outright when the loader
    rejects the compile-time machine features (observed 2026-08-21:
    `cpu_aot_loader` warns "+prefer-no-scatter is not supported on the
    host machine ... could lead to execution errors such as SIGILL",
    followed by a segfault inside the reloaded executable — jaxlib
    0.9.0). Users who want it on CPU can call
    enable_compilation_cache() explicitly.
    """
    global _done
    if _done or os.environ.get("SMOOTHSDE_NO_COMPILE_CACHE"):
        return
    import jax

    if jax.config.jax_compilation_cache_dir:
        _done = True  # respect the existing configuration
        return
    if jax.default_backend() != "tpu":
        return
    enable_compilation_cache()
