"""Persistent compilation cache wiring (utils/cache.py)."""

import os

import jax

from smoothsde_tpu.utils.cache import (
    enable_compilation_cache,
    maybe_enable_default_cache,
)


def test_enable_sets_config(tmp_path, monkeypatch):
    monkeypatch.delenv("SMOOTHSDE_NO_COMPILE_CACHE", raising=False)
    prev = jax.config.jax_compilation_cache_dir
    try:
        d = enable_compilation_cache(str(tmp_path / "xla"))
        assert d == str(tmp_path / "xla")
        assert os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_opt_out_env(tmp_path, monkeypatch):
    monkeypatch.setenv("SMOOTHSDE_NO_COMPILE_CACHE", "1")
    prev = jax.config.jax_compilation_cache_dir
    try:
        assert enable_compilation_cache(str(tmp_path / "xla")) is None
        assert jax.config.jax_compilation_cache_dir == prev
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_maybe_enable_respects_existing(tmp_path, monkeypatch):
    monkeypatch.delenv("SMOOTHSDE_NO_COMPILE_CACHE", raising=False)
    import smoothsde_tpu.utils.cache as cache

    prev = jax.config.jax_compilation_cache_dir
    monkeypatch.setattr(cache, "_done", False)
    user_dir = str(tmp_path / "user")
    os.makedirs(user_dir)
    try:
        jax.config.update("jax_compilation_cache_dir", user_dir)
        maybe_enable_default_cache()
        # the user's configuration is left untouched
        assert jax.config.jax_compilation_cache_dir == user_dir
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_exported_from_package():
    import smoothsde_tpu

    assert smoothsde_tpu.enable_compilation_cache is enable_compilation_cache
