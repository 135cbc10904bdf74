"""Persistent XLA compilation cache wiring (utils/compile_cache.py).

The reference re-binds executors per shape (core/module.py:1041-1074) and pays
symbol compilation per process; the static-bucket design here compiles per
(program, bucket) and the persistent cache makes that once per machine."""

import os

import jax
import jax.numpy as jnp

from relation_tpu.utils.compile_cache import (enable_compile_cache,
                                              enable_from_env_or_cfg)


def test_cache_dir_populates(tmp_path):
    d = str(tmp_path / "xc")
    enable_compile_cache(d)
    try:
        x = jax.jit(lambda a: a * 3.0 + 1.0)(jnp.arange(8.0))
        assert float(x[1]) == 4.0
        assert os.listdir(d), "no cache entries written"
    finally:
        jax.config.update("jax_compilation_cache_dir", None)


def test_env_var_wins_over_cfg(tmp_path, monkeypatch):
    from relation_tpu.config.defaults import default_config
    cfg = default_config()
    cfg.TPU.COMPILE_CACHE_DIR = str(tmp_path / "from_cfg")
    env_dir = str(tmp_path / "from_env")
    monkeypatch.setenv("RELATION_TPU_COMPILE_CACHE", env_dir)
    try:
        enable_from_env_or_cfg(cfg)
        assert jax.config.jax_compilation_cache_dir == env_dir
        monkeypatch.delenv("RELATION_TPU_COMPILE_CACHE")
        enable_from_env_or_cfg(cfg)
        assert jax.config.jax_compilation_cache_dir == cfg.TPU.COMPILE_CACHE_DIR
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
