"""Persistent XLA compilation cache.

The static-shape design compiles one program per image bucket (the reference
instead rebinds MXNet executors on shape change, core/module.py:1041-1074 —
cheap, but re-paid every process AND every batch-shape flip). With the on-disk
cache, each (program, bucket) compiles once per MACHINE: every later process —
reruns, eval after train, multi-bucket sweeps — deserializes the compiled
executable instead of recompiling.

Wired through cfg.TPU.COMPILE_CACHE_DIR (experiments/train.py, test.py) and
the RELATION_TPU_COMPILE_CACHE env var (tools).
"""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str) -> None:
    """Turn on JAX's persistent compilation cache rooted at ``cache_dir``."""
    if not cache_dir:
        return
    import jax
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache every program: the per-bucket predict/train programs are exactly
    # the expensive ones, and tiny test programs are harmless to keep
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def enable_from_env_or_cfg(cfg=None) -> None:
    """Env var wins; else cfg.TPU.COMPILE_CACHE_DIR if set."""
    cache_dir = os.environ.get("RELATION_TPU_COMPILE_CACHE", "")
    if not cache_dir and cfg is not None:
        cache_dir = str(cfg.TPU.get("COMPILE_CACHE_DIR", "") or "")
    if cache_dir:
        enable_compile_cache(cache_dir)
