"""Persistent XLA compilation cache for TPU runs.

The tracking/BA programs are large; on the tunneled TPU backend a cold
compile of the full frame program costs minutes. Enabling the persistent
cache makes every process after the first start in seconds. tests/conftest.py
does the same for the CPU suite; TPU entry points (bench.py, cli.py,
__graft_entry__) call this helper.
"""
from __future__ import annotations

import os

DEFAULT_DIR = os.environ.get("MCSLAM_JAX_CACHE", "/tmp/mcslam_jax_cache")


def enable_compile_cache(path: str = DEFAULT_DIR) -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass  # older jax without these flags: just skip caching
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
