"""Persistent XLA compilation cache.

The flagship program (12-layer BERT + 6 LSTM scans, jitted as one module)
takes minutes to compile on first use; caching compiled executables on disk
makes every subsequent process start warm. Called by bench.py and the CLIs.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None):
    import jax

    path = path or os.path.join(
        os.path.expanduser("~"), ".cache", "ruart_jax_cache"
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
