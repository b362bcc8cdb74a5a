"""Persistent XLA compilation cache: first compiles through this
environment's TPU tunnel take minutes; caching them on disk makes every
subsequent process start warm."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = None):
    import jax

    path = path or os.path.expanduser("~/.cache/graphtrans_tpu_xla")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
