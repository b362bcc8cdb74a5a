"""Persistent XLA compilation cache: first compiles through this
environment's TPU tunnel take minutes; caching them on disk makes every
subsequent process start warm."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = None):
    import jax

    try:
        if jax.default_backend() == "cpu":
            # CPU AOT executables from the remote compile service carry
            # machine features this host lacks (SIGILL risk) — cache only
            # the expensive tunnel-compiled TPU executables.
            return
    except Exception:
        return
    path = path or os.path.expanduser("~/.cache/graphtrans_tpu_xla")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
