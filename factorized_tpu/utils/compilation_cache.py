"""Persistent XLA compilation cache.

TPU compiles of the whole-epoch programs take tens of seconds (minutes
through a remote-tunnel device); the persistent cache makes every rerun
of the same (config, shape) combination start instantly. Enabled by the
CLI and bench entry points; opt out with FACTORIZED_TPU_NO_CACHE=1.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None):
    if os.environ.get("FACTORIZED_TPU_NO_CACHE"):
        return
    import jax

    cache_dir = cache_dir or os.environ.get(
        "FACTORIZED_TPU_CACHE_DIR",
        os.path.expanduser("~/.cache/factorized_tpu_xla"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
