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
    # CALLER-INDEPENDENT cache keys (r5 find): Pallas custom-call
    # payloads are separately-serialized Mosaic modules whose location
    # metadata embeds up to jax_traceback_in_locations_limit=10 Python
    # frames — including the __main__ script that invoked the jit — and
    # the cache key's strip-debuginfo pass cannot reach inside the
    # payload. Any program whose backward traces a Pallas kernel from a
    # different caller file (bench.py vs warmup vs a user script) got a
    # DIFFERENT key and recompiled cold (~200-580s through the tunnel,
    # observed every round). Limiting locations to the defining frame
    # (repo files, caller-independent) makes the keys stable.
    jax.config.update("jax_include_full_tracebacks_in_locations", False)
