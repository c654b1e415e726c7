"""Test configuration: force JAX onto CPU with 8 virtual devices so the
suite runs fast/everywhere and multi-device sharding tests work without
TPU hardware (SURVEY.md §4.5).

NOTE: this image preloads the `axon` TPU plugin (and parts of jax) at
interpreter startup, so JAX_PLATFORM* env vars set here are too late —
the programmatic `jax.config.update("jax_platforms", ...)` is the only
reliable override. XLA_FLAGS is still read lazily at backend creation.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# NOTE (r5, measured): do NOT enable the persistent XLA compile cache
# here. The suite is TRACING/interpret-bound, not XLA-compile-bound —
# cache-key hashing on every jit compile cost +12 min on a cold run
# (1767s vs ~640s) and a fully warm cache still measured slower than
# no cache at all (per-file A/B: 154s none / 163s cold / 139s warm,
# i.e. −10% warm but +6% on every first run; suite-wide the hashing
# overhead swamps the few >1s CPU compiles it saves).

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
