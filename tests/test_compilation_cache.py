"""Persistent-compile-cache key stability (utils/compilation_cache.py).

The r5 find: Pallas custom-call payloads (and any module's debug
locations) embed up to 10 caller stack frames — including the __main__
script that invoked the jit — and the cache key's strip-debuginfo pass
cannot reach inside serialized payloads. Result: the SAME program got a
DIFFERENT persistent-cache key per caller file (bench.py vs warmup vs a
user script) and recompiled cold (~200-580s through the TPU tunnel).

``compilation_cache.enable()`` sets
``jax_include_full_tracebacks_in_locations = False`` so locations carry
only the defining frame (repo files — caller-independent). These tests
pin the mechanism end-to-end in subprocesses: the caller script's
filename must NOT appear in the lowered module's debug locations once
enable() ran, and MUST appear without it (proving the probe actually
exercises the embedding).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = """
import os, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
if os.environ.get("PROBE_ENABLE"):
    from factorized_tpu.utils.compilation_cache import enable
    enable(cache_dir=os.environ["PROBE_CACHE_DIR"])
import jax.numpy as jnp
from factorized_tpu.ops import losses

# grad of a repo-defined function: every location's defining frame is a
# repo file; the caller (this script) appears only via traceback frames.
lowered = jax.jit(jax.grad(losses.loss_kld)).lower(
    jnp.ones((8, 4), jnp.float32), jnp.zeros((8, 4), jnp.float32))
txt = lowered.as_text(debug_info=True)
print("MARKER_PRESENT" if {marker!r} in txt else "MARKER_ABSENT")
"""


def _run_probe(tmp_path, enable: bool) -> str:
    marker = "caller_probe_q3xk91"
    script = tmp_path / f"{marker}.py"
    script.write_text(_SCRIPT.format(repo=REPO, marker=marker))
    env = dict(os.environ)
    env.pop("FACTORIZED_TPU_NO_CACHE", None)
    env["PROBE_ENABLE"] = "1" if enable else ""
    env["PROBE_CACHE_DIR"] = str(tmp_path / "cache")
    out = subprocess.run([sys.executable, str(script)], env=env,
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr
    return out.stdout.strip().splitlines()[-1]


@pytest.mark.slow
def test_enable_makes_locations_caller_independent(tmp_path):
    assert _run_probe(tmp_path, enable=True) == "MARKER_ABSENT"


@pytest.mark.slow
def test_probe_detects_caller_embedding_without_enable(tmp_path):
    # Control: with JAX defaults the caller file IS embedded — proves
    # the probe exercises the mechanism the fix suppresses.
    assert _run_probe(tmp_path, enable=False) == "MARKER_PRESENT"
