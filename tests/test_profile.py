"""--profile DIR wraps the whole CLI run in a jax.profiler trace
(SURVEY.md §5.1 — the reference's only profiling is the ad-hoc
``time.time()`` probe at ``test_mosi.py:335-342``)."""

import os

import pytest

from factorized_tpu.cli import main


@pytest.mark.slow
def test_cli_profile_writes_trace(tmp_path):
    out = tmp_path / "runs"
    prof = tmp_path / "trace"
    rc = main(["mosi", "--mode", "single", "--type", "mfm",
               "--epochs", "1", "--batchsize", "32",
               "--out", str(out), "--profile", str(prof)])
    assert rc == 0
    dumped = [os.path.join(r, f)
              for r, _, fs in os.walk(prof) for f in fs]
    assert dumped, "no profiler trace files were written"
    # TensorBoard layout: <dir>/plugins/profile/<run>/<host>.xplane.pb
    assert any("plugins" in p for p in dumped)
