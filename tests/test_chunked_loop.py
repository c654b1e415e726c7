"""Chunked single-seed trainer loop vs the per-epoch host loop.

trainers._loop now dispatches whole CHUNKS of epochs as one device
program (train._compile_chunked_loop); FACTORIZED_TPU_HOST_LOOP=1
forces the original per-epoch host loop. These tests assert the two
paths produce identical training dynamics (losses bitwise, lr to f32
rounding), identical best-keeper decisions, identical divergence
handling, and that chunk boundaries align to the --ckpt-every cadence
so crash-resume reproduces the uninterrupted run.
"""

import os

import numpy as np
import pytest

from factorized_tpu import trainers
from factorized_tpu.utils.logging import RunLogger

from test_training import tiny_cfg, tiny_data

# every parity test compiles TWO loop programs per trainer (~1-2 min
# each) — the single biggest block of suite wall time
pytestmark = pytest.mark.slow

quiet = lambda: RunLogger(echo=False)

# small chunk: multi-chunk carry threading is exercised with ONE
# compiled chunk shape (12 epochs -> 3 chunks of 4, not 10+2).
# autouse fixture (not a module-level env write): the env var must not
# leak into other test modules in the same pytest process, which would
# silently stop exercising the production DEFAULT_EPOCH_CHUNK=10 path.
@pytest.fixture(autouse=True)
def _chunk4(monkeypatch):
    monkeypatch.setenv("FACTORIZED_TPU_EPOCH_CHUNK", "4")


def _run_both(fn, *args, **kw):
    os.environ["FACTORIZED_TPU_HOST_LOOP"] = "1"
    try:
        host = fn(*args, **kw)
    finally:
        os.environ.pop("FACTORIZED_TPU_HOST_LOOP", None)
    chunk = fn(*args, **kw)
    return host, chunk


def _assert_histories_match(h_host, h_chunk):
    assert len(h_host) == len(h_chunk)
    for a, b in zip(h_host, h_chunk):
        assert a["epoch"] == b["epoch"]
        # losses come off the same f32 device values in both paths
        # (equal_nan: diverged epochs record NaN on both sides)
        assert np.isclose(a["train_loss"], b["train_loss"], rtol=0, atol=0,
                          equal_nan=True), (a, b)
        assert np.isclose(a["valid"], b["valid"], rtol=0, atol=0,
                          equal_nan=True), (a, b)
        assert a.get("diverged") == b.get("diverged")
        if "lr" in a:
            # host records python-f64 lr, chunked the f32 device value
            assert np.float32(a["lr"]) == np.float32(b["lr"]), (a, b)


def _assert_params_equal(pa, pb):
    import jax

    la, lb = jax.tree.leaves(pa), jax.tree.leaves(pb)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        # equal_nan: diverged-run live params are NaN-poisoned on both
        # sides and must still match leaf-for-leaf
        assert np.array_equal(np.asarray(x), np.asarray(y),
                              equal_nan=True)


class TestChunkedParity:
    def test_train_mfm_bitwise(self):
        data = tiny_data()
        cfg = tiny_cfg(num_epochs=12, lda_mmd=0.1)  # crosses the chunk-10 boundary
        host, chunk = _run_both(trainers.train_mfm, *data, cfg,
                                logger=quiet(), lr=3e-3)
        _assert_histories_match(host["history"], chunk["history"])
        assert host["best_valid"] == chunk["best_valid"]
        assert host["step"] == chunk["step"]
        _assert_params_equal(host["params"], chunk["params"])
        assert host["metrics"] == chunk["metrics"]

    def test_train_mfm_remainder_batch(self):
        # 48 train samples, batch 20 -> 2 full batches + ragged 8
        data = tiny_data()
        cfg = tiny_cfg(num_epochs=5, batchsize=20)
        host, chunk = _run_both(trainers.train_mfm, *data, cfg,
                                logger=quiet(), lr=3e-3,
                                include_remainder=True)
        _assert_histories_match(host["history"], chunk["history"])
        _assert_params_equal(host["params"], chunk["params"])

    def test_train_mfm_acc_device_metric(self):
        X_tr, y_tr, X_v, y_v, X_te, y_te = tiny_data(task="classification")
        bin_ = lambda y: (np.asarray(y) > 0).astype(np.int64)
        cfg = tiny_cfg(task="classification", num_epochs=12)
        host, chunk = _run_both(
            trainers.train_mfm_acc, X_tr, bin_(y_tr), X_v, bin_(y_v),
            X_te, bin_(y_te), cfg, logger=quiet())
        _assert_histories_match(host["history"], chunk["history"])
        assert host["best_valid"] == chunk["best_valid"]
        _assert_params_equal(host["params"], chunk["params"])

    def test_train_beta_vae_save_always(self):
        data = tiny_data()
        cfg = tiny_cfg(num_epochs=6)
        host, chunk = _run_both(trainers.train_beta_vae, *data, cfg,
                                logger=quiet())
        _assert_histories_match(host["history"], chunk["history"])
        assert [h["stage"] for h in host["history"]] == \
            [h["stage"] for h in chunk["history"]]
        _assert_params_equal(host["params"], chunk["params"])

    def test_divergence_truncates_identically(self):
        data = tiny_data()
        cfg = tiny_cfg(num_epochs=6)
        host, chunk = _run_both(trainers.train_mfm, *data, cfg,
                                logger=quiet(), lr=1e18)
        assert any(h.get("diverged") for h in chunk["history"])
        _assert_histories_match(host["history"], chunk["history"])
        assert host["step"] == chunk["step"]
        # diverge-before-first-save: lr=1e18 blows up at epoch 0, so no
        # best was ever kept and the returned params are the LIVE
        # carried state — the alive gate must freeze the chunked loop's
        # params at the diverged epoch, exactly where the host loop's
        # break leaves them (bitwise, NaNs included)
        assert host["history"][0].get("diverged")
        _assert_params_equal(host["params"], chunk["params"])

    def test_missing_variant(self):
        # representative of the non-joint loss variants (richest
        # eval_fn — the full 4-way composite loss); s2s/bm share the
        # exact same _loop machinery
        data = tiny_data()
        host, chunk = _run_both(trainers.train_mfm_missing, *data,
                                tiny_cfg(num_epochs=3), logger=quiet())
        _assert_histories_match(host["history"], chunk["history"])
        _assert_params_equal(host["params"], chunk["params"])


class TestChunkedSnapshotResume:
    def test_ckpt_every_alignment_and_resume(self, tmp_path):
        """--ckpt-every cadence: chunk boundaries align so the snapshot
        fires at the same absolute epochs as the host loop, the saved
        state is identical, and a chunked resume matches a host-loop
        resume epoch for epoch."""
        from factorized_tpu.cli import make_autosnapshot
        from factorized_tpu.utils.checkpoint import restore_checkpoint

        data = tiny_data()
        cfg6 = tiny_cfg(num_epochs=6)

        def run6(out):
            snap = make_autosnapshot(str(out), "t", cfg6, 4)
            assert snap.every == 4
            return trainers.train_mfm(*data, cfg6, logger=quiet(), lr=3e-3,
                                      snapshot=snap)

        host_dir, chunk_dir = tmp_path / "h", tmp_path / "c"
        (host_dir).mkdir(), (chunk_dir).mkdir()
        os.environ["FACTORIZED_TPU_HOST_LOOP"] = "1"
        try:
            run6(host_dir)
        finally:
            os.environ.pop("FACTORIZED_TPU_HOST_LOOP", None)
        run6(chunk_dir)

        # cadence 4 over 6 epochs -> exactly one snapshot at step 4
        sh, mh = restore_checkpoint(str(host_dir / "ckpt_auto_t"))
        sc, mc = restore_checkpoint(str(chunk_dir / "ckpt_auto_t"))
        assert mh["step"] == mc["step"] == 4
        assert np.float32(mh["config"]["_resume_lr"]) == \
            np.float32(mc["config"]["_resume_lr"])
        assert mh["config"]["_resume_best_valid"] == \
            mc["config"]["_resume_best_valid"]
        _assert_params_equal(sh["params"], sc["params"])

        # resuming from the (identical) checkpoint: both loop modes
        # produce the same continued dynamics
        cfg12 = tiny_cfg(num_epochs=12)
        rhost, rchunk = _run_both(
            trainers.train_mfm, *data, cfg12, logger=quiet(), lr=3e-3,
            resume_from=str(chunk_dir / "ckpt_auto_t"))
        _assert_histories_match(rhost["history"], rchunk["history"])
        assert rhost["step"] == rchunk["step"] == 12
        _assert_params_equal(rhost["params"], rchunk["params"])

    def test_snapshot_without_cadence_falls_back_to_host(self):
        """A snapshot callback with no .every is called EVERY epoch —
        the loop must fall back to per-epoch stepping for it."""
        data = tiny_data()
        cfg = tiny_cfg(num_epochs=5)
        calls = []
        snap = lambda e, *a: calls.append(e)
        trainers.train_mfm(*data, cfg, logger=quiet(), lr=3e-3,
                           snapshot=snap)
        assert calls == [0, 1, 2, 3, 4]
