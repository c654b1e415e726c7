"""Multiseed checkpoint/resume and no-silent-seed-downgrade guarantees.

VERDICT r2 items 2+3: a K-seed search killed mid-run must resume to the
EXACT state of an uninterrupted run (the production workload is the
K-seed random search), and ``--seeds > 1`` must never silently train a
single seed for model types the vmapped trainer does not implement.
"""

import numpy as np
import jax
import pytest

from factorized_tpu.config import MFMConfig
from factorized_tpu.parallel.multiseed import (
    MULTISEED_TYPES,
    train_mfm_multiseed,
)
from factorized_tpu.utils.logging import RunLogger

CFG = MFMConfig(
    input_dims=[12, 4, 6], h_dims=[6, 5, 4], memsize=6,
    zy_size=5, zl_size=6, za_size=4, zv_size=5,
    fy_size=4, fl_size=5, fa_size=4, fv_size=3,
    att1_shape=8, att2_shape=8, gamma1_shape=8, gamma2_shape=8,
    seqlength=5, batchsize=16,
)


def _data():
    rng = np.random.default_rng(0)
    d = CFG.d_total
    data = []
    for n in (48, 16, 24):
        X = rng.normal(size=(n, CFG.seqlength, d)).astype(np.float32)
        y = (X.mean((1, 2)) * 3).astype(np.float32)
        data.extend([X, y])
    return data


def _tree_allclose(a, b, atol=0.0):
    flat_a, _ = jax.tree.flatten(a)
    flat_b, _ = jax.tree.flatten(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol,
                                   rtol=0.0)


class TestMultiseedResume:
    @pytest.mark.slow
    def test_kill_and_resume_matches_uninterrupted(self, tmp_path):
        """Train 4 epochs + snapshot, resume for 2 more == one 6-epoch
        run: identical per-seed best-valids, metrics and best params."""
        data = _data()
        quiet = RunLogger(echo=False)
        K = 3
        ck = str(tmp_path / "ms_ckpt")

        full = train_mfm_multiseed(*data, CFG.replace(num_epochs=6),
                                   n_seeds=K, seed=5, logger=quiet)

        # "crash" after epoch 4 (snapshot every 2 epochs), then resume
        train_mfm_multiseed(*data, CFG.replace(num_epochs=4), n_seeds=K,
                            seed=5, logger=quiet, ckpt_dir=ck, ckpt_every=2)
        resumed = train_mfm_multiseed(*data, CFG.replace(num_epochs=6),
                                      n_seeds=K, seed=5, logger=quiet,
                                      resume_from=ck)

        assert [e["epoch"] for e in resumed["history"]] == [4, 5]
        for rf, rr in zip(full["results"], resumed["results"]):
            assert rf["best_valid"] == pytest.approx(rr["best_valid"],
                                                     abs=1e-6)
            assert rf["metrics"]["mae"] == pytest.approx(
                rr["metrics"]["mae"], abs=1e-5)
        assert full["best_seed"] == resumed["best_seed"]
        _tree_allclose(full["best_params"], resumed["best_params"],
                       atol=1e-6)

    @pytest.mark.slow
    def test_chunk_size_does_not_change_results(self, monkeypatch):
        """The epoch loop dispatches CHUNKS of epochs as one device
        program; chunk boundaries are an implementation detail — a
        5-epoch run chunked (5), (2,2,1) and (3,2) must produce the
        same per-epoch history and final results."""
        import factorized_tpu.parallel.multiseed as msm

        data = _data()
        quiet = RunLogger(echo=False)
        cfg = CFG.replace(num_epochs=5)
        ref = train_mfm_multiseed(*data, cfg, n_seeds=2, seed=5,
                                  logger=quiet)
        monkeypatch.setattr(msm, "DEFAULT_EPOCH_CHUNK", 2)
        small = train_mfm_multiseed(*data, cfg, n_seeds=2, seed=5,
                                    logger=quiet)
        monkeypatch.setattr(msm, "DEFAULT_EPOCH_CHUNK", 3)
        mid = train_mfm_multiseed(*data, cfg, n_seeds=2, seed=5,
                                  logger=quiet)
        for other in (small, mid):
            for ea, eb in zip(ref["history"], other["history"]):
                assert ea["epoch"] == eb["epoch"]
                np.testing.assert_allclose(ea["valids"], eb["valids"],
                                           rtol=0, atol=1e-6)
            for ra, rb in zip(ref["results"], other["results"]):
                assert ra["best_valid"] == pytest.approx(
                    rb["best_valid"], abs=1e-6)
                assert ra["metrics"]["mae"] == pytest.approx(
                    rb["metrics"]["mae"], abs=1e-5)

    @pytest.mark.slow
    def test_resume_rejects_seed_count_mismatch(self, tmp_path):
        data = _data()
        quiet = RunLogger(echo=False)
        ck = str(tmp_path / "ms_ckpt")
        train_mfm_multiseed(*data, CFG.replace(num_epochs=2), n_seeds=2,
                            seed=5, logger=quiet, ckpt_dir=ck, ckpt_every=1)
        with pytest.raises(ValueError, match="must match"):
            train_mfm_multiseed(*data, CFG.replace(num_epochs=4), n_seeds=4,
                                seed=5, logger=quiet, resume_from=ck)

    def test_snapshot_is_full_state(self, tmp_path):
        """The checkpoint holds live AND best param stacks plus
        scheduler internals for every seed."""
        import json
        import os

        data = _data()
        ck = str(tmp_path / "ms_ckpt")
        train_mfm_multiseed(*data, CFG.replace(num_epochs=2), n_seeds=2,
                            seed=5, logger=RunLogger(echo=False),
                            ckpt_dir=ck, ckpt_every=1)
        with open(os.path.join(ck, "meta.json")) as f:
            meta = json.load(f)
        assert meta["step"] == 2
        mcfg = meta["config"]
        assert mcfg["_ms_n_seeds"] == 2
        assert len(mcfg["_ms_best_valid"]) == 2
        assert len(mcfg["_ms_lrs"]) == 2
        assert {"lr", "best", "bad", "cooldown"} <= set(
            mcfg["_ms_sched"][0])


class TestNoSilentSeedDowngrade:
    def test_ablations_train_multiseed(self):
        """m_a..m_d share the joint loss and DO ride the vmapped path."""
        data = _data()
        res = train_mfm_multiseed(*data, CFG.replace(num_epochs=1),
                                  n_seeds=2, model_type="m_d",
                                  logger=RunLogger(echo=False))
        assert len(res["results"]) == 2

    @pytest.mark.parametrize("bad_type", ["kl_ef", "missing", "s2s", "bm"])
    def test_trainer_rejects_unsupported_types(self, bad_type):
        data = _data()
        with pytest.raises(ValueError, match="dedicated trainer"):
            train_mfm_multiseed(*data, CFG.replace(num_epochs=1), n_seeds=2,
                                model_type=bad_type,
                                logger=RunLogger(echo=False))

    @pytest.mark.parametrize(
        "extra",
        [["--type", "kl_ef"],
         ["--type", "mfm", "--missing", "1"],
         ["--type", "mfm", "--zeros", "1"],
         ["--type", "s2s", "--missing", "1"],
         ["--type", "bm", "--missing", "1"]],
    )
    def test_cli_refuses_loudly(self, extra, tmp_path):
        """Every model_type x --seeds 8 combo the multiseed trainer
        cannot handle exits with an explanation instead of silently
        training one seed (the round-2 silent-downgrade bug)."""
        from factorized_tpu.cli import main

        with pytest.raises(SystemExit, match="silently"):
            main(["mosi", "--mode", "single", "--epochs", "1",
                  "--seeds", "8", "--out", str(tmp_path)] + extra)

    def test_cli_supported_types_is_exact(self):
        assert set(MULTISEED_TYPES) == {"mfm", "kl", "m_a", "m_b", "m_c",
                                        "m_d"}

    @pytest.mark.parametrize("flag", [["--evolve", "4"], ["--bucket"]])
    def test_cli_refuses_search_flags_outside_search_mode(self, flag,
                                                          tmp_path):
        """--evolve/--bucket with --mode single/best must exit loudly
        instead of silently running a plain training run (the same
        silent-flag-drop pattern as the round-2 --seeds bug)."""
        from factorized_tpu.cli import main

        with pytest.raises(SystemExit, match="--mode search"):
            main(["mosi", "--mode", "single", "--epochs", "1",
                  "--out", str(tmp_path)] + flag)

    @pytest.mark.parametrize("flag", [["--evolve", "4"], ["--bucket"]])
    def test_cli_mosi_acc_refuses_search_flags(self, flag, tmp_path):
        from factorized_tpu.cli import main

        with pytest.raises(SystemExit, match="not wired"):
            main(["mosi_acc", "--mode", "search", "--epochs", "1",
                  "--out", str(tmp_path)] + flag)
