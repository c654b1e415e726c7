"""Training smoke tests on tiny synthetic data (SURVEY.md §4.4):
loss decreases, all trainer variants run end-to-end, padding/split
semantics of every dataset adapter."""

import numpy as np
import pytest

from factorized_tpu.config import MFMConfig, sample_search_config
from factorized_tpu.data import mmmo, mosi, moud, synthetic, youtube
from factorized_tpu import trainers
from factorized_tpu.utils.logging import RunLogger


TINY = dict(h_dims=[8, 8, 8], memsize=8, zy_size=8, zl_size=8, za_size=8,
            zv_size=8, fy_size=8, fl_size=8, fa_size=8, fv_size=8,
            att1_shape=8, att2_shape=8, gamma1_shape=8, gamma2_shape=8,
            out_shape=8, num_epochs=2, batchsize=16, seqlength=6)


def tiny_data(n=48, t=6, dims=(12, 4, 6), task="regression", seed=0):
    rng = np.random.default_rng(seed)
    d = sum(dims)
    w = rng.normal(size=(d,)) / np.sqrt(d)

    def split(n, s):
        X = rng.normal(size=(n, t, d)).astype(np.float32)
        sig = X.mean(1) @ w
        if task == "regression":
            y = (3 * sig).astype(np.float32)
        else:
            y = (sig > 0).astype(np.int64)
        return X, y

    return split(n, 0) + split(16, 1) + split(24, 2)


def tiny_cfg(task="regression", **kw):
    base = dict(TINY)
    base.update(input_dims=[12, 4, 6], task=task,
                output_dim=1 if task == "regression" else 2)
    base.update(kw)
    return MFMConfig(**base)


quiet = lambda: RunLogger(echo=False)


class TestTrainerVariants:
    def test_train_mfm_loss_decreases(self):
        data = tiny_data()
        cfg = tiny_cfg(num_epochs=6, lda_mmd=0.1)
        res = trainers.train_mfm(*data, cfg, logger=quiet(), lr=3e-3)
        losses = [h["train_loss"] for h in res["history"]]
        assert losses[-1] < losses[0]
        assert "mae" in res["metrics"]

    def test_train_mfm_kl(self):
        data = tiny_data()
        res = trainers.train_mfm(*data, tiny_cfg(model_type="kl"),
                                 logger=quiet())
        assert np.isfinite(res["metrics"]["mae"])

    def test_train_beta_vae_two_stage(self):
        data = tiny_data()
        res = trainers.train_beta_vae(*data, tiny_cfg(), logger=quiet())
        stages = {h["stage"] for h in res["history"]}
        assert stages == {1, 2}

    def test_train_missing_four_way(self):
        data = tiny_data()
        res = trainers.train_mfm_missing(*data, tiny_cfg(), logger=quiet())
        assert set(res["metrics"]) == {"y_hat", "y_hat_nol", "y_hat_noa",
                                       "y_hat_nov"}

    def test_train_test_zeros(self):
        data = tiny_data()
        res = trainers.train_mfm_test_zeros(*data, tiny_cfg(), logger=quiet())
        assert set(res["metrics"]) == {"y_hat_nol", "y_hat_noa", "y_hat_nov"}

    @pytest.mark.parametrize("mt", ["m_a", "m_b", "m_c", "m_d"])
    def test_train_ablations(self, mt):
        data = tiny_data()
        res = trainers.train_mfm_ablation(*data, tiny_cfg(model_type=mt),
                                          logger=quiet())
        assert np.isfinite(res["metrics"]["mae"])

    def test_train_seq2seq(self):
        data = tiny_data()
        res = trainers.train_seq2seq(*data, tiny_cfg(), logger=quiet())
        assert set(res["metrics"]) == {"x_l_nol_mse", "x_a_noa_mse",
                                       "x_v_nov_mse"}

    def test_train_basic_missing(self):
        data = tiny_data()
        res = trainers.train_basic_missing(*data, tiny_cfg(), logger=quiet())
        assert len(res["metrics"]) == 3

    def test_train_classification_with_remainder(self):
        data = tiny_data(n=50, task="classification")
        cfg = tiny_cfg(task="classification")
        res = trainers.train_mfm(*data, cfg, logger=quiet(),
                                 include_remainder=True)
        assert 0.0 <= res["metrics"]["accuracy"] <= 1.0

    def test_train_mfm_acc_maximizes(self):
        X_tr, y_tr, X_v, y_v, X_te, y_te = tiny_data()
        bin_ = lambda y: (y >= 0).astype(np.int64)
        res = trainers.train_mfm_acc(X_tr, bin_(y_tr), X_v, bin_(y_v),
                                     X_te, bin_(y_te), tiny_cfg(),
                                     logger=quiet())
        assert res["best_valid"] >= 0.0

    @pytest.mark.parametrize("kind", ["eflstm", "mfn", "self_attention"])
    def test_train_predictors(self, kind):
        data = tiny_data()
        res = trainers.train_predictor(*data, kind, tiny_cfg(), h=8,
                                       logger=quiet(), lr=1e-3)
        assert np.isfinite(res["metrics"]["mae"])


class TestDataAdapters:
    def test_mosi_shapes_and_dims(self):
        X_tr, y_tr, X_v, y_v, X_te, y_te = mosi.get_data(seqlength=10)
        assert X_tr.shape[1:] == (10, 325)  # 300 + 5 + 20
        assert y_tr.dtype == np.float32
        assert -3 <= y_tr.min() and y_tr.max() <= 3

    def test_mosi_left_pad_keep_last(self):
        segs = [{"text": np.arange(1, 4), "covarep": np.ones((3, 2)),
                 "facet": np.ones((3, 2)), "label": 0.0, "length": 3},
                {"text": np.arange(1, 9), "covarep": np.ones((8, 2)),
                 "facet": np.ones((8, 2)), "label": 0.0, "length": 8}]
        out = synthetic.pad_segments(segs, 5, side="left")
        # short: zeros FIRST then data (data_loader.py:139-147)
        np.testing.assert_array_equal(out["text"][0], [0, 0, 1, 2, 3])
        # long: keep LAST 5 (data_loader.py:148-152)
        np.testing.assert_array_equal(out["text"][1], [4, 5, 6, 7, 8])

    def test_moud_right_pad_and_classes(self):
        X_tr, y_tr, X_v, y_v, X_te, y_te = moud.get_data(seqlength=8)
        assert X_tr.shape[1:] == (8, 410)  # 300+74+36
        assert set(np.unique(y_tr)) <= {0, 1}
        assert np.abs(X_tr).max() <= 255.0

    def test_moud_split_counts(self):
        X_tr, _, X_v, _, X_te, _ = moud.get_data(seqlength=4)
        # 79 synthetic videos x 6 segments; reference counts the video
        # BEFORE its >=49/>=59 checks -> 48/10/21 (mfm_moud.py:90-107)
        assert X_tr.shape[0] == 48 * 6
        assert X_v.shape[0] == 10 * 6
        assert X_te.shape[0] == 21 * 6

    def test_youtube_three_classes(self):
        _, y_tr, _, _, _, y_te = youtube.get_data(seqlength=4)
        assert set(np.unique(np.concatenate([y_tr, y_te]))) <= {0, 1, 2}

    def test_mmmo_labels_and_pad_side(self):
        X_tr, y_tr, *_ = mmmo.get_data(seqlength=4)
        assert 1.0 <= y_tr.min() and y_tr.max() <= 7.0
        assert X_tr.shape[0] == 220  # 220 train videos x 1 segment

    def test_dict_pad_fallback_dims(self):
        out = synthetic.pad_dict_segment(np.float32(0.0), 5, "right", 74)
        assert out.shape == (5, 74) and not out.any()

    def test_right_vs_left_pad(self):
        data = np.ones((2, 3), np.float32)
        r = synthetic.pad_dict_segment(data, 4, "right", 3)
        l = synthetic.pad_dict_segment(data, 4, "left", 3)
        assert r[:2].all() and not r[2:].any()
        assert l[2:].all() and not l[:2].any()


class TestSearchConfig:
    def test_search_spaces_match_reference_lists(self):
        import random

        r = random.Random(0)
        for _ in range(20):
            cfg = sample_search_config("mosi", r)
            assert cfg.h_dims[0] in [32, 64, 88, 128, 156, 256]
            assert cfg.memsize in [64, 128, 256, 300, 400]
            assert cfg.lda_mmd in [10, 50, 100, 200]
            assert cfg.batchsize in [32, 64, 128]
            assert cfg.output_dim == 1
        cfg = sample_search_config("moud", r)
        assert cfg.input_dims == [300, 74, 36]
        assert cfg.output_dim == 2
        assert cfg.task == "classification"

    def test_legacy_roundtrip(self):
        from factorized_tpu.config import MFMConfig, best_acc_mosi_config

        cfg = best_acc_mosi_config()
        legacy = cfg.to_legacy()
        cfg2 = MFMConfig.from_legacy(legacy)
        assert cfg2.h_dims == cfg.h_dims
        assert cfg2.att1_shape == cfg.att1_shape
        assert cfg2.lda_mmd == cfg.lda_mmd


class TestDeviceBatcher:
    def test_matches_host_pipeline(self):
        from factorized_tpu.data.batcher import (
            DeviceBatcher,
            compute_train_max,
        )

        rng = np.random.default_rng(0)
        emb = rng.normal(size=(50, 16)).astype(np.float32)
        ids = rng.integers(0, 50, size=(6, 4))
        cov = rng.normal(size=(6, 4, 3)).astype(np.float32)
        fac = rng.normal(size=(6, 4, 5)).astype(np.float32)

        fmax = compute_train_max(fac)
        batcher = DeviceBatcher(emb, fmax)
        got = np.asarray(batcher(ids, cov, fac))
        want = np.concatenate([emb[ids], cov, fac / fmax], axis=2)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_train_max_zero_guard(self):
        from factorized_tpu.data.batcher import compute_train_max

        x = np.zeros((3, 2, 4), np.float32)
        x[..., 1] = 2.0
        m = compute_train_max(x)
        np.testing.assert_array_equal(m, [1.0, 2.0, 1.0, 1.0])


class TestDeterminism:
    def test_same_seed_identical_training(self):
        """Full reproducibility: same seed -> bitwise-identical history
        and test metrics (the reference's seed-123 discipline,
        mfm_mosi.py:1-6, made verifiable)."""
        data = tiny_data()
        cfg = tiny_cfg(num_epochs=2)
        r1 = trainers.train_mfm(*data, cfg, logger=quiet(), seed=5)
        r2 = trainers.train_mfm(*data, cfg, logger=quiet(), seed=5)
        assert r1["history"] == r2["history"]
        assert r1["metrics"] == r2["metrics"]
        r3 = trainers.train_mfm(*data, cfg, logger=quiet(), seed=6)
        assert r3["metrics"] != r1["metrics"]


class TestDivergenceGuard:
    def test_nan_aborts_run(self):
        """A diverging run (huge lr) stops at the first non-finite loss
        instead of wasting the remaining epochs."""
        data = tiny_data()
        cfg = tiny_cfg(num_epochs=10)
        res = trainers.train_mfm(*data, cfg, logger=quiet(), lr=1e18)
        assert len(res["history"]) < 10
        assert res["history"][-1].get("diverged", False) or all(
            np.isfinite(h["train_loss"]) for h in res["history"])
