"""Metrics vs sklearn (where available) and scheduler vs torch."""

import numpy as np
import pytest

from factorized_tpu.utils import metrics as M
from factorized_tpu.utils.scheduler import ReduceLROnPlateau

sklearn = pytest.importorskip("sklearn")
from sklearn.metrics import accuracy_score, confusion_matrix, f1_score  # noqa: E402


RNG = np.random.default_rng(0)


class TestMetricsVsSklearn:
    def test_f1_weighted(self):
        for _ in range(5):
            y_true = RNG.integers(-3, 4, size=50)
            y_pred = RNG.integers(-3, 4, size=50)
            np.testing.assert_allclose(
                M.f1_weighted(y_true, y_pred),
                f1_score(y_true, y_pred, average="weighted"),
                rtol=1e-9,
            )

    def test_f1_weighted_boolean(self):
        y_true = RNG.normal(size=100) >= 0
        y_pred = RNG.normal(size=100) >= 0
        np.testing.assert_allclose(
            M.f1_weighted(y_true, y_pred),
            f1_score(y_true, y_pred, average="weighted"),
            rtol=1e-9,
        )

    def test_confusion_matrix(self):
        y_true = RNG.integers(0, 3, size=40)
        y_pred = RNG.integers(0, 3, size=40)
        got, _ = M.confusion_matrix(y_true, y_pred)
        np.testing.assert_array_equal(got, confusion_matrix(y_true, y_pred))

    def test_accuracy(self):
        y_true = RNG.integers(0, 2, size=40)
        y_pred = RNG.integers(0, 2, size=40)
        assert M.accuracy(y_true, y_pred) == accuracy_score(y_true, y_pred)

    def test_classification_report_weighted_row_parsable(self):
        """check.py parses line.split()[4] of the 'weighted avg' row
        (check.py:182-183) — our report must keep that shape."""
        y_true = RNG.integers(0, 2, size=60)
        y_pred = RNG.integers(0, 2, size=60)
        rep = M.classification_report(y_true, y_pred)
        row = [l for l in rep.splitlines() if "weighted avg" in l][0]
        f1 = float(row.split()[4])
        np.testing.assert_allclose(
            f1, f1_score(y_true, y_pred, average="weighted"), atol=1e-5
        )


class TestRegressionScore:
    def test_mult_acc_and_threshold_modes(self):
        pred = np.array([0.4, -1.2, 2.6, 0.0])
        y = np.array([0.0, -1.0, 3.0, -0.6])
        assert M.mult_acc(pred, y) == 0.75  # round: 0,-1,3,0 vs 0,-1,3,-1
        # 0.0 >= 0 is positive in ge mode but not in gt mode
        m_ge = M.regression_metrics(np.array([0.0]), np.array([0.5]), 0.0, "ge")
        m_gt = M.regression_metrics(np.array([0.0]), np.array([0.5]), 0.0, "gt")
        assert m_ge["binary_accuracy"] == 1.0
        assert m_gt["binary_accuracy"] == 0.0

    def test_score_prints_reference_format(self, capsys):
        pred = RNG.normal(size=50)
        y = RNG.normal(size=50)
        M.score_regression(pred, y)
        outp = capsys.readouterr().out
        # the load-bearing lines check.py greps (check.py:174-189)
        mae_lines = [l for l in outp.splitlines()
                     if "mae" in l and len(l.split()) == 2]
        assert len(mae_lines) == 1
        assert any("corr:" in l for l in outp.splitlines())
        assert any("mult_acc" in l for l in outp.splitlines())
        assert any(l.startswith("Accuracy ") for l in outp.splitlines())
        assert "Confusion Matrix :" in outp
        assert "Classification Report :" in outp


class TestScheduler:
    def test_matches_torch_rlrop(self):
        torch = pytest.importorskip("torch")
        lin = torch.nn.Linear(2, 2)
        opt = torch.optim.Adam(lin.parameters(), lr=0.01)
        sch = torch.optim.lr_scheduler.ReduceLROnPlateau(opt, "min")
        ours = ReduceLROnPlateau(0.01)
        rng = np.random.default_rng(3)
        # plateau-heavy sequence to force several reductions
        vals = list(1.0 - 0.01 * np.arange(5)) + [0.95] * 30 + list(
            0.95 - 0.001 * rng.random(20)
        )
        for v in vals:
            sch.step(v)
            lr = ours.step(v)
            # f32-level agreement: our host class does its lr math in
            # f32 to stay BITWISE interchangeable with the on-device
            # plateau_step (the production path consumes lr in f32, so
            # sub-f32 agreement with torch's f64 reduction is moot)
            assert np.isclose(opt.param_groups[0]["lr"], lr, rtol=1e-6,
                              atol=0.0)

    def test_device_plateau_matches_host_class(self):
        """The jit-safe vectorized plateau (plateau_init/plateau_step —
        stepped INSIDE the multilane chunk programs) reproduces the
        host class lane-for-lane: lr sequence and internal counters,
        including reductions and cooldown re-arming."""
        import jax

        from factorized_tpu.utils.scheduler import (
            plateau_init,
            plateau_step,
        )

        rng = np.random.default_rng(0)
        K = 6
        lrs0 = rng.uniform(1e-4, 1e-2, K).astype(np.float32)
        hosts = [ReduceLROnPlateau(float(v), patience=2, cooldown=1)
                 for v in lrs0]
        sched = plateau_init(lrs0)
        step = jax.jit(lambda s, m: plateau_step(s, m, patience=2,
                                                 cooldown=1))
        # plateau-heavy tail forces several reductions per lane
        seq = np.concatenate([rng.uniform(0.5, 1.5, (25, K)),
                              np.full((15, K), 0.7)]).astype(np.float32)
        for m in seq:
            host_lrs = [h.step(float(v)) for h, v in zip(hosts, m)]
            sched = step(sched, m)
            np.testing.assert_allclose(np.asarray(sched["lr"]),
                                       np.asarray(host_lrs, np.float32),
                                       rtol=1e-6)
            assert [int(b) for b in np.asarray(sched["bad"])] == \
                   [h.num_bad_epochs for h in hosts]
            assert [int(c) for c in np.asarray(sched["cooldown"])] == \
                   [h.cooldown_counter for h in hosts]
        assert any(h.lr < float(v) for h, v in zip(hosts, lrs0)), \
            "sequence never triggered a reduction - test is vacuous"


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        import jax
        import jax.numpy as jnp
        from factorized_tpu.utils.checkpoint import (
            restore_checkpoint,
            save_checkpoint,
        )

        params = {"a": jnp.arange(6.0).reshape(2, 3), "b": {"c": jnp.ones(4)}}
        save_checkpoint(str(tmp_path / "ck"), params, step=7,
                        config={"x": 1})
        state, meta = restore_checkpoint(
            str(tmp_path / "ck"), target={"params": params}
        )
        assert meta["step"] == 7
        np.testing.assert_array_equal(np.asarray(state["params"]["a"]),
                                      np.arange(6.0).reshape(2, 3))
