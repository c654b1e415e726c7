"""Evolving (successive-halving with lane recycling) search
(parallel/multiconfig.py train_evolving_search).

Correctness backbone: vmapped lanes are arithmetically independent, so
(a) a rung chained through ``state_in`` continues each lane exactly,
and (b) recycling one lane (new values + fresh params) leaves every
surviving lane's trajectory bit-for-bit unchanged — culling is free.
"""

import numpy as np
import pytest

from factorized_tpu.config import MFMConfig
from factorized_tpu.models import get_model
from factorized_tpu.parallel.multiconfig import (
    ConfigBucketProgram,
    recycle_lanes,
    resample_values,
    shape_signature,
    train_config_bucket,
    train_evolving_search,
)
from factorized_tpu.train import make_optimizer
from factorized_tpu.utils.logging import RunLogger

CFG = MFMConfig(
    input_dims=[12, 4, 6], h_dims=[6, 5, 4], memsize=6,
    zy_size=5, zl_size=6, za_size=4, zv_size=5,
    fy_size=4, fl_size=5, fa_size=4, fv_size=3,
    att1_shape=8, att2_shape=8, gamma1_shape=8, gamma2_shape=8,
    seqlength=5, batchsize=16, num_epochs=2,
    zy_to_fy_dropout=0.5, zl_to_fl_dropout=0.25, za_to_fa_dropout=0.0,
    zv_to_fv_dropout=0.5, fy_to_y_dropout=0.25,
    att1_drop=0.5, att2_drop=0.0, gamma1_drop=0.25, gamma2_drop=0.5,
    lda_mmd=2.0, lda_xl=1.0, lda_xa=0.5, lda_xv=0.25,
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


@pytest.fixture(scope="module")
def program():
    """One compiled bucket program shared by every test in this file —
    exactly how train_evolving_search reuses it across rungs (XLA
    re-traces only when the lane count K changes)."""
    _, apply_fn = get_model("mfm")
    opt = make_optimizer("adam", None, CFG.momentum)
    return ConfigBucketProgram(apply_fn, CFG, opt)


class TestResampleValues:
    def test_preserves_shape_signature(self):
        import random

        rng = random.Random(0)
        for _ in range(10):
            c = resample_values(CFG, "mosi", rng)
            assert shape_signature(c) == shape_signature(CFG)

    def test_actually_changes_values(self):
        import random

        rng = random.Random(0)
        draws = [resample_values(CFG, "mosi", rng) for _ in range(10)]
        # across 10 draws at least the mmd weight and lr must vary
        assert len({c.lda_mmd for c in draws}) > 1
        assert len({c.lr for c in draws}) > 1


class TestStateChaining:
    @pytest.mark.slow
    def test_two_rungs_progress_and_resume_lane_state(self, program):
        """Rung 2 continues from rung 1's live state: the live params
        keep training (different from rung 1's) and the per-lane
        best-valid record carries over (never worse than rung 1)."""
        data = _data()
        quiet = RunLogger(echo=False)
        r1 = train_config_bucket(*data, [CFG, CFG], seeds_per_config=1,
                                 seed=7, logger=quiet, return_state=True,
                                 program=program)
        bv1 = [r["best_valid"] for r in r1["results"]]
        # snapshot BEFORE chaining: rung 2 donates the live state buffers
        p1 = np.asarray(jax_leaves(r1["state"]["params"])[0])
        r2 = train_config_bucket(*data, [CFG, CFG], seeds_per_config=1,
                                 seed=7, logger=quiet,
                                 state_in=r1["state"], return_state=True,
                                 key_salt=778, epoch_offset=CFG.num_epochs,
                                 program=program)
        bv2 = [r["best_valid"] for r in r2["results"]]
        assert all(b2 <= b1 + 1e-12 for b1, b2 in zip(bv1, bv2))
        p2 = np.asarray(jax_leaves(r2["state"]["params"])[0])
        assert not np.array_equal(p1, p2), "rung 2 did not train"

    @pytest.mark.slow
    def test_recycled_lane_does_not_perturb_survivors(self, program):
        """Recycle lane 1 between rungs; lane 0's continued trajectory
        must match an un-culled run exactly (lane independence)."""
        import random

        data = _data()
        quiet = RunLogger(echo=False)
        cfg_b = CFG.replace(lda_mmd=9.0, zy_to_fy_dropout=0.0)

        def rung1():
            return train_config_bucket(*data, [CFG, cfg_b],
                                       seeds_per_config=1, seed=11,
                                       logger=quiet, return_state=True,
                                 program=program)

        # run A: recycle config 1 with a fresh draw, then rung 2
        ra = rung1()
        new_cfg = resample_values(CFG, "mosi", random.Random(3))
        init, _ = get_model("mfm")
        opt = make_optimizer("adam", None, CFG.momentum)
        recycle_lanes(ra["state"], [1], cfg=CFG, init=init, opt=opt,
                      lrs_new=[1e-3], seed=99)
        r2a = train_config_bucket(*data, [CFG, new_cfg],
                                  seeds_per_config=1, seed=11,
                                  logger=quiet, state_in=ra["state"],
                                  return_state=True, key_salt=778,
                                  program=program)

        # run B: no culling, same rung 2
        rb = rung1()
        r2b = train_config_bucket(*data, [CFG, cfg_b],
                                  seeds_per_config=1, seed=11,
                                  logger=quiet, state_in=rb["state"],
                                  return_state=True, key_salt=778,
                                  program=program)

        for a, b in zip(jax_leaves(r2a["state"]["params"]),
                        jax_leaves(r2b["state"]["params"])):
            np.testing.assert_array_equal(np.asarray(a)[0],
                                          np.asarray(b)[0])
        assert r2a["results"][0]["best_valid"] == pytest.approx(
            r2b["results"][0]["best_valid"], abs=0)
        # and the recycled lane genuinely restarted: its params differ
        # from run B's continued lane 1
        leaves_a = [np.asarray(x)[1] for x in
                    jax_leaves(r2a["state"]["params"])]
        leaves_b = [np.asarray(x)[1] for x in
                    jax_leaves(r2b["state"]["params"])]
        assert any(not np.array_equal(a, b)
                   for a, b in zip(leaves_a, leaves_b))

    def test_recycle_resets_lane_records(self, program):
        data = _data()
        quiet = RunLogger(echo=False)
        r1 = train_config_bucket(*data, [CFG, CFG], seeds_per_config=1,
                                 seed=5, logger=quiet, return_state=True,
                                 program=program)
        st = r1["state"]
        init, _ = get_model("mfm")
        opt = make_optimizer("adam", None, CFG.momentum)
        recycle_lanes(st, [1], cfg=CFG, init=init, opt=opt,
                      lrs_new=[0.02], seed=1)
        assert float(st["sched"]["lr"][1]) == pytest.approx(0.02)
        assert float(st["best"][1]) == np.inf
        assert not bool(st["has_best"][1])
        assert float(st["sched"]["best"][1]) == np.inf
        assert int(st["sched"]["bad"][1]) == 0
        # survivor untouched
        assert np.isfinite(float(st["best"][0]))
        assert bool(st["has_best"][0])


class TestEvolvingSearch:
    @pytest.mark.slow
    def test_end_to_end_counts_and_best(self, program):
        data = _data()
        res = train_evolving_search(*data, CFG, "mosi", n_configs=4,
                                    rungs=3, cull_frac=0.5,
                                    seeds_per_config=1, seed=21,
                                    logger=RunLogger(echo=False),
                                    program=program)
        # 4 initial trials + 2 culled/recycled per rung boundary (x2)
        assert res["explored_configs"] == 8
        assert len(res["rungs"]) == 3
        assert res["rungs"][-1]["culled"] == []
        for r in res["rungs"][:-1]:
            assert len(r["culled"]) == 2
        assert np.isfinite(res["best"]["metrics"]["mae"])
        assert res["params"] is not None
        assert "lda_mmd" in res["best"]["config"]

    def test_no_cull_when_frac_zero(self, program):
        data = _data()
        res = train_evolving_search(*data, CFG, "mosi", n_configs=2,
                                    rungs=2, cull_frac=0.0,
                                    seeds_per_config=1, seed=2,
                                    logger=RunLogger(echo=False),
                                    program=program)
        assert res["explored_configs"] == 2
        assert all(r["culled"] == [] for r in res["rungs"])

    def test_cli_evolve_plumbing(self, monkeypatch, tmp_path):
        import factorized_tpu.parallel.multiconfig as mc
        from factorized_tpu.cli import main

        calls = []

        def fake(*data_and_template, **kw):
            calls.append((data_and_template, kw))
            return {"best": {"metrics": {"mae": 1.0}, "rung": 0,
                             "config": {}, "best_valid": 1.0,
                             "params": None},
                    "rungs": [], "explored_configs": kw["n_configs"],
                    "params": None}

        monkeypatch.setattr(mc, "train_evolving_search", fake)
        rc = main(["mosi", "--mode", "search", "--evolve", "3",
                   "--trials", "4", "--epochs", "1",
                   "--out", str(tmp_path)])
        assert rc == 0
        assert len(calls) == 1
        _, kw = calls[0]
        assert kw["rungs"] == 3
        assert kw["n_configs"] == 4
        assert kw["cull_frac"] == 0.5


class TestEvolveMesh:
    @pytest.mark.slow
    def test_evolve_on_lane_mesh_matches_unsharded(self, program):
        """Rung chaining + lane recycling under a lane-sharded mesh:
        same culls, same results as the unsharded run (the multi-chip
        evolving-search scaling story)."""
        import random

        import jax

        from factorized_tpu.parallel import make_mesh

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        data = _data()
        kw = dict(n_configs=4, rungs=2, cull_frac=0.5,
                  seeds_per_config=2, seed=13, program=program)
        ref = train_evolving_search(*data, CFG, "mosi",
                                    logger=RunLogger(echo=False),
                                    rng=random.Random(13), **kw)
        shd = train_evolving_search(*data, CFG, "mosi",
                                    logger=RunLogger(echo=False),
                                    rng=random.Random(13),
                                    mesh=make_mesh(8), **kw)
        assert shd["explored_configs"] == ref["explored_configs"]
        assert [r["culled"] for r in shd["rungs"]] == \
               [r["culled"] for r in ref["rungs"]]
        assert abs(shd["best"]["metrics"]["mae"]
                   - ref["best"]["metrics"]["mae"]) < 5e-3


class TestEvolveResume:
    @pytest.mark.slow
    def test_kill_at_rung_resume_reproduces(self, program, tmp_path,
                                            monkeypatch):
        """Crash during rung 2 of 3, resume from the rung-boundary
        snapshot: the resumed run must reproduce the uninterrupted run
        exactly (params bitwise, metrics, explored count, rng draws)."""
        import random

        import factorized_tpu.parallel.multiconfig as mc

        data = _data()
        kw = dict(n_configs=4, rungs=3, cull_frac=0.5,
                  seeds_per_config=1, seed=21, program=program)
        ra = train_evolving_search(*data, CFG, "mosi",
                                   logger=RunLogger(echo=False),
                                   rng=random.Random(21), **kw)

        ck = str(tmp_path / "ev_ck")
        orig = mc.train_config_bucket
        calls = {"n": 0}

        def dying(*a, **k):
            calls["n"] += 1
            if calls["n"] == 3:
                raise RuntimeError("simulated crash in rung 2")
            return orig(*a, **k)

        monkeypatch.setattr(mc, "train_config_bucket", dying)
        with pytest.raises(RuntimeError, match="simulated crash"):
            train_evolving_search(*data, CFG, "mosi",
                                  logger=RunLogger(echo=False),
                                  rng=random.Random(21), ckpt_dir=ck,
                                  **kw)
        monkeypatch.setattr(mc, "train_config_bucket", orig)

        # resume with a DIFFERENT rng seed: the checkpointed rng state
        # must win, so future value draws match the uninterrupted run
        rb = train_evolving_search(*data, CFG, "mosi",
                                   logger=RunLogger(echo=False),
                                   rng=random.Random(999),
                                   resume_from=ck, **kw)

        assert rb["explored_configs"] == ra["explored_configs"] == 8
        assert len(rb["rungs"]) == 3
        assert rb["rungs"][-1]["scores"] == ra["rungs"][-1]["scores"]
        assert rb["best"]["config"] == ra["best"]["config"]
        for m, v in ra["best"]["metrics"].items():
            assert rb["best"]["metrics"][m] == pytest.approx(v, abs=0)
        for a, b in zip(jax_leaves(ra["params"]),
                        jax_leaves(rb["params"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_resume_rejects_wrong_lane_count(self, program, tmp_path,
                                             monkeypatch):
        import random

        import factorized_tpu.parallel.multiconfig as mc

        data = _data()
        ck = str(tmp_path / "ev_ck2")
        orig = mc.train_config_bucket
        calls = {"n": 0}

        def dying(*a, **k):
            calls["n"] += 1
            if calls["n"] == 2:
                raise RuntimeError("crash")
            return orig(*a, **k)

        monkeypatch.setattr(mc, "train_config_bucket", dying)
        with pytest.raises(RuntimeError):
            train_evolving_search(*data, CFG, "mosi", n_configs=4,
                                  rungs=2, seeds_per_config=1, seed=3,
                                  logger=RunLogger(echo=False),
                                  rng=random.Random(3), ckpt_dir=ck,
                                  program=program)
        monkeypatch.setattr(mc, "train_config_bucket", orig)
        with pytest.raises(ValueError, match="lanes"):
            train_evolving_search(*data, CFG, "mosi", n_configs=2,
                                  rungs=2, seeds_per_config=1, seed=3,
                                  logger=RunLogger(echo=False),
                                  resume_from=ck)

    def test_cli_evolve_ckpt_resume_plumbing(self, monkeypatch, tmp_path):
        import factorized_tpu.parallel.multiconfig as mc
        from factorized_tpu.cli import main

        calls = []

        def fake(*data_and_template, **kw):
            calls.append(kw)
            return {"best": {"metrics": {"mae": 1.0}, "rung": 0,
                             "config": {}, "best_valid": 1.0,
                             "params": None},
                    "rungs": [], "explored_configs": kw["n_configs"],
                    "params": None}

        monkeypatch.setattr(mc, "train_evolving_search", fake)
        rc = main(["mosi", "--mode", "search", "--evolve", "2",
                   "--trials", "4", "--epochs", "1",
                   "--ckpt-every", "1", "--resume", "/tmp/some_ck",
                   "--out", str(tmp_path)])
        assert rc == 0
        kw = calls[0]
        assert kw["ckpt_dir"].startswith(str(tmp_path))
        assert "evolve0" in kw["ckpt_dir"]
        assert kw["resume_from"] == "/tmp/some_ck"


def jax_leaves(tree):
    import jax

    return jax.tree.leaves(tree)


class TestPrepValidation:
    """prep= reuse guards: a prep built from different tensors must be
    refused BEFORE training (the positional X/y args are otherwise
    silently ignored)."""

    def test_label_only_mismatch_refused(self, program):
        from factorized_tpu.parallel.multiseed import prepare_bucket_data

        data = _data()
        prep = prepare_bucket_data(*data, CFG, seed=7)
        bad = list(data)
        bad[1] = data[1] + 1.0  # same X, different train labels
        with pytest.raises(ValueError, match="different dataset"):
            train_config_bucket(*bad, [CFG, CFG], seeds_per_config=1,
                                seed=7, logger=RunLogger(echo=False),
                                prep=prep, program=program)

    def test_defer_scoring_validated_at_entry(self, program):
        """The argument-combination error must fire before any
        training runs (it used to raise only after the full loop)."""
        with pytest.raises(ValueError, match="defer_scoring"):
            train_config_bucket(*_data(), [CFG, CFG],
                                seeds_per_config=1, seed=7,
                                logger=RunLogger(echo=False),
                                defer_scoring=True, program=program)
