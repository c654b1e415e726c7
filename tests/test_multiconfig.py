"""Shape-bucketed config-vmapped search (parallel/multiconfig.py).

Correctness backbone: the traced-hyperparameter loss path must equal
the static-config loss path exactly (same keys -> same dropout masks ->
same loss and grads), so training K different configs in one vmapped
program is the same math as K separate programs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from factorized_tpu.config import MFMConfig
from factorized_tpu.models import get_model
from factorized_tpu.parallel.multiconfig import (
    HP_FIELDS,
    bucket_configs,
    hp_matrix,
    lane_cfg,
    shape_signature,
    train_config_bucket,
)
from factorized_tpu.train import make_loss_fn
from factorized_tpu.utils.logging import RunLogger

CFG = MFMConfig(
    input_dims=[12, 4, 6], h_dims=[6, 5, 4], memsize=6,
    zy_size=5, zl_size=6, za_size=4, zv_size=5,
    fy_size=4, fl_size=5, fa_size=4, fv_size=3,
    att1_shape=8, att2_shape=8, gamma1_shape=8, gamma2_shape=8,
    seqlength=5, batchsize=16, num_epochs=2,
    # binary-exact dropout rates: keep = 1 - rate is a power of two, so
    # the traced-rate path draws bit-identical bernoulli masks
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


class TestSignatureAndBucketing:
    def test_value_fields_do_not_split_buckets(self):
        a = CFG
        b = CFG.replace(zy_to_fy_dropout=0.0, lda_mmd=50.0, lr=0.02,
                        att1_drop=0.25)
        assert shape_signature(a) == shape_signature(b)
        assert bucket_configs([a, b]) == [[0, 1]]

    def test_shape_fields_split_buckets(self):
        a = CFG
        b = CFG.replace(memsize=8)
        c = CFG.replace(zy_to_fy_dropout=0.0)  # value change only
        assert shape_signature(a) != shape_signature(b)
        assert bucket_configs([a, b, c]) == [[0, 2], [1]]

    def test_hp_matrix_layout(self):
        b = CFG.replace(lda_mmd=9.0)
        m = hp_matrix([CFG, b], seeds_per_config=2)
        assert m.shape == (4, len(HP_FIELDS))
        i = HP_FIELDS.index("lda_mmd")
        np.testing.assert_allclose(m[:, i], [2.0, 2.0, 9.0, 9.0])


class TestTracedHpEqualsStatic:
    @pytest.mark.parametrize("model", ["mfm", "kl", "m_b"])
    def test_loss_and_grads_match(self, model):
        """make_loss_fn with the config's literal floats == the same
        loss rebuilt from a traced hp vector, to the bit (binary-exact
        rates -> identical dropout masks)."""
        init, apply_fn = get_model(model)
        params = init(jax.random.PRNGKey(0), CFG)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(
            size=(CFG.seqlength, 8, CFG.d_total)).astype(np.float32))
        y = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
        key = jax.random.PRNGKey(7)

        static_fn = jax.jit(jax.value_and_grad(
            make_loss_fn(apply_fn, CFG, "joint"), has_aux=True))

        def traced(params, x, y, key, hp):
            return make_loss_fn(apply_fn, lane_cfg(CFG, hp), "joint")(
                params, x, y, key)

        traced_fn = jax.jit(jax.value_and_grad(traced, has_aux=True))
        hp = jnp.asarray([float(getattr(CFG, f)) for f in HP_FIELDS])

        (l_s, _), g_s = static_fn(params, x, y, key)
        (l_t, _), g_t = traced_fn(params, x, y, key, hp)
        np.testing.assert_allclose(float(l_s), float(l_t), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(g_s), jax.tree.leaves(g_t)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)

    def test_traced_zero_rate_is_exact_identity(self):
        """A traced rate of 0 must not perturb activations at all."""
        from factorized_tpu.ops.core import dropout

        x = jnp.asarray(np.random.default_rng(2).normal(
            size=(16, 8)).astype(np.float32))
        out = dropout(jax.random.PRNGKey(0), x, jnp.float32(0.0), True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))

    @pytest.mark.slow
    def test_pallas_path_accepts_traced_rates(self):
        """The Pallas mega-kernel's precomputed masks work with traced
        rates (interpret mode on CPU)."""
        from factorized_tpu.ops import fused

        init, apply_fn = get_model("mfm")
        params = init(jax.random.PRNGKey(0), CFG)
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(
            size=(CFG.seqlength, 8, CFG.d_total)).astype(np.float32))
        y = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
        hp = jnp.asarray([float(getattr(CFG, f)) for f in HP_FIELDS])

        def traced(params, x, y, key, hp):
            return make_loss_fn(apply_fn, lane_cfg(CFG, hp), "joint")(
                params, x, y, key)

        old = fused.USE_PALLAS
        fused.USE_PALLAS = True
        try:
            (loss, _), grads = jax.value_and_grad(traced, has_aux=True)(
                params, x, y, jax.random.PRNGKey(5), hp)
        finally:
            fused.USE_PALLAS = old
        assert np.isfinite(float(loss))
        assert all(np.isfinite(np.asarray(g)).all()
                   for g in jax.tree.leaves(grads))


class TestTrainConfigBucket:
    @pytest.mark.slow
    def test_identical_configs_match_multiseed(self):
        """A bucket of identical configs reproduces train_mfm_multiseed
        (same key derivation, binary-exact rates -> same masks)."""
        from factorized_tpu.parallel.multiseed import train_mfm_multiseed

        data = _data()
        quiet = RunLogger(echo=False)
        ms = train_mfm_multiseed(*data, CFG, n_seeds=4, seed=9,
                                 logger=quiet)
        cb = train_config_bucket(*data, [CFG, CFG], seeds_per_config=2,
                                 seed=9, logger=quiet)
        for a, b in zip(ms["results"], cb["results"]):
            assert a["best_valid"] == pytest.approx(b["best_valid"],
                                                    rel=1e-5)
            assert a["metrics"]["mae"] == pytest.approx(
                b["metrics"]["mae"], rel=1e-4)

    @pytest.mark.slow
    def test_mixed_configs_train_distinctly(self):
        """Lanes with different hyperparameters produce different
        models; each lane's result is finite and attributable."""
        data = _data()
        cfgs = [CFG,
                CFG.replace(zy_to_fy_dropout=0.0, lda_mmd=50.0,
                            zl_to_fl_dropout=0.0),
                CFG.replace(lda_xl=10.0, att1_drop=0.0)]
        res = train_config_bucket(*data, cfgs, seeds_per_config=1,
                                  seed=3, logger=RunLogger(echo=False))
        assert [r["config_index"] for r in res["results"]] == [0, 1, 2]
        maes = [r["metrics"]["mae"] for r in res["results"]]
        assert all(np.isfinite(m) for m in maes)
        assert len({round(m, 6) for m in maes}) == 3
        assert res["best_lane"] == int(np.argmin(maes))

    @pytest.mark.slow
    def test_config_lr_per_lane(self):
        data = _data()
        cfgs = [CFG.replace(lr=0.001), CFG.replace(lr=0.05)]
        res = train_config_bucket(*data, cfgs, seeds_per_config=1,
                                  seed=3, use_config_lr=True,
                                  logger=RunLogger(echo=False))
        maes = [r["metrics"]["mae"] for r in res["results"]]
        assert len({round(m, 6) for m in maes}) == 2

    def test_mixed_shapes_rejected(self):
        data = _data()
        with pytest.raises(ValueError, match="shape"):
            train_config_bucket(*data, [CFG, CFG.replace(memsize=8)],
                                logger=RunLogger(echo=False))

    def test_cli_bucket_search_plumbing(self, monkeypatch, tmp_path):
        """--mode search --bucket samples --trials configs, buckets by
        shape signature, and calls train_config_bucket once per bucket
        with --seeds lanes per config."""
        import factorized_tpu.parallel.multiconfig as mc
        from factorized_tpu.cli import main

        calls = []

        def fake_bucket(*data, **kw):
            # (X_train, y_train, ..., cfgs) — cfgs is the last positional
            calls.append((data[-1], kw))
            return {"results": [], "best_lane": 0, "best_params": None,
                    "params": None, "history": []}

        monkeypatch.setattr(mc, "train_config_bucket", fake_bucket)
        rc = main(["mosi", "--mode", "search", "--bucket",
                   "--trials", "6", "--seeds", "2", "--epochs", "1",
                   "--out", str(tmp_path)])
        assert rc == 0
        assert calls, "train_config_bucket was never invoked"
        total = sum(len(cfgs) for cfgs, _ in calls)
        assert total == 6
        for cfgs, kw in calls:
            assert len({shape_signature(c) for c in cfgs}) == 1
            assert kw["seeds_per_config"] == 2

    @pytest.mark.slow
    def test_lane_sharded_mesh(self):
        """Lane axis sharded over the virtual mesh — the multi-chip
        search scaling story for mixed configs."""
        from factorized_tpu.parallel import make_mesh

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        data = _data()
        cfgs = [CFG, CFG.replace(lda_mmd=50.0)]
        quiet = RunLogger(echo=False)
        ref = train_config_bucket(*data, cfgs, seeds_per_config=4,
                                  seed=5, logger=quiet)
        shd = train_config_bucket(*data, cfgs, seeds_per_config=4,
                                  seed=5, logger=quiet, mesh=make_mesh(8))
        for a, b in zip(ref["results"], shd["results"]):
            assert abs(a["metrics"]["mae"] - b["metrics"]["mae"]) < 5e-3


class TestMultitraitBucket:
    """Vector-output (multi-trait) lanes: per-trait scoring + mean-MAE
    ranking (reference surface: mfm_mmmo.py's POM family, whose search
    space the multitrait --evolve CLI samples)."""

    def _mt_data(self, n_traits=3):
        rng = np.random.default_rng(3)
        d = CFG.d_total
        data = []
        for n in (48, 16, 24):
            X = rng.normal(size=(n, CFG.seqlength, d)).astype(np.float32)
            y = np.stack([(X.mean((1, 2)) * (t + 1)).astype(np.float32)
                          for t in range(n_traits)], axis=1)
            data.extend([X, y])
        return data

    def test_bucket_scores_per_trait(self):
        cfg = CFG.replace(output_dim=3)
        data = self._mt_data()
        res = train_config_bucket(
            *data, [cfg, cfg.replace(lda_mmd=0.5)],
            logger=RunLogger(echo=False), seed=0)
        for r in res["results"]:
            m = r["metrics"]
            assert len(m["mae"]) == 3 and len(m["corr"]) == 3
            assert m["mae_mean"] == pytest.approx(np.mean(m["mae"]))
        # ranking used the scalar mean
        pick = res["best_lane"]
        assert all(res["results"][pick]["metrics"]["mae_mean"]
                   <= r["metrics"]["mae_mean"] for r in res["results"])

    @pytest.mark.slow
    def test_evolve_multitrait(self):
        import random

        from factorized_tpu.parallel.multiconfig import (
            train_evolving_search,
        )

        cfg = CFG.replace(output_dim=3)
        data = self._mt_data()
        res = train_evolving_search(
            *data, cfg, "mmmo", n_configs=2, rungs=2, cull_frac=0.5,
            seeds_per_config=1, rng=random.Random(0), seed=0,
            logger=RunLogger(echo=False))
        assert res["explored_configs"] == 3
        assert len(res["best"]["metrics"]["mae"]) == 3
        assert np.isfinite(res["best"]["metrics"]["mae_mean"])

    def test_cli_multitrait_refuses_search_flags_off_search(self,
                                                            tmp_path):
        from factorized_tpu.cli import main

        with pytest.raises(SystemExit, match="--mode search"):
            main(["multitrait", "--mode", "single", "--bucket",
                  "--out", str(tmp_path)])
        with pytest.raises(SystemExit, match="--mode search"):
            main(["multitrait", "--mode", "single", "--evolve", "2",
                  "--out", str(tmp_path)])
        # --seeds is consumed only by --bucket/--evolve search; single/
        # best AND the plain search trial loop would silently train one
        # seed
        with pytest.raises(SystemExit, match="--seeds"):
            main(["multitrait", "--mode", "single", "--seeds", "4",
                  "--out", str(tmp_path)])
        with pytest.raises(SystemExit, match="--seeds"):
            main(["multitrait", "--mode", "search", "--seeds", "4",
                  "--out", str(tmp_path)])

    def test_cli_multitrait_bucket_plumbing(self, monkeypatch, tmp_path):
        """--bucket routes the multitrait surface through the shared
        shape-bucket search with vector-output mmmo-space draws (no
        real training: the bucket trainer is stubbed)."""
        import factorized_tpu.cli as cli
        import factorized_tpu.parallel.multiconfig as mc

        seen = {"buckets": []}

        def fake_bucket(*data, **kw):
            bucket = data[6]
            seen["buckets"].append(bucket)
            seen["kw"] = kw
            return {"results": [], "best_lane": 0, "best_params": None,
                    "params": None, "history": []}

        monkeypatch.setattr(mc, "train_config_bucket", fake_bucket)
        rc = cli.main(["multitrait", "--mode", "search", "--bucket",
                       "--trials", "3", "--epochs", "1",
                       "--out", str(tmp_path)])
        assert rc == 0
        cfgs = [c for b in seen["buckets"] for c in b]
        assert len(cfgs) == 3
        assert all(c.task == "regression" and c.output_dim > 1
                   for c in cfgs)
        # regression surface: lr rides --lr (default None -> 1e-3), not
        # the config draw
        assert "lr" in seen["kw"] and "use_config_lr" not in seen["kw"]

    def test_cli_multitrait_evolve_plumbing(self, monkeypatch, tmp_path):
        """--evolve routes to train_evolving_search with a vector-output
        mmmo-space template (no real training: the search is stubbed)."""
        import factorized_tpu.cli as cli

        seen = {}

        def fake_evolve(*data, **kw):
            seen["template"] = data[6]
            seen["dataset"] = data[7] if len(data) > 7 else kw.get("dataset")
            seen["kw"] = kw
            return {"explored_configs": 2, "best": {
                "metrics": {"mae_mean": 1.0, "mae": [1.0]}, "rung": 0,
                "best_valid": 1.0, "config": {}}, "rungs": [],
                "params": {}}

        import factorized_tpu.parallel.multiconfig as mc

        monkeypatch.setattr(mc, "train_evolving_search", fake_evolve)
        rc = cli.main(["multitrait", "--mode", "search", "--evolve", "2",
                       "--trials", "2", "--epochs", "1",
                       "--out", str(tmp_path)])
        assert rc == 0
        t = seen["template"]
        assert t.task == "regression" and t.output_dim > 1
        assert seen["kw"]["rungs"] == 2 and seen["kw"]["n_configs"] == 2


class TestSearchSpaceCoverage:
    """Drift guard: every field the per-dataset search spaces sample
    must be a SHAPE field (splits buckets), an HP field (traced
    per-lane), or lr — otherwise a bucketed/evolving search would
    silently train the template's value instead of the draw's."""

    def test_every_sampled_field_is_shape_hp_or_lr(self):
        import dataclasses
        import random as pyrandom

        from factorized_tpu.config import sample_search_config
        from factorized_tpu.parallel.multiconfig import SHAPE_FIELDS

        rng = pyrandom.Random(0)
        names = [f.name for f in dataclasses.fields(MFMConfig)]
        for ds in ("mosi", "moud", "you", "mmmo"):
            a = sample_search_config(ds, rng)
            for _ in range(50):
                b = sample_search_config(ds, rng)
                for f in names:
                    if getattr(a, f) != getattr(b, f):
                        assert (f in SHAPE_FIELDS or f in HP_FIELDS
                                or f == "lr"), (
                            f"{ds}: sampled field {f!r} is neither a "
                            "shape-signature field nor a traced HP "
                            "field — bucketed search would ignore it")

    def test_resample_preserves_signature_all_datasets(self):
        import random as pyrandom

        from factorized_tpu.config import sample_search_config
        from factorized_tpu.parallel.multiconfig import resample_values

        rng = pyrandom.Random(1)
        for ds in ("mosi", "moud", "you", "mmmo"):
            t = sample_search_config(ds, rng)
            for _ in range(20):
                assert (shape_signature(resample_values(t, ds, rng))
                        == shape_signature(t))


class TestNanLaneRanking:
    def test_diverged_lane_never_wins_the_pick(self):
        """A lane whose metrics are NaN (diverged) must lose to finite
        lanes: every x<nan comparison is False, so an unguarded
        min() would keep a NaN lane 0 forever."""
        cfgs = [CFG.replace(lr=1e6), CFG]  # lane 0 diverges
        res = train_config_bucket(*_data(), cfgs, use_config_lr=True,
                                  logger=RunLogger(echo=False), seed=0)
        m0 = res["results"][0]["metrics"]["mae"]
        assert not np.isfinite(m0) or m0 > 1e3  # lane 0 really diverged
        assert res["best_lane"] == 1
        assert np.isfinite(res["results"][1]["metrics"]["mae"])


class TestChunkedPredict:
    """program.predict chunks the segment axis above a threshold
    (whole-set K-lane forwards OOM at CMU-MOSEI scale); values must be
    identical to the unchunked program."""

    def test_chunked_matches_unchunked(self, monkeypatch):
        from factorized_tpu.parallel.multiconfig import ConfigBucketProgram
        from factorized_tpu.train import make_optimizer

        _, apply_fn = get_model("mfm")
        opt = make_optimizer("adam", None, CFG.momentum)
        prog = ConfigBucketProgram(apply_fn, CFG, opt)
        init, _ = get_model("mfm")
        K = 3
        params = jax.vmap(lambda k: init(k, CFG))(
            jax.random.split(jax.random.PRNGKey(0), K))
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(CFG.seqlength, 23, CFG.d_total)),
                        jnp.float32)
        full = np.asarray(prog.predict(params, x))
        monkeypatch.setenv("FACTORIZED_PREDICT_CHUNK", "7")
        # rebuild so the jit closure re-reads the env threshold
        prog2 = ConfigBucketProgram(apply_fn, CFG, opt)
        chunked = np.asarray(prog2.predict(params, x))
        assert chunked.shape == full.shape == (K, 23)
        np.testing.assert_allclose(chunked, full, atol=1e-6)
