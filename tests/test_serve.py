"""Serving path: checkpoint round-trip through the CLI, Predictor,
latency probe, and the HTTP endpoint."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from factorized_tpu.serve import Predictor, serve_http


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    """Train a tiny model via the CLI with --save-ckpt."""
    from factorized_tpu.cli import main

    out = tmp_path_factory.mktemp("runs")
    cfg = {
        "seqlength": 4, "h_dims": [8, 8, 8], "memsize": 8,
        "zy_size": 8, "zl_size": 8, "za_size": 8, "zv_size": 8,
        "fy_size": 8, "fl_size": 8, "fa_size": 8, "fv_size": 8,
        "att1_shape": 8, "att2_shape": 8, "gamma1_shape": 8,
        "gamma2_shape": 8, "out_shape": 8,
        "batchsize": 32, "num_epochs": 1,
    }
    cfg_path = out / "tiny.json"
    cfg_path.write_text(json.dumps(cfg))
    rc = main([
        "mosi", "--config", str(cfg_path), "--mode", "single",
        "--type", "mfm", "--out", str(out), "--save-ckpt",
    ])
    assert rc == 0
    return str(out / "ckpt_mosi_0")


class TestPredictor:
    def test_roundtrip_and_predict(self, trained_ckpt):
        p = Predictor.from_checkpoint(trained_ckpt)
        rng = np.random.default_rng(0)
        X = rng.normal(size=(10, p.cfg.seqlength, p.cfg.d_total))
        y = p.predict(X)
        assert y.shape == (10,)
        assert np.isfinite(y).all()

    def test_params_frozen_guard(self, trained_ckpt):
        """Weights are compiled into the forward as constants at
        construction; reassigning .params (e.g. a naive checkpoint
        hot-reload) must fail loudly instead of silently serving the
        original weights."""
        import jax

        p = Predictor.from_checkpoint(trained_ckpt)
        X = np.zeros((2, p.cfg.seqlength, p.cfg.d_total), np.float32)
        assert p.predict(X).shape == (2,)
        p.params = jax.tree.map(lambda a: a, p.params)  # new tree
        with pytest.raises(ValueError, match="frozen"):
            p.predict(X)

    def test_batch_padding_consistency(self, trained_ckpt):
        p = Predictor.from_checkpoint(trained_ckpt)
        p.batch_size = 8
        rng = np.random.default_rng(1)
        X = rng.normal(size=(19, p.cfg.seqlength, p.cfg.d_total)).astype(
            np.float32)
        y_batched = p.predict(X)
        p2 = Predictor.from_checkpoint(trained_ckpt)
        p2.batch_size = 64
        y_single = p2.predict(X)
        np.testing.assert_allclose(y_batched, y_single, rtol=1e-4,
                                   atol=1e-5)

    def test_export_roundtrip(self, trained_ckpt, tmp_path):
        """AOT artifact: export the jitted forward (weights embedded),
        reload WITHOUT the checkpoint, predictions match. The default
        artifact has a SYMBOLIC batch dimension — one artifact serves
        multiple batch sizes (each concrete shape compiles on first
        use) and autotune stays available."""
        from factorized_tpu.serve import ExportedPredictor

        p = Predictor.from_checkpoint(trained_ckpt)
        p.batch_size = 8
        rng = np.random.default_rng(2)
        X = rng.normal(size=(11, p.cfg.seqlength, p.cfg.d_total)).astype(
            np.float32)
        y_ref = p.predict(X)
        art = p.export(str(tmp_path / "artifact"))

        q = Predictor.from_exported(art)
        assert isinstance(q, ExportedPredictor)
        assert q.batch_size == 8
        assert q.cfg.seqlength == p.cfg.seqlength
        y = q.predict(X)
        np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-6)
        # ONE artifact, three serving batch shapes: 8 (pad to 16), 4
        # (pad to 12) and 32 (single padded batch) — same predictions
        for b in (4, 32):
            q.batch_size = b
            np.testing.assert_allclose(q.predict(X), y_ref, rtol=1e-5,
                                       atol=1e-6)
        # autotune works on symbolic-batch artifacts
        tuned = q.autotune(X, candidates=(4, 8), reps=1)
        assert set(tuned) == {4, 8}
        assert q.batch_size in tuned

    def test_export_fixed_shape_refuses_autotune(self, trained_ckpt,
                                                 tmp_path):
        """symbolic_batch=False pins the batch shape into the artifact
        (the pre-r5 behavior): serving still works at that shape,
        autotune refuses loudly."""
        p = Predictor.from_checkpoint(trained_ckpt)
        p.batch_size = 8
        art = p.export(str(tmp_path / "fixed"), symbolic_batch=False)
        q = Predictor.from_exported(art)
        X = np.zeros((5, q.cfg.seqlength, q.cfg.d_total), np.float32)
        assert q.predict(X).shape == (5,)
        with pytest.raises(NotImplementedError):
            q.autotune(X)

    def test_export_cli(self, trained_ckpt, tmp_path):
        from factorized_tpu.cli import main

        art = tmp_path / "art"
        rc = main(["serve", "--checkpoint", trained_ckpt,
                   "--export", str(art)])
        assert rc == 0
        assert (art / "exported.bin").exists()
        q = Predictor.from_exported(str(art))
        X = np.zeros((3, q.cfg.seqlength, q.cfg.d_total), np.float32)
        assert q.predict(X).shape == (3,)

    def test_autotune_picks_a_candidate(self, trained_ckpt):
        p = Predictor.from_checkpoint(trained_ckpt)
        rng = np.random.default_rng(2)
        X = rng.normal(size=(48, p.cfg.seqlength, p.cfg.d_total)).astype(
            np.float32)
        results = p.autotune(X, candidates=(8, 16, 64, 512), reps=2)
        # 512 > 2*48 is skipped once a smaller candidate was measured
        assert set(results) == {8, 16, 64}
        assert p.batch_size == max(results, key=results.get)
        assert all(v > 0 for v in results.values())
        # predictions unchanged by the tuned batch size
        y = p.predict(X)
        assert y.shape == (48,) and np.isfinite(y).all()

    def test_device_latency(self, trained_ckpt):
        p = Predictor.from_checkpoint(trained_ckpt)
        p.batch_size = 16
        rng = np.random.default_rng(3)
        X = rng.normal(size=(10, p.cfg.seqlength, p.cfg.d_total)).astype(
            np.float32)
        res = p.device_latency(X, iters=5)
        assert res["batch"] == 16 and res["iters"] == 5
        assert res["latency_s"] > 0 and res["throughput_per_s"] > 0

    def test_probe(self, trained_ckpt):
        p = Predictor.from_checkpoint(trained_ckpt)
        rng = np.random.default_rng(2)
        X = rng.normal(size=(16, p.cfg.seqlength, p.cfg.d_total))
        stats = p.probe(X, reps=3)
        assert stats["throughput_per_s"] > 0
        assert stats["median_s"] > 0

    def test_http_endpoint(self, trained_ckpt):
        p = Predictor.from_checkpoint(trained_ckpt)
        port = 18791
        th = threading.Thread(
            target=serve_http, args=(p, "127.0.0.1", port), daemon=True)
        th.start()
        import time

        rng = np.random.default_rng(3)
        x = rng.normal(size=(2, p.cfg.seqlength, p.cfg.d_total)).tolist()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict",
            data=json.dumps({"x": x}).encode(),
            headers={"Content-Type": "application/json"},
        )
        for attempt in range(20):
            try:
                with urllib.request.urlopen(req, timeout=5) as resp:
                    body = json.loads(resp.read())
                break
            except (ConnectionError, urllib.error.URLError):
                time.sleep(0.25)
        assert len(body["y"]) == 2
        assert all(np.isfinite(v) for v in body["y"])
        # health endpoint on the same server
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/health", timeout=5) as resp:
            health = json.loads(resp.read())
        assert health["status"] == "ok"
        assert health["model_type"] == "mfm"
        assert health["seqlength"] == p.cfg.seqlength
        # threaded server: concurrent clients all get answers
        results = [None] * 4

        def hit(i):
            with urllib.request.urlopen(req, timeout=10) as r:
                results[i] = json.loads(r.read())

        ths = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
        [t.start() for t in ths]
        [t.join() for t in ths]
        assert all(r is not None and len(r["y"]) == 2 for r in results)


class TestMfnPredictorServing:
    @pytest.mark.slow
    def test_mfn_baseline_checkpoint_serves(self, tmp_path):
        """The standalone MFN predictor (the reference's released
        mfn_mae.pt family) round-trips CLI --save-ckpt -> Predictor."""
        import json as _json

        from factorized_tpu.cli import main

        cfg = {
            "seqlength": 4, "h_dims": [8, 8, 8], "memsize": 8,
            "zy_size": 8, "zl_size": 8, "za_size": 8, "zv_size": 8,
            "fy_size": 8, "fl_size": 8, "fa_size": 8, "fv_size": 8,
            "att1_shape": 8, "att2_shape": 8, "gamma1_shape": 8,
            "gamma2_shape": 8, "out_shape": 8,
            "batchsize": 32, "num_epochs": 1,
        }
        cfg_path = tmp_path / "tiny.json"
        cfg_path.write_text(_json.dumps(cfg))
        rc = main(["predictor", "--kind", "mfn", "--config", str(cfg_path),
                   "--mode", "single", "--out", str(tmp_path / "runs"),
                   "--save-ckpt"])
        assert rc == 0
        p = Predictor.from_checkpoint(str(tmp_path / "runs" / "ckpt_mfn_0"))
        assert p._name == "mfn"
        rng = np.random.default_rng(0)
        y = p.predict(rng.normal(size=(5, p.cfg.seqlength, p.cfg.d_total)))
        assert y.shape == (5,) and np.isfinite(y).all()

    def test_save_ckpt_rejected_for_non_registry_kinds(self, tmp_path):
        from factorized_tpu.cli import main

        with pytest.raises(SystemExit, match="only supported for"):
            main(["predictor", "--kind", "eflstm", "--mode", "single",
                  "--epochs", "1", "--out", str(tmp_path / "runs"),
                  "--save-ckpt"])


class TestMicroBatcher:
    class _Stub:
        """Predictor stand-in: sum over (t, d); first call sleeps so
        concurrent submits pile up in the queue and must coalesce."""

        def __init__(self, first_call_sleep=0.0):
            from types import SimpleNamespace

            self.cfg = SimpleNamespace(seqlength=4, input_dims=[2, 1, 1])
            self.batch_size = 64
            self.calls = 0
            self._sleep = first_call_sleep

        def predict(self, X):
            import time

            self.calls += 1
            if self.calls == 1 and self._sleep:
                time.sleep(self._sleep)
            return np.asarray(X, np.float32).sum(axis=(1, 2))

    def test_concurrent_requests_coalesce_and_match(self):
        from factorized_tpu.serve import MicroBatcher

        stub = self._Stub(first_call_sleep=0.25)
        mb = MicroBatcher(stub, max_wait_ms=200.0)
        rng = np.random.default_rng(0)
        xs = [rng.normal(size=(int(rng.integers(1, 4)), 4, 4)).astype(
            np.float32) for _ in range(8)]
        results = [None] * 8

        def hit(i):
            results[i] = mb.submit(xs[i])

        ths = [threading.Thread(target=hit, args=(i,)) for i in range(8)]
        [t.start() for t in ths]
        [t.join(timeout=10) for t in ths]
        mb.close()
        for x, y in zip(xs, results):
            np.testing.assert_allclose(y, x.sum(axis=(1, 2)), rtol=1e-6)
        # the 8 requests ran in FEWER batched forwards (coalescing)
        assert mb.requests_served == 8
        assert mb.batches_run < 8
        assert stub.calls == mb.batches_run

    def test_bad_shape_fails_alone_without_poisoning(self):
        from factorized_tpu.serve import MicroBatcher

        stub = self._Stub()
        mb = MicroBatcher(stub, max_wait_ms=1.0)
        with pytest.raises(ValueError, match="expected input shape"):
            mb.submit(np.zeros((2, 3, 4), np.float32))  # wrong t
        # a good request right after still works
        x = np.ones((2, 4, 4), np.float32)
        np.testing.assert_allclose(mb.submit(x), x.sum(axis=(1, 2)))
        mb.close()

    def test_batch_cap_splits_oversized_waves(self):
        from factorized_tpu.serve import MicroBatcher

        stub = self._Stub()
        stub.batch_size = 4  # tiny cap
        mb = MicroBatcher(stub, max_wait_ms=1.0)
        x = np.ones((10, 4, 4), np.float32)  # single request > cap is OK
        y = mb.submit(x)
        assert y.shape == (10,)
        mb.close()


class TestResume:
    def test_resume_continues_training(self, tmp_path):
        """Save with opt_state, resume, and verify training continues
        from the recorded epoch (capability absent in the reference)."""
        import jax
        from factorized_tpu import trainers
        from factorized_tpu.config import MFMConfig
        from factorized_tpu.utils.checkpoint import save_checkpoint
        from factorized_tpu.utils.logging import RunLogger

        rng = np.random.default_rng(0)
        dims = (12, 4, 6)
        d = sum(dims)
        data = []
        for n in (48, 16, 24):
            X = rng.normal(size=(n, 6, d)).astype(np.float32)
            y = (X.mean((1, 2)) * 3).astype(np.float32)
            data.extend([X, y])
        cfg = MFMConfig(input_dims=list(dims), h_dims=[8, 8, 8], memsize=8,
                        zy_size=8, zl_size=8, za_size=8, zv_size=8,
                        fy_size=8, fl_size=8, fa_size=8, fv_size=8,
                        att1_shape=8, att2_shape=8, gamma1_shape=8,
                        gamma2_shape=8, out_shape=8, seqlength=6,
                        batchsize=16, num_epochs=2)
        quiet = RunLogger(echo=False)
        res1 = trainers.train_mfm(*data, cfg, logger=quiet)
        ck = str(tmp_path / "ck")
        save_checkpoint(ck, res1["params"], opt_state=res1["opt_state"],
                        step=2)
        res2 = trainers.train_mfm(*data, cfg.replace(num_epochs=4),
                                  logger=quiet, resume_from=ck)
        # resumed run does only the remaining 2 epochs
        assert len(res2["history"]) == 2
        assert np.isfinite(res2["metrics"]["mae"])
        assert res2["step"] == 4

    @pytest.mark.slow
    @pytest.mark.parametrize("name", ["missing", "zeros", "s2s", "bm",
                                      "acc", "multitrait"])
    def test_resume_all_trainers(self, tmp_path, name):
        """Every trainer resumes from a --save-ckpt checkpoint
        (VERDICT r1 item 7: resume used to exist only for
        train_mfm/train_beta_vae)."""
        from factorized_tpu import trainers
        from factorized_tpu.config import MFMConfig
        from factorized_tpu.utils.checkpoint import save_checkpoint
        from factorized_tpu.utils.logging import RunLogger

        rng = np.random.default_rng(0)
        dims = (12, 4, 6)
        d = sum(dims)
        data = []
        for n in (48, 16, 24):
            X = rng.normal(size=(n, 6, d)).astype(np.float32)
            if name == "acc":
                y = (X.mean((1, 2)) >= 0).astype(np.int64)
            elif name == "multitrait":
                y = np.stack([X.mean((1, 2)), X.std((1, 2))],
                             axis=1).astype(np.float32)
            else:
                y = (X.mean((1, 2)) * 3).astype(np.float32)
            data.extend([X, y])
        cfg = MFMConfig(input_dims=list(dims), h_dims=[8, 8, 8], memsize=8,
                        zy_size=8, zl_size=8, za_size=8, zv_size=8,
                        fy_size=8, fl_size=8, fa_size=8, fv_size=8,
                        att1_shape=8, att2_shape=8, gamma1_shape=8,
                        gamma2_shape=8, out_shape=8, seqlength=6,
                        batchsize=16, num_epochs=2)
        if name == "missing":
            cfg = cfg.replace(missing=1)
        fn = {
            "missing": trainers.train_mfm_missing,
            "zeros": trainers.train_mfm_test_zeros,
            "s2s": trainers.train_seq2seq,
            "bm": trainers.train_basic_missing,
            "acc": trainers.train_mfm_acc,
            "multitrait": trainers.train_mfm_multitrait,
        }[name]
        quiet = RunLogger(echo=False)
        res1 = fn(*data, cfg, logger=quiet)
        assert res1["step"] == 2 and "opt_state" in res1
        ck = str(tmp_path / "ck")
        save_checkpoint(ck, res1["params"], opt_state=res1["opt_state"],
                        step=res1["step"])
        res2 = fn(*data, cfg.replace(num_epochs=4), logger=quiet,
                  resume_from=ck)
        # resumed run does only the remaining 2 epochs
        assert len(res2["history"]) == 2
        assert res2["step"] == 4

    def test_resume_train_predictor(self, tmp_path):
        """The discriminative-baseline trainer resumes too."""
        from factorized_tpu import trainers
        from factorized_tpu.config import MFMConfig
        from factorized_tpu.utils.checkpoint import save_checkpoint
        from factorized_tpu.utils.logging import RunLogger

        rng = np.random.default_rng(0)
        dims = (12, 4, 6)
        d = sum(dims)
        data = []
        for n in (48, 16, 24):
            X = rng.normal(size=(n, 6, d)).astype(np.float32)
            y = (X.mean((1, 2)) * 3).astype(np.float32)
            data.extend([X, y])
        cfg = MFMConfig(input_dims=list(dims), h_dims=[8, 8, 8], memsize=8,
                        zy_size=8, zl_size=8, za_size=8, zv_size=8,
                        fy_size=8, fl_size=8, fa_size=8, fv_size=8,
                        att1_shape=8, att2_shape=8, gamma1_shape=8,
                        gamma2_shape=8, out_shape=8, seqlength=6,
                        batchsize=16, num_epochs=2)
        quiet = RunLogger(echo=False)
        res1 = trainers.train_predictor(*data, "eflstm", cfg, h=8,
                                        logger=quiet)
        assert res1["step"] == 2
        ck = str(tmp_path / "ck")
        save_checkpoint(ck, res1["params"], opt_state=res1["opt_state"],
                        step=res1["step"])
        res2 = trainers.train_predictor(*data, "eflstm",
                                        cfg.replace(num_epochs=4), h=8,
                                        logger=quiet, resume_from=ck)
        assert len(res2["history"]) == 2 and res2["step"] == 4

    @pytest.mark.slow
    def test_ckpt_every_autosnapshot_roundtrip(self, tmp_path):
        """--ckpt-every writes a crash-resume checkpoint mid-run that
        --resume can continue from with absolute step numbering."""
        import json as _json

        from factorized_tpu.cli import main
        from factorized_tpu.utils.checkpoint import restore_checkpoint

        cfg = {
            "seqlength": 4, "h_dims": [8, 8, 8], "memsize": 8,
            "zy_size": 8, "zl_size": 8, "za_size": 8, "zv_size": 8,
            "fy_size": 8, "fl_size": 8, "fa_size": 8, "fv_size": 8,
            "att1_shape": 8, "att2_shape": 8, "gamma1_shape": 8,
            "gamma2_shape": 8, "out_shape": 8,
            "batchsize": 32, "num_epochs": 3,
        }
        cfg_path = tmp_path / "tiny.json"
        cfg_path.write_text(_json.dumps(cfg))
        out = tmp_path / "runs"
        rc = main(["mosi", "--config", str(cfg_path), "--mode", "single",
                   "--type", "mfm", "--out", str(out), "--ckpt-every", "2"])
        assert rc == 0
        ck = out / "ckpt_auto_mosi_0"
        assert ck.is_dir()
        with open(ck / "meta.json") as f:
            meta = _json.load(f)
        # 3 epochs, every=2 -> last auto-save at absolute step 2
        assert meta["step"] == 2
        assert meta["has_opt_state"] is True
        assert "_resume_lr" in meta["config"]
        # the auto-checkpoint resumes: 2 of 5 epochs done -> 3 remain
        rc = main(["mosi", "--config", str(cfg_path), "--mode", "single",
                   "--type", "mfm", "--out", str(out), "--epochs", "5",
                   "--resume", str(ck), "--ckpt-every", "2"])
        assert rc == 0
        with open(ck / "meta.json") as f:
            meta2 = _json.load(f)
        # resumed run saved at absolute epochs 4 (2+2) -> step 4
        assert meta2["step"] == 4

    @pytest.mark.slow
    def test_cli_resume_multiseed_missing_ckpt_fails_loudly(self, tmp_path):
        """--resume with --seeds > 1 is SUPPORTED since round 3
        (tests/test_multiseed_resume.py proves resumed == uninterrupted);
        pointing it at a nonexistent checkpoint still fails loudly
        rather than silently starting fresh."""
        from factorized_tpu.cli import main

        with pytest.raises((FileNotFoundError, OSError)):
            main(["mosi", "--mode", "single", "--seeds", "2",
                  "--resume", str(tmp_path / "nope"),
                  "--epochs", "1", "--out", str(tmp_path / "runs")])

    @pytest.mark.slow
    def test_resume_beta_vae_stages(self, tmp_path):
        """Two-stage resume: a checkpoint with total-epoch step lands in
        the right stage with the right number of epochs left."""
        from factorized_tpu import trainers
        from factorized_tpu.config import MFMConfig
        from factorized_tpu.utils.checkpoint import save_checkpoint
        from factorized_tpu.utils.logging import RunLogger

        rng = np.random.default_rng(0)
        dims = (12, 4, 6)
        d = sum(dims)
        data = []
        for n in (48, 16, 24):
            X = rng.normal(size=(n, 6, d)).astype(np.float32)
            y = (X.mean((1, 2)) * 3).astype(np.float32)
            data.extend([X, y])
        cfg = MFMConfig(input_dims=list(dims), h_dims=[8, 8, 8], memsize=8,
                        zy_size=8, zl_size=8, za_size=8, zv_size=8,
                        fy_size=8, fl_size=8, fa_size=8, fv_size=8,
                        att1_shape=8, att2_shape=8, gamma1_shape=8,
                        gamma2_shape=8, out_shape=8, seqlength=6,
                        batchsize=16, num_epochs=2)
        quiet = RunLogger(echo=False)
        res1 = trainers.train_beta_vae(*data, cfg, logger=quiet)
        # full run: 2 stages x 2 epochs
        assert res1["step"] == 4 and len(res1["history"]) == 4

        # resume mid-stage-1 (1 of 4 total epochs done): 1 epoch of
        # stage 1 then 2 of stage 2 remain
        ck = str(tmp_path / "ck1")
        save_checkpoint(ck, res1["params"], opt_state=res1["opt_state"],
                        step=1)
        res2 = trainers.train_beta_vae(*data, cfg, logger=quiet,
                                       resume_from=ck)
        assert [h["stage"] for h in res2["history"]] == [1, 2, 2]
        assert res2["step"] == 4

        # resume into stage 2 (3 of 4 done): exactly 1 stage-2 epoch
        ck2 = str(tmp_path / "ck2")
        save_checkpoint(ck2, res1["params"], opt_state=res1["opt_state"],
                        step=3)
        res3 = trainers.train_beta_vae(*data, cfg, logger=quiet,
                                       resume_from=ck2)
        assert [h["stage"] for h in res3["history"]] == [2]
        assert res3["step"] == 4


class TestMultitraitPredictor:
    """Multitrait regression checkpoints (output_dim > 1, e.g. the
    mosei_sdk 7-trait surface) must serve with per-trait columns — the
    scalar-regression squeeze used to crash on them."""

    @pytest.fixture(scope="class")
    def predictor(self):
        import jax

        from factorized_tpu.config import MFMConfig
        from factorized_tpu.models import get_model

        cfg = MFMConfig(
            seqlength=5, input_dims=[6, 4, 3], h_dims=[6, 5, 4],
            memsize=6, zy_size=5, zl_size=6, za_size=4, zv_size=5,
            fy_size=4, fl_size=5, fa_size=4, fv_size=3,
        ).replace(task="regression", output_dim=7)
        init, _ = get_model("mfm")
        params = init(jax.random.PRNGKey(0), cfg)
        return Predictor(cfg, params, batch_size=8)

    def test_predict_keeps_trait_columns(self, predictor):
        X = np.random.default_rng(0).normal(
            size=(11, 5, 13)).astype(np.float32)
        y = predictor.predict(X)
        assert y.shape == (11, 7)
        assert np.isfinite(y).all()

    def test_empty_input_shape(self, predictor):
        y = predictor.predict(np.zeros((0, 5, 13), np.float32))
        assert y.shape == (0, 7)
