"""Multi-device data parallelism on the virtual 8-device CPU mesh
(SURVEY.md §4.5 — the TPU-idiomatic equivalent of fake-backend
distributed tests)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from factorized_tpu.config import MFMConfig
from factorized_tpu.models import get_model
from factorized_tpu.parallel import DataParallel, make_mesh
from factorized_tpu.train import TrainProgram, make_optimizer


pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

CFG = MFMConfig(
    input_dims=[8, 4, 5], h_dims=[6, 5, 4], memsize=6,
    zy_size=5, zl_size=6, za_size=4, zv_size=5,
    fy_size=4, fl_size=5, fa_size=4, fv_size=3,
    att1_shape=8, att2_shape=8, gamma1_shape=8, gamma2_shape=8,
    seqlength=5, batchsize=16,
)


def _setup():
    init, apply_fn = get_model("mfm")
    params = init(jax.random.PRNGKey(0), CFG)
    opt = make_optimizer("adam")
    opt_state = opt.init(params)
    program = TrainProgram(apply_fn, CFG, "joint", opt)
    rng = np.random.default_rng(0)
    Xb = rng.normal(size=(3, CFG.seqlength, CFG.batchsize,
                          CFG.d_total)).astype(np.float32)
    yb = rng.normal(size=(3, CFG.batchsize)).astype(np.float32)
    return program, params, opt_state, Xb, yb


class TestDataParallel:
    def test_sharded_epoch_runs_and_matches_single(self):
        program, params, opt_state, Xb, yb = _setup()
        lr = jnp.asarray(1e-3, jnp.float32)
        key = jax.random.PRNGKey(1)

        # single-device result
        p1, o1, acc1 = program.epoch(params, opt_state, jnp.asarray(Xb),
                                     jnp.asarray(yb), key, lr)
        acc1 = float(acc1)

        # 8-way DP result
        program2 = TrainProgram(get_model("mfm")[1], CFG, "joint",
                                make_optimizer("adam"))
        mesh = make_mesh(8)
        dp = DataParallel(mesh)
        init, _ = get_model("mfm")
        params2 = dp.params(init(jax.random.PRNGKey(0), CFG))
        opt_state2 = dp.params(make_optimizer("adam").init(params2))
        Xs, ys = dp.epoch_batches(Xb, yb)
        with mesh:
            p2, o2, acc2 = program2.epoch(params2, opt_state2, Xs, ys,
                                          key, lr)
        acc2 = float(acc2)
        # identical math modulo reduction order (MMD resampling uses the
        # same key stream — shapes identical)
        assert abs(acc1 - acc2) / max(abs(acc1), 1e-6) < 5e-3
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=1e-5)

    def test_full_set_eval_sharded_with_padding(self):
        program, params, opt_state, _, _ = _setup()
        mesh = make_mesh(8)
        dp = DataParallel(mesh)
        rng = np.random.default_rng(1)
        # 19 is not divisible by 8 — exercises the pad path
        Xv = rng.normal(size=(CFG.seqlength, 19, CFG.d_total)).astype(
            np.float32)
        yv = rng.normal(size=(19,)).astype(np.float32)
        Xs, ys, n = dp.full_set(Xv, yv)
        assert n == 19
        params_r = dp.params(params)
        with mesh:
            loss = program.evaluate(params_r, Xs, ys,
                                    jax.random.PRNGKey(0))
        assert np.isfinite(float(loss))

    def test_mesh_shapes(self):
        mesh = make_mesh(8)
        assert mesh.shape["data"] == 8
        mesh2 = make_mesh(8, axes=("data", "model"), shape=(4, 2))
        assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2

    def test_mesh_oversubscription_raises_clear_error(self):
        with pytest.raises(ValueError, match="need 16 devices, have 8"):
            make_mesh(16)
        with pytest.raises(ValueError, match="xla_force_host_platform"):
            make_mesh(999)

    def test_mesh_default_2d_shapes(self):
        """Default 2-axis split: even n -> (n//2, 2); odd composite n
        factors; prime n refuses loudly (not a raw numpy reshape
        error)."""
        from factorized_tpu.parallel.sharding import _default_2d_shape

        mesh = make_mesh(8, axes=("seed", "data"))
        assert mesh.shape["seed"] == 4 and mesh.shape["data"] == 2
        # n=1 is a valid degenerate 2-axis mesh, not a "prime" refusal
        mesh1 = make_mesh(1, axes=("data", "model"))
        assert mesh1.shape["data"] == 1 and mesh1.shape["model"] == 1
        assert _default_2d_shape(6, ("a", "b")) == (3, 2)
        assert _default_2d_shape(9, ("a", "b")) == (3, 3)
        assert _default_2d_shape(15, ("a", "b")) == (5, 3)
        for n in (3, 5, 7):
            with pytest.raises(ValueError, match="prime"):
                make_mesh(n, axes=("seed", "data"))


class TestTensorParallel:
    """The 2-D ('data','model') TP path: assert the listed decoder
    weights are ACTUALLY sharded over 'model', and that a TP epoch
    matches the replicated-DP epoch numerically (GSPMD inserts the
    gathers; math identical up to reduction order)."""

    def _mesh2d(self):
        return make_mesh(8, axes=("data", "model"), shape=(4, 2))

    def test_tp_shards_listed_decoder_weights(self):
        from jax.sharding import PartitionSpec as P

        from factorized_tpu.parallel.sharding import tp_param_shardings

        mesh = self._mesh2d()
        init, _ = get_model("mfm")
        params = init(jax.random.PRNGKey(0), CFG)
        tp = tp_param_shardings(mesh, params)
        dec_l = tp["dec"]["decoder_l"]
        # the rule list: decoder_l/fc1/w, decoder_l/lstm/wx, .../wh
        assert dec_l["fc1"]["w"].sharding.spec == P(None, "model")
        assert dec_l["lstm"]["wx"].sharding.spec == P(None, "model")
        assert dec_l["lstm"]["wh"].sharding.spec == P(None, "model")
        # non-listed weights stay replicated
        assert tp["dec"]["decoder_a"]["fc1"]["w"].sharding.spec == P()
        assert tp["fy_to_y"]["fc1"]["w"].sharding.spec == P()
        # values unchanged by placement
        np.testing.assert_array_equal(
            np.asarray(dec_l["fc1"]["w"]),
            np.asarray(params["dec"]["decoder_l"]["fc1"]["w"]))

    @pytest.mark.slow
    def test_tp_epoch_matches_replicated_dp(self):
        from factorized_tpu.parallel.sharding import tp_param_shardings

        program, params, opt_state, Xb, yb = _setup()
        lr = jnp.asarray(1e-3, jnp.float32)
        key = jax.random.PRNGKey(1)

        # replicated single-device baseline
        p1, _, acc1 = program.epoch(params, opt_state, jnp.asarray(Xb),
                                    jnp.asarray(yb), key, lr)
        acc1 = float(acc1)

        # DP(4) x TP(2) over the 2-D mesh
        mesh = self._mesh2d()
        dp = DataParallel(mesh)
        init, _ = get_model("mfm")
        program2 = TrainProgram(get_model("mfm")[1], CFG, "joint",
                                make_optimizer("adam"))
        params2 = tp_param_shardings(mesh, init(jax.random.PRNGKey(0), CFG))
        opt_state2 = dp.params(make_optimizer("adam").init(params2))
        Xs, ys = dp.epoch_batches(Xb, yb)
        with mesh:
            p2, _, acc2 = program2.epoch(params2, opt_state2, Xs, ys,
                                         key, lr)
        acc2 = float(acc2)
        assert abs(acc1 - acc2) / max(abs(acc1), 1e-6) < 5e-3
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=1e-5)

    def test_tp_full_set_eval(self):
        from factorized_tpu.parallel.sharding import tp_param_shardings

        program, params, _, _, _ = _setup()
        mesh = self._mesh2d()
        dp = DataParallel(mesh)
        rng = np.random.default_rng(2)
        Xv = rng.normal(size=(CFG.seqlength, 13, CFG.d_total)).astype(
            np.float32)
        yv = rng.normal(size=(13,)).astype(np.float32)
        Xs, ys, n = dp.full_set(Xv, yv)
        assert n == 13
        params_tp = tp_param_shardings(mesh, params)
        with mesh:
            loss = program.evaluate(params_tp, Xs, ys, jax.random.PRNGKey(0))
        assert np.isfinite(float(loss))


class TestMultiSeed:
    def test_multiseed_matches_single_seed_count(self):
        from factorized_tpu.parallel.multiseed import train_mfm_multiseed
        from factorized_tpu.utils.logging import RunLogger

        rng = np.random.default_rng(0)
        dims = (12, 4, 6)
        d = sum(dims)
        data = []
        for n in (48, 16, 24):
            X = rng.normal(size=(n, 5, d)).astype(np.float32)
            y = (X.mean((1, 2)) * 3).astype(np.float32)
            data.extend([X, y])
        cfg = CFG.replace(input_dims=list(dims), num_epochs=2, batchsize=16)
        res = train_mfm_multiseed(*data, cfg, n_seeds=3,
                                  logger=RunLogger(echo=False))
        assert len(res["results"]) == 3
        maes = [r["metrics"]["mae"] for r in res["results"]]
        assert all(np.isfinite(m) for m in maes)
        # different seeds -> different models
        assert len({round(m, 6) for m in maes}) > 1
        assert res["best_seed"] == int(np.argmin(maes))


class TestSeedParallel:
    """Seed-parallel multiseed: the seed axis sharded over the mesh —
    the production search workload's multi-chip scaling story (zero
    collectives; each device trains its own seed slice)."""

    def _data(self):
        rng = np.random.default_rng(0)
        dims = (12, 4, 6)
        d = sum(dims)
        data = []
        for n in (48, 16, 24):
            X = rng.normal(size=(n, 5, d)).astype(np.float32)
            y = (X.mean((1, 2)) * 3).astype(np.float32)
            data.extend([X, y])
        return data, dims

    @pytest.mark.slow
    def test_seed_sharded_matches_unsharded(self):
        from factorized_tpu.parallel.multiseed import train_mfm_multiseed
        from factorized_tpu.utils.logging import RunLogger

        data, dims = self._data()
        cfg = CFG.replace(input_dims=list(dims), num_epochs=2, batchsize=16)
        quiet = RunLogger(echo=False)
        ref = train_mfm_multiseed(*data, cfg, n_seeds=8, logger=quiet)
        mesh = make_mesh(8)
        shd = train_mfm_multiseed(*data, cfg, n_seeds=8, logger=quiet,
                                  mesh=mesh)
        assert shd["best_seed"] == ref["best_seed"]
        for a, b in zip(ref["results"], shd["results"]):
            assert abs(a["metrics"]["mae"] - b["metrics"]["mae"]) < 5e-3
            assert abs(a["best_valid"] - b["best_valid"]) < 5e-3

    @pytest.mark.slow
    def test_seed_count_must_divide_mesh(self):
        from factorized_tpu.parallel.multiseed import train_mfm_multiseed
        from factorized_tpu.utils.logging import RunLogger

        data, dims = self._data()
        cfg = CFG.replace(input_dims=list(dims), num_epochs=1, batchsize=16)
        with pytest.raises(ValueError, match="must divide"):
            train_mfm_multiseed(*data, cfg, n_seeds=6,
                                logger=RunLogger(echo=False),
                                mesh=make_mesh(8))

    @pytest.mark.slow
    def test_seed_by_batch_2d_mesh_matches_unsharded(self):
        """('seed', 'batch') mesh: each seed trains data-parallel over
        the spare devices (XLA inserts the per-seed grad psum) — for
        slices with more chips than wanted seeds."""
        from factorized_tpu.parallel.multiseed import train_mfm_multiseed
        from factorized_tpu.utils.logging import RunLogger

        data, dims = self._data()
        cfg = CFG.replace(input_dims=list(dims), num_epochs=2, batchsize=16)
        quiet = RunLogger(echo=False)
        ref = train_mfm_multiseed(*data, cfg, n_seeds=4, logger=quiet)
        mesh2 = make_mesh(8, axes=("seed", "batch"), shape=(4, 2))
        shd = train_mfm_multiseed(*data, cfg, n_seeds=4, logger=quiet,
                                  mesh=mesh2)
        assert shd["best_seed"] == ref["best_seed"]
        for a, b in zip(ref["results"], shd["results"]):
            assert abs(a["metrics"]["mae"] - b["metrics"]["mae"]) < 5e-3
            assert abs(a["best_valid"] - b["best_valid"]) < 5e-3

    def test_2d_mesh_batch_must_divide(self):
        from factorized_tpu.parallel.multiseed import train_mfm_multiseed
        from factorized_tpu.utils.logging import RunLogger

        data, dims = self._data()
        cfg = CFG.replace(input_dims=list(dims), num_epochs=1,
                          batchsize=18)
        with pytest.raises(ValueError, match="batch"):
            train_mfm_multiseed(*data, cfg, n_seeds=2,
                                logger=RunLogger(echo=False),
                                mesh=make_mesh(8, axes=("seed", "batch"),
                                               shape=(2, 4)))


class TestMultiSeedAcc:
    @pytest.mark.slow
    def test_accuracy_semantics(self):
        from factorized_tpu.parallel.multiseed import train_mfm_multiseed
        from factorized_tpu.utils.logging import RunLogger

        rng = np.random.default_rng(0)
        dims = (12, 4, 6)
        d = sum(dims)
        data = []
        for n in (48, 16, 24):
            X = rng.normal(size=(n, 5, d)).astype(np.float32)
            y = (X.mean((1, 2)) > 0).astype(np.int64)
            data.extend([X, y])
        cfg = CFG.replace(input_dims=list(dims), num_epochs=2,
                          batchsize=16, task="classification",
                          output_dim=2)
        res = train_mfm_multiseed(*data, cfg, n_seeds=2,
                                  logger=RunLogger(echo=False),
                                  valid_metric="accuracy")
        for r in res["results"]:
            assert 0.0 <= r["metrics"]["accuracy"] <= 1.0
            assert 0.0 <= r["best_valid"] <= 1.0  # accuracies, not losses


class TestSeedParallelMeshSizing:
    def test_non_dividing_lane_count_shrinks_the_mesh(self):
        """Bucket sizes are data-dependent (random shape draws), so
        --seed-parallel must not crash when lanes don't divide the
        device count: it shards over the largest dividing device
        count instead (cli._seed_parallel_mesh)."""
        from factorized_tpu.cli import _seed_parallel_mesh

        # 8 virtual devices (conftest): 3 lanes -> 3-device 1-D mesh
        mesh = _seed_parallel_mesh(3)
        assert mesh.devices.size == 3

        # 6 lanes -> largest divisor of 6 that is <= 8 is 6
        mesh = _seed_parallel_mesh(6)
        assert mesh.devices.size == 6

        # dividing counts keep the full slice: 4 seeds over 8 devices
        # -> 2-D ('seed', 'batch') mesh using all 8
        mesh = _seed_parallel_mesh(4)
        assert mesh.devices.size == 8
        assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
            "seed": 4, "batch": 2}
