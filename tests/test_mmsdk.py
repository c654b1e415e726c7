"""CMU-MultimodalSDK (.csd) adapter: fixture csd files built with h5py,
alignment/padding/split/normalization checked against numpy oracles."""

import json

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from factorized_tpu.data import mmsdk


def write_csd(path, root, segments):
    """segments: {seg_id: (features, intervals)}"""
    with h5py.File(path, "w") as f:
        data = f.create_group(root).create_group("data")
        for seg_id, (feats, ivs) in segments.items():
            g = data.create_group(seg_id)
            g.create_dataset("features", data=np.asarray(feats, np.float32))
            g.create_dataset("intervals", data=np.asarray(ivs, np.float64))


def make_fixture(tmp_path, n_videos=4, segs_per_video=2, words=3,
                 d_text=6, d_audio=4, d_visual=3, long_segment=None):
    """Deterministic csd quartet. Audio rows land at 10Hz, visual at
    5Hz; word i spans [i, i+1) seconds."""
    rng = np.random.default_rng(0)
    text, audio, visual, labels = {}, {}, {}, {}
    for v in range(n_videos):
        vid = f"vid{v:02d}"
        for s in range(segs_per_video):
            seg_id = f"{vid}[{s}]"
            n = long_segment if (long_segment and v == 0 and s == 0) \
                else words
            w_iv = np.stack([np.arange(n), np.arange(n) + 1.0], axis=1)
            text[seg_id] = (rng.normal(size=(n, d_text)), w_iv)
            m_a = 10 * n
            a_iv = np.stack([np.arange(m_a) / 10.0,
                             np.arange(m_a) / 10.0 + 0.1], axis=1)
            audio[seg_id] = (rng.normal(size=(m_a, d_audio)), a_iv)
            m_v = 5 * n
            v_iv = np.stack([np.arange(m_v) / 5.0,
                             np.arange(m_v) / 5.0 + 0.2], axis=1)
            visual[seg_id] = (rng.normal(size=(m_v, d_visual)), v_iv)
            labels[seg_id] = (np.array([[(v + s) % 5 - 2.0]]),
                              np.array([[0.0, n * 1.0]]))
    root = tmp_path / "csd"
    root.mkdir(exist_ok=True)
    write_csd(root / "CMU_MOSI_TimestampedWordVectors.csd", "glove", text)
    write_csd(root / "CMU_MOSI_COVAREP.csd", "COVAREP", audio)
    write_csd(root / "CMU_MOSI_Visual_Facet_41.csd", "FACET", visual)
    write_csd(root / "CMU_MOSI_Opinion_Labels.csd", "Opinion", labels)
    return str(root)


class TestAlignment:
    def test_overlap_averaging_oracle(self):
        words = np.array([[0.0, 1.0], [1.0, 2.0]])
        feats = np.array([[1.0], [3.0], [10.0]], np.float32)
        ivs = np.array([[0.0, 0.5], [0.5, 1.0], [1.0, 2.0]])
        out = mmsdk.align_to_words(words, feats, ivs)
        np.testing.assert_allclose(out, [[2.0], [10.0]])

    def test_boundary_touching_row_excluded(self):
        # a row ending exactly at the word start does not overlap
        words = np.array([[1.0, 2.0]])
        feats = np.array([[5.0], [7.0]], np.float32)
        ivs = np.array([[0.0, 1.0], [1.0, 1.5]])
        out = mmsdk.align_to_words(words, feats, ivs)
        np.testing.assert_allclose(out, [[7.0]])

    def test_empty_window_gives_zeros_and_nan_zeroed(self):
        words = np.array([[5.0, 6.0], [0.0, 1.0]])
        feats = np.array([[np.nan, 2.0]], np.float32)
        ivs = np.array([[0.0, 1.0]])
        out = mmsdk.align_to_words(words, feats, ivs)
        np.testing.assert_allclose(out, [[0.0, 0.0], [0.0, 2.0]])


class TestPadding:
    def test_left_pad_short(self):
        arr = np.arange(6, dtype=np.float32).reshape(2, 3)
        out = mmsdk._pad_keep_last(arr, 4)
        assert out.shape == (4, 3)
        np.testing.assert_array_equal(out[:2], 0.0)
        np.testing.assert_array_equal(out[2:], arr)

    def test_truncate_keeps_last(self):
        arr = np.arange(15, dtype=np.float32).reshape(5, 3)
        out = mmsdk._pad_keep_last(arr, 2)
        np.testing.assert_array_equal(out, arr[3:])


class TestEndToEnd:
    def test_shapes_split_and_normalization(self, tmp_path):
        root = make_fixture(tmp_path, n_videos=4, segs_per_video=2,
                            words=3, long_segment=9)
        out = mmsdk.get_data(seqlength=5, data_root=root, split=(2, 1))
        X_tr, y_tr, X_va, y_va, X_te, y_te = out
        # 2 train videos x 2 segs, 1 valid, 1 test
        assert X_tr.shape == (4, 5, 6 + 4 + 3)
        assert X_va.shape == (2, 5, 13)
        assert X_te.shape == (2, 5, 13)
        assert y_tr.shape == (4,)
        assert out.input_dims == [6, 4, 3]
        # visual block max-abs normalized by TRAIN stats
        vis_tr = X_tr[:, :, 10:]
        assert np.nanmax(np.abs(vis_tr)) <= 1.0 + 1e-6
        # split is by sorted video id: vid00+vid01 train, vid02 valid
        assert np.isfinite(X_tr).all()

    def test_long_segment_keeps_last_words(self, tmp_path):
        root = make_fixture(tmp_path, n_videos=4, long_segment=9)
        out = mmsdk.get_data(seqlength=5, data_root=root, split=(2, 1))
        X_tr = out[0]
        # vid00[0] is the 9-word segment; its padded row 0 is a REAL
        # word (truncation keeps the last 5), so text block is nonzero
        assert np.abs(X_tr[0, 0, :6]).sum() > 0

    def test_short_segment_left_padded(self, tmp_path):
        root = make_fixture(tmp_path)
        out = mmsdk.get_data(seqlength=5, data_root=root, split=(2, 1))
        X_tr = out[0]
        # 3-word segments at seqlength 5: first two rows all-zero
        np.testing.assert_array_equal(X_tr[0, :2], 0.0)
        assert np.abs(X_tr[0, 2:]).sum() > 0

    def test_split_too_large_raises(self, tmp_path):
        root = make_fixture(tmp_path)
        with pytest.raises(ValueError, match="split"):
            mmsdk.get_data(seqlength=5, data_root=root, split=(52, 10))

    def test_default_split_scales_to_small_datasets(self, tmp_path):
        root = make_fixture(tmp_path, n_videos=4, segs_per_video=1)
        out = mmsdk.get_data(seqlength=5, data_root=root)
        X_tr, _, X_va, _, X_te, _ = out
        # 4 videos -> proportional (2, 1, 1), one segment each
        assert (X_tr.shape[0], X_va.shape[0], X_te.shape[0]) == (2, 1, 1)

    def test_default_split_mosi_sized_uses_52_10(self, tmp_path):
        root = make_fixture(tmp_path, n_videos=93, segs_per_video=1,
                            words=2)
        out = mmsdk.get_data(seqlength=3, data_root=root)
        X_tr, _, X_va, _, X_te, _ = out
        # exactly 93 videos -> the reference's absolute 52/10/31
        assert (X_tr.shape[0], X_va.shape[0], X_te.shape[0]) == (52, 10, 31)

    def test_default_split_large_dataset_is_proportional(self, tmp_path):
        """A larger-than-MOSI set (e.g. CMU-MOSEI, ~3200 videos) must
        NOT get MOSI's absolute 52 train videos (which would train on
        ~2% of the data); the default is proportional."""
        root = make_fixture(tmp_path, n_videos=80, segs_per_video=1,
                            words=2)
        out = mmsdk.get_data(seqlength=3, data_root=root)
        X_tr, _, X_va, _, X_te, _ = out
        # 80 * 52/93 = 44, 80 * 10/93 = 8
        assert (X_tr.shape[0], X_va.shape[0], X_te.shape[0]) == (44, 8, 28)

    def test_multi_root_csd_rejected(self, tmp_path):
        root = make_fixture(tmp_path)
        # corrupt the text csd with a second root group
        with h5py.File(f"{root}/CMU_MOSI_TimestampedWordVectors.csd",
                       "a") as f:
            f.create_group("extraneous_root").create_group("data")
        with pytest.raises(ValueError, match="root groups"):
            mmsdk.get_data(seqlength=5, data_root=root, split=(2, 1))

    def test_missing_file_message(self, tmp_path):
        (tmp_path / "empty").mkdir()
        with pytest.raises(FileNotFoundError, match="data-root"):
            mmsdk.get_data(data_root=str(tmp_path / "empty"))

    def test_normalize_covarep(self, tmp_path):
        root = make_fixture(tmp_path)
        out = mmsdk.get_data(seqlength=5, data_root=root, split=(2, 1),
                             normalize_covarep=True)
        aud_tr = out[0][:, :, 6:10]
        assert np.nanmax(np.abs(aud_tr)) <= 1.0 + 1e-6

    def test_trains_one_epoch(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from factorized_tpu.config import MFMConfig
        from factorized_tpu.models import get_model
        from factorized_tpu.train import TrainProgram, make_optimizer

        root = make_fixture(tmp_path)
        data = mmsdk.get_data(seqlength=5, data_root=root, split=(2, 1))
        X_tr, y_tr, *_ = data
        cfg = MFMConfig(
            input_dims=data.input_dims, seqlength=5, batchsize=2,
            h_dims=[4, 4, 4], memsize=4, zy_size=4, zl_size=4, za_size=4,
            zv_size=4, fy_size=4, fl_size=4, fa_size=4, fv_size=4,
            att1_shape=4, att2_shape=4, gamma1_shape=4, gamma2_shape=4,
        )
        init, apply_fn = get_model("mfm")
        params = init(jax.random.PRNGKey(0), cfg)
        opt = make_optimizer("adam", 1e-3)
        program = TrainProgram(apply_fn, cfg, "joint", opt)
        Xb = jnp.asarray(X_tr.swapaxes(0, 1)[None, :, :2])  # (1,t,n,d)
        yb = jnp.asarray(y_tr[None, :2])
        _, _, loss = program.epoch(params, opt.init(params), Xb, yb,
                                   jax.random.PRNGKey(1),
                                   jnp.asarray(1e-3, jnp.float32))
        assert np.isfinite(float(loss))


class TestSegmentIds:
    def test_split_segment_id(self):
        assert mmsdk.split_segment_id("abc[12]") == ("abc", 12)
        assert mmsdk.split_segment_id("noindex") == ("noindex", 0)


def make_mosei_fixture(tmp_path, n_videos=4, segs_per_video=2, words=4,
                       n_traits=7):
    """MOSEI-style quartet: label sequences carry n_traits columns."""
    rng = np.random.default_rng(1)
    text, audio, visual, labels = {}, {}, {}, {}
    for v in range(n_videos):
        for s in range(segs_per_video):
            seg_id = f"mvid{v:02d}[{s}]"
            n = words
            w_iv = np.stack([np.arange(n), np.arange(n) + 1.0], axis=1)
            text[seg_id] = (rng.normal(size=(n, 6)), w_iv)
            audio[seg_id] = (rng.normal(size=(2 * n, 4)),
                             np.stack([np.arange(2 * n) / 2.0,
                                       np.arange(2 * n) / 2.0 + 0.5],
                                      axis=1))
            visual[seg_id] = (rng.normal(size=(n, 3)), w_iv.copy())
            labels[seg_id] = (rng.normal(size=(1, n_traits)),
                              np.array([[0.0, n * 1.0]]))
    root = tmp_path / "mosei"
    root.mkdir(exist_ok=True)
    from factorized_tpu.data.mmsdk import MOSEI_FILES

    write_csd(root / MOSEI_FILES["text"], "glove", text)
    write_csd(root / MOSEI_FILES["audio"], "COVAREP", audio)
    write_csd(root / MOSEI_FILES["visual"], "FACET", visual)
    write_csd(root / MOSEI_FILES["labels"], "All Labels", labels)
    return str(root)


class TestMoseiMultitrait:
    def test_vector_labels_shape(self, tmp_path):
        root = make_mosei_fixture(tmp_path)
        out = mmsdk.get_data(seqlength=5, data_root=root,
                             files=mmsdk.MOSEI_FILES, split=(2, 1),
                             label_mode="vector")
        X_tr, y_tr = out[0], out[1]
        assert X_tr.shape == (4, 5, 6 + 4 + 3)
        assert y_tr.shape == (4, 7)

    def test_multirow_labels_averaged(self, tmp_path):
        root = make_mosei_fixture(tmp_path, n_videos=4, segs_per_video=1)
        from factorized_tpu.data.mmsdk import MOSEI_FILES

        path = f"{root}/{MOSEI_FILES['labels']}"
        with h5py.File(path, "a") as f:
            rootname = list(f.keys())[0]
            g = f[rootname]["data"]["mvid00[0]"]
            del g["features"], g["intervals"]
            g.create_dataset("features",
                             data=np.array([[1.0] * 7, [3.0] * 7],
                                           np.float32))
            g.create_dataset("intervals",
                             data=np.array([[0.0, 2.0], [2.0, 4.0]]))
        segs = mmsdk.load_segments(root, files=mmsdk.MOSEI_FILES,
                                   label_mode="vector")
        np.testing.assert_allclose(segs["mvid00"][0]["label"],
                                   [2.0] * 7)

    def test_mosei_scalar_regression_dataset(self, tmp_path):
        """`mosei_sdk` as a standard regression dataset: scalar labels
        are COLUMN 0 of the 7-column sequence (the sentiment score),
        never a mixed-scale mean over emotion columns."""
        from factorized_tpu.cli import _dataset_info, load_dataset

        root = make_mosei_fixture(tmp_path)
        data = load_dataset("mosei_sdk", 5, root)
        X_tr, y_tr, *_ = data
        assert y_tr.ndim == 1
        assert X_tr.shape[1] == 5
        assert _dataset_info("mosei_sdk", data)["input_dims"] == [6, 4, 3]
        segs = mmsdk.load_segments(root, files=mmsdk.MOSEI_FILES,
                                   label_mode="vector")
        scalars = mmsdk.load_segments(root, files=mmsdk.MOSEI_FILES,
                                      label_mode="scalar")
        for vid in segs:
            for sv, ss in zip(segs[vid], scalars[vid]):
                np.testing.assert_allclose(ss["label"], sv["label"][0],
                                           rtol=1e-6)

    def test_cli_end_to_end(self, tmp_path):
        from factorized_tpu.cli import main

        root = make_mosei_fixture(tmp_path)
        cfg = {
            "seqlength": 5, "h_dims": [4, 4, 4], "memsize": 4,
            "zy_size": 4, "zl_size": 4, "za_size": 4, "zv_size": 4,
            "fy_size": 4, "fl_size": 4, "fa_size": 4, "fv_size": 4,
            "att1_shape": 4, "att2_shape": 4, "gamma1_shape": 4,
            "gamma2_shape": 4, "batchsize": 4, "num_epochs": 1,
        }
        cfg_path = tmp_path / "tiny.json"
        cfg_path.write_text(json.dumps(cfg))
        out = tmp_path / "runs"
        rc = main(["multitrait", "--style", "mosei_sdk",
                   "--data-root", root, "--config", str(cfg_path),
                   "--out", str(out)])
        assert rc == 0
        # the run's final record carries 7-trait metric lists the
        # check --multitrait mode can aggregate
        import glob

        from factorized_tpu.check import best_multitrait

        assert glob.glob(f"{out}/*.jsonl")
        res = best_multitrait(str(out), out=lambda *a: None)
        assert len(res.get("mae", [])) == 7


def make_pom_fixture(tmp_path, n_videos=5, words=4, n_traits=17):
    """POM-style quartet: one segment per video, 17 trait columns on
    the 1..7 annotation scale."""
    rng = np.random.default_rng(2)
    text, audio, visual, labels = {}, {}, {}, {}
    for v in range(n_videos):
        seg_id = f"pvid{v:02d}[0]"
        n = words
        w_iv = np.stack([np.arange(n), np.arange(n) + 1.0], axis=1)
        text[seg_id] = (rng.normal(size=(n, 6)), w_iv)
        audio[seg_id] = (rng.normal(size=(2 * n, 4)),
                         np.stack([np.arange(2 * n) / 2.0,
                                   np.arange(2 * n) / 2.0 + 0.5], axis=1))
        visual[seg_id] = (rng.normal(size=(n, 3)), w_iv.copy())
        labels[seg_id] = (rng.uniform(1.0, 7.0, size=(1, n_traits)),
                          np.array([[0.0, n * 1.0]]))
    root = tmp_path / "pom"
    root.mkdir(exist_ok=True)
    from factorized_tpu.data.mmsdk import POM_FILES

    write_csd(root / POM_FILES["text"], "glove", text)
    write_csd(root / POM_FILES["audio"], "COVAREP", audio)
    write_csd(root / POM_FILES["visual"], "FACET", visual)
    write_csd(root / POM_FILES["labels"], "POM Labels", labels)
    return str(root)


class TestPomSdk:
    def test_vector_labels_shape(self, tmp_path):
        root = make_pom_fixture(tmp_path)
        out = mmsdk.get_data(seqlength=5, data_root=root,
                             files=mmsdk.POM_FILES, split=(2, 1),
                             label_mode="vector")
        X_tr, y_tr = out[0], out[1]
        assert X_tr.shape == (2, 5, 6 + 4 + 3)
        assert y_tr.shape == (2, 17)
        assert out.input_dims == [6, 4, 3]

    def test_cli_end_to_end_with_check(self, tmp_path):
        """`multitrait --style pom_sdk` trains from public-format csd
        fixtures and `check --multitrait --style pom` aggregates the
        result (the reference's POM report surface, check.py:226-250)."""
        from factorized_tpu.check import best_multitrait
        from factorized_tpu.cli import main

        root = make_pom_fixture(tmp_path)
        cfg = {
            "seqlength": 5, "h_dims": [4, 4, 4], "memsize": 4,
            "zy_size": 4, "zl_size": 4, "za_size": 4, "zv_size": 4,
            "fy_size": 4, "fl_size": 4, "fa_size": 4, "fv_size": 4,
            "att1_shape": 4, "att2_shape": 4, "gamma1_shape": 4,
            "gamma2_shape": 4, "batchsize": 2, "num_epochs": 1,
        }
        cfg_path = tmp_path / "tiny.json"
        cfg_path.write_text(json.dumps(cfg))
        out = tmp_path / "runs"
        rc = main(["multitrait", "--style", "pom_sdk",
                   "--data-root", root, "--config", str(cfg_path),
                   "--out", str(out)])
        assert rc == 0
        res = best_multitrait(str(out), style="pom", out=lambda *a: None)
        # the reference's POM report covers 16 of 17 traits (skips
        # index 14, check.py:241) — parity preserved
        assert len(res.get("mae", [])) == 16

    def test_trait_names_recorded(self, tmp_path):
        """The run record documents the 17 POM trait column names so
        positional metric lists are interpretable."""
        import glob

        from factorized_tpu.cli import main
        from factorized_tpu.data.multitrait import POM_TRAITS

        root = make_pom_fixture(tmp_path)
        cfg = {
            "seqlength": 5, "h_dims": [4, 4, 4], "memsize": 4,
            "zy_size": 4, "zl_size": 4, "za_size": 4, "zv_size": 4,
            "fy_size": 4, "fl_size": 4, "fa_size": 4, "fv_size": 4,
            "att1_shape": 4, "att2_shape": 4, "gamma1_shape": 4,
            "gamma2_shape": 4, "batchsize": 2, "num_epochs": 1,
        }
        cfg_path = tmp_path / "tiny.json"
        cfg_path.write_text(json.dumps(cfg))
        out = tmp_path / "runs"
        main(["multitrait", "--style", "pom_sdk", "--data-root", root,
              "--config", str(cfg_path), "--out", str(out)])
        rec = None
        for path in glob.glob(f"{out}/*.jsonl"):
            for line in open(path):
                r = json.loads(line)
                if r.get("kind") == "config":
                    rec = r
        assert rec is not None and rec["traits"] == POM_TRAITS


class TestMalformedFiles:
    """Skip-vs-raise decisions for damaged csd files (the same policy
    as the real-data parsers: tolerate per-segment gaps, raise on
    structural corruption)."""

    def test_empty_csd_raises(self, tmp_path):
        root = make_fixture(tmp_path)
        with h5py.File(f"{root}/CMU_MOSI_COVAREP.csd", "w"):
            pass  # truncate to an empty file
        with pytest.raises(ValueError, match="empty csd"):
            mmsdk.get_data(seqlength=5, data_root=root, split=(2, 1))

    def test_unlabeled_segment_skipped(self, tmp_path):
        root = make_fixture(tmp_path, n_videos=4, segs_per_video=2)
        # drop one segment's label: that segment silently disappears
        path = f"{root}/CMU_MOSI_Opinion_Labels.csd"
        with h5py.File(path, "a") as f:
            rootname = list(f.keys())[0]
            del f[rootname]["data"]["vid00[1]"]
        out = mmsdk.get_data(seqlength=5, data_root=root, split=(2, 1))
        assert out[0].shape[0] == 3  # 4 train segments - 1 unlabeled

    def test_segment_missing_one_modality_zero_filled(self, tmp_path):
        root = make_fixture(tmp_path, n_videos=4, segs_per_video=2)
        with h5py.File(f"{root}/CMU_MOSI_COVAREP.csd", "a") as f:
            rootname = list(f.keys())[0]
            del f[rootname]["data"]["vid00[0]"]
        out = mmsdk.get_data(seqlength=5, data_root=root, split=(2, 1))
        aud = out[0][0, :, 6:10]  # first train segment's audio block
        np.testing.assert_array_equal(aud, 0.0)


class TestDiskCache:
    """get_data caches the aligned/split arrays on disk (MOSEI-scale
    alignment is minutes of single-core h5py traversal); the key hashes
    csd (size, mtime) + every output-shaping argument."""

    def test_cache_roundtrip_identical(self, tmp_path):
        root = make_fixture(tmp_path)
        first = mmsdk.get_data(seqlength=5, data_root=root, split=(2, 1))
        cache_dir = f"{root}/.factorized_cache"
        import os
        assert len(os.listdir(cache_dir)) == 1
        second = mmsdk.get_data(seqlength=5, data_root=root, split=(2, 1))
        for a, b in zip(first, second):
            np.testing.assert_array_equal(a, b)
        assert second.input_dims == first.input_dims

    def test_cache_rebuilds_when_csd_changes(self, tmp_path):
        root = make_fixture(tmp_path)
        first = mmsdk.get_data(seqlength=5, data_root=root, split=(2, 1))
        # rewrite the labels csd with shifted values: a stale cache
        # would return the OLD labels
        path = f"{root}/CMU_MOSI_Opinion_Labels.csd"
        with h5py.File(path, "a") as f:
            rootname = list(f.keys())[0]
            for seg in f[rootname]["data"]:
                f[rootname]["data"][seg]["features"][...] += 1.0
        import os
        os.utime(path)  # ensure mtime_ns moves even on coarse clocks
        second = mmsdk.get_data(seqlength=5, data_root=root, split=(2, 1))
        np.testing.assert_allclose(np.asarray(second[1]),
                                   np.asarray(first[1]) + 1.0, atol=1e-6)

    def test_distinct_args_distinct_entries(self, tmp_path):
        root = make_fixture(tmp_path)
        a = mmsdk.get_data(seqlength=5, data_root=root, split=(2, 1))
        b = mmsdk.get_data(seqlength=4, data_root=root, split=(2, 1))
        import os
        assert len(os.listdir(f"{root}/.factorized_cache")) == 2
        assert a[0].shape[1] == 5 and b[0].shape[1] == 4

    def test_cache_false_bypasses(self, tmp_path):
        root = make_fixture(tmp_path)
        mmsdk.get_data(seqlength=5, data_root=root, split=(2, 1),
                       cache=False)
        import os
        assert not os.path.exists(f"{root}/.factorized_cache")

    def test_swapped_modality_binding_distinct_entries(self, tmp_path):
        """The same file SET bound to swapped modalities must not
        collide to one cache entry (the key hashes kind->file pairs,
        not the sorted path set)."""
        root = make_fixture(tmp_path, d_audio=4, d_visual=4)
        a = mmsdk.get_data(seqlength=5, data_root=root, split=(2, 1))
        swapped = {"audio": "CMU_MOSI_Visual_Facet_41.csd",
                   "visual": "CMU_MOSI_COVAREP.csd"}
        b = mmsdk.get_data(seqlength=5, data_root=root, split=(2, 1),
                           files=swapped)
        import os
        assert len(os.listdir(f"{root}/.factorized_cache")) == 2
        assert not np.array_equal(a[0], b[0])
