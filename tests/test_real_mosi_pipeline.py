"""End-to-end test of the REAL MOSI loading path against a fabricated
``data_root`` with the reference's exact file layout
(``data_loader.py:9-22``): truth CSV, word-aligned transcripts, FACET
CSVs (30 fps), COVAREP .mat (100 Hz), GloVe pickles, fs_mask."""

import os
import pickle

import numpy as np
import pytest

scipy = pytest.importorskip("scipy")
import scipy.io as sio  # noqa: E402

from factorized_tpu.data import mosi, synthetic


N_VIDEOS = 63  # split is hardcoded 52/10/rest (data_loader.py:122-124)
WORDS = ["THE", "CAT", "SAT", "ON", "MAT", "DOG", "RAN", "FAST"]


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mosi_root")
    rng = np.random.default_rng(0)

    word2ix = {w: i + 1 for i, w in enumerate(WORDS)}
    emb = rng.normal(size=(len(WORDS) + 1, 300)).astype(np.float32)
    emb[0] = 0
    (root / "glove_word_embedding").mkdir()
    with open(root / "glove_word_embedding/word2ix_300_mosi.pkl", "wb") as f:
        pickle.dump(word2ix, f)
    with open(root / "glove_word_embedding/glove_300_mosi.pkl", "wb") as f:
        pickle.dump(emb, f)

    cov_ix, fac_ix = synthetic.synthetic_fs_mask()
    with open(root / "fs_mask.pkl", "wb") as f:
        pickle.dump([cov_ix, fac_ix], f)

    (root / "Meta_data").mkdir()
    (root / "Transcript/SEGMENT_ALIGNED").mkdir(parents=True)
    (root / "Features/Visual/FACET_GIOTA").mkdir(parents=True)
    (root / "Features/Audio/raw").mkdir(parents=True)

    truth_lines = []
    for v in range(N_VIDEOS):
        vid = f"vid{v:03d}"
        n_words = int(rng.integers(2, 5))
        sentiment = float(rng.uniform(-3, 3))
        # truth row: start,end,video,segment,sentiment (data_loader.py:58)
        truth_lines.append(f"0.0,{n_words * 0.5},{vid},1,{sentiment}")
        # transcript rows: ?,word,start_seg,end_seg,start_clip,end_clip
        rows = []
        for w in range(n_words):
            word = WORDS[int(rng.integers(0, len(WORDS)))]
            s, e = w * 0.5, (w + 1) * 0.5
            rows.append(f"x,{word},{s},{e},{s},{e}")
        (root / f"Transcript/SEGMENT_ALIGNED/{vid}_1").write_text(
            "\n".join(rows))
        # FACET: header + frames at 30fps, 5 meta cols + 43 features
        n_frames = int(n_words * 0.5 * 30) + 3
        feats = rng.normal(size=(n_frames, 43))
        lines = ["h," * 47 + "h"]
        for fr in feats:
            lines.append(",".join(["0"] * 5 + [f"{x:.6f}" for x in fr]))
        (root / f"Features/Visual/FACET_GIOTA/{vid}.FACET_out.csv"
         ).write_text("\r\n".join(lines))
        # COVAREP: .mat with (frames@100hz, 74) 'features'
        n_aframes = int(n_words * 0.5 * 100) + 5
        afeat = rng.normal(size=(n_aframes, 74))
        afeat[0, 3] = np.nan      # exercises NaN zeroing
        afeat[1, 4] = -np.inf
        sio.savemat(root / f"Features/Audio/raw/{vid}.mat",
                    {"features": afeat})
    (root / "Meta_data/boundaries_sentimentint_avg.csv").write_text(
        "\r\n".join(truth_lines))
    return str(root)


class TestRealPipeline:
    def test_full_get_data(self, data_root):
        X_tr, y_tr, X_v, y_v, X_te, y_te = mosi.get_data(
            seqlength=6, data_root=data_root)
        # 52/10/1 videos x 1 segment each
        assert X_tr.shape == (52, 6, 325)
        assert X_v.shape == (10, 6, 325)
        assert X_te.shape == (1, 6, 325)
        assert np.isfinite(X_tr).all() and np.isfinite(X_te).all()
        assert (-3 <= y_tr).all() and (y_tr <= 3).all()

    def test_split_is_sorted_by_video_id(self, data_root):
        with open(os.path.join(
                data_root, "glove_word_embedding/word2ix_300_mosi.pkl"),
                "rb") as f:
            word2ix = pickle.load(f)
        truth = mosi.load_truth(os.path.join(
            data_root, "Meta_data/boundaries_sentimentint_avg.csv"))
        train, valid, test = mosi.split_videos(truth)
        ids = [v for v, _ in train] + [v for v, _ in valid] + \
            [v for v, _ in test]
        assert ids == sorted(ids)
        assert len(train) == 52 and len(valid) == 10

    def test_word_frame_averaging_matches_manual(self, data_root):
        """The native segment_average over a word's 30fps window must
        equal the manual mean of the CSV rows."""
        with open(os.path.join(
                data_root, "glove_word_embedding/word2ix_300_mosi.pkl"),
                "rb") as f:
            word2ix = pickle.load(f)
        truth = mosi.load_truth(os.path.join(
            data_root, "Meta_data/boundaries_sentimentint_avg.csv"))
        mosi.load_transcripts(truth, os.path.join(
            data_root, "Transcript/SEGMENT_ALIGNED"), word2ix)
        mosi.load_facet(truth, os.path.join(
            data_root, "Features/Visual/FACET_GIOTA"))
        vid = sorted(truth)[0]
        w0 = truth[vid]["1"]["data"][0]
        path = os.path.join(data_root,
                            f"Features/Visual/FACET_GIOTA/{vid}.FACET_out.csv")
        rows = [l for l in open(path).read().replace("\r\n", "\n")
                .split("\n")[1:] if l]
        feats = np.array([[float(x) for x in r.split(",")] for r in rows]
                         )[:, 5:]
        s = int(w0["start_time_clip"] * 30)
        e = int(w0["end_time_clip"] * 30)
        np.testing.assert_allclose(np.asarray(w0["facet"]),
                                   feats[s:e].mean(0), rtol=1e-5)

    def test_covarep_nan_zeroed(self, data_root):
        with open(os.path.join(
                data_root, "glove_word_embedding/word2ix_300_mosi.pkl"),
                "rb") as f:
            word2ix = pickle.load(f)
        truth = mosi.load_truth(os.path.join(
            data_root, "Meta_data/boundaries_sentimentint_avg.csv"))
        mosi.load_transcripts(truth, os.path.join(
            data_root, "Transcript/SEGMENT_ALIGNED"), word2ix)
        mosi.load_covarep(truth, os.path.join(data_root,
                                              "Features/Audio/raw"))
        for vid in truth:
            for seg in truth[vid].values():
                for w in seg["data"]:
                    assert np.isfinite(w["covarep"]).all()

    def test_missing_variant_normalizes_covarep(self, data_root):
        X_tr, *_ = mosi.get_data(seqlength=6, data_root=data_root,
                                 normalize_covarep=True)
        cov = X_tr[..., 300:305]
        assert np.abs(cov).max() <= 1.0 + 1e-5


class TestParserFuzz:
    """Corrupt FACET/COVAREP inputs (VERDICT r1 item 8): garbage rows
    are skipped; files with no recoverable data raise with the path."""

    def _truth(self):
        return {"v0": {"1": {"data": [
            {"word_ix": 1, "word": "THE",
             "start_time_clip": 0.0, "end_time_clip": 0.5},
        ]}}}

    def test_facet_ragged_and_garbage_rows_skipped(self, tmp_path):
        rng = np.random.default_rng(0)
        valid = rng.normal(size=(15, 10))
        lines = ["h," * 9 + "h"]
        for fr in valid:
            lines.append(",".join(["0"] * 5 + [f"{x:.6f}" for x in fr[5:]]))
        # garbage at the tail: ragged short row, non-numeric row, and a
        # full-width row with one bad cell
        lines += ["1,2,3", "a,b,c,d,e,f,g,h,i,j",
                  "0,0,0,0,0,oops,1,2,3,4"]
        (tmp_path / "v0.FACET_out.csv").write_text("\r\n".join(lines))
        truth = self._truth()
        mosi.load_facet(truth, str(tmp_path))
        got = truth["v0"]["1"]["data"][0]["facet"]
        # window = frames [0, 15): mean of the 15 valid rows' cols 5:
        manual = np.array([[float(f"{x:.6f}") for x in fr[5:]]
                           for fr in valid]).mean(axis=0)
        np.testing.assert_allclose(np.asarray(got), manual, rtol=1e-5,
                                   atol=1e-6)

    def test_facet_no_valid_rows_raises(self, tmp_path):
        (tmp_path / "v0.FACET_out.csv").write_text(
            "header\r\n1,2,3\r\na,b,c,d,e,f,g\r\n")
        with pytest.raises(ValueError, match="no valid FACET rows"):
            mosi.load_facet(self._truth(), str(tmp_path))

    def test_covarep_zero_frames_gives_zero_vectors(self, tmp_path):
        sio.savemat(tmp_path / "v0.mat",
                    {"features": np.zeros((0, 74))})
        truth = self._truth()
        mosi.load_covarep(truth, str(tmp_path))
        cov = np.asarray(truth["v0"]["1"]["data"][0]["covarep"])
        assert cov.shape == (74,)
        np.testing.assert_array_equal(cov, 0.0)

    def test_covarep_widthless_features_raise(self, tmp_path):
        sio.savemat(tmp_path / "v0.mat", {"features": np.zeros((0, 0))})
        with pytest.raises(ValueError, match="COVAREP"):
            mosi.load_covarep(self._truth(), str(tmp_path))
