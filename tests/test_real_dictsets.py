"""Real-data branches of the MOUD / YouTube / MMMO adapters against
fabricated data_roots with the reference's pickle/CSV layouts
(``mfm_moud.py:40,193-195``, ``mfm_you.py:204``, ``mfm_mmmo.py:35,211``)."""

import pickle

import numpy as np
import pytest

from factorized_tpu.data import mmmo, moud, youtube


def _dump_dicts(root, dicts, names):
    for d, name in zip(dicts, names):
        with open(root / name, "wb") as f:
            pickle.dump(d, f)


def _make_modality_dicts(rng, n_videos, segs, dims=(300, 74, 36),
                         vid_fmt="v{:03d}"):
    text, audio, video = {}, {}, {}
    for v in range(n_videos):
        vid = vid_fmt.format(v)
        text[vid], audio[vid], video[vid] = {}, {}, {}
        for s in range(segs):
            sid = str(s + 1)
            L = int(rng.integers(2, 7))
            text[vid][sid] = rng.normal(size=(L, dims[0])).astype(np.float32)
            audio[vid][sid] = rng.normal(size=(L, dims[1])).astype(np.float32)
            video[vid][sid] = rng.normal(size=(L, dims[2])).astype(np.float32)
    return text, audio, video


class TestRealMoud:
    def test_cats_labels_and_neutral_dropped(self, tmp_path):
        rng = np.random.default_rng(0)
        # real MOUD ids contain an underscore (the cats.txt parser
        # splits on the SECOND underscore, mfm_moud.py:46)
        text, audio, video = _make_modality_dicts(rng, 62, 2,
                                                  vid_fmt="sp_{:03d}")
        _dump_dicts(tmp_path, (text, audio, video),
                    ("text_dict.p", "audio_dict.p", "video_dict.p"))
        lines = []
        labels = ["positive", "negative", "neutral"]
        for v, vid in enumerate(text):
            for sid in text[vid]:
                lines.append(f"{vid}_{sid} {labels[(v + int(sid)) % 3]}")
        (tmp_path / "cats.txt").write_text("\n".join(lines))

        X_tr, y_tr, X_v, y_v, X_te, y_te = moud.get_data(
            seqlength=5, data_root=str(tmp_path))
        assert X_tr.shape[1:] == (5, 410)
        assert set(np.unique(y_tr)) <= {0, 1}  # neutral dropped
        # 62 videos x 2 segs = 124 total; each video has ~1/3 neutral
        total = len(y_tr) + len(y_v) + len(y_te)
        assert total < 124
        assert np.abs(X_tr).max() <= 255.0


class TestRealYoutube:
    def test_annotations_csv_three_classes(self, tmp_path):
        rng = np.random.default_rng(1)
        text, audio, video = _make_modality_dicts(rng, 40, 2)
        _dump_dicts(tmp_path, (text, audio, video),
                    ("text_dict.p", "audio_dict.p", "video_dict.p"))
        rows = []
        for v, vid in enumerate(text):
            for sid in text[vid]:
                rows.append(f"{vid},{sid},{(v % 3) - 1}")
        (tmp_path / "sentimentAnnotations.csv").write_text("\n".join(rows))

        X_tr, y_tr, X_v, y_v, X_te, y_te = youtube.get_data(
            seqlength=4, data_root=str(tmp_path))
        assert set(np.unique(np.concatenate([y_tr, y_v, y_te]))) <= {0, 1, 2}
        # splits 30/5/rest videos x 2 segs
        assert len(y_tr) == 60 and len(y_v) == 10 and len(y_te) == 10


class TestRealMmmo:
    def test_annotations_full_and_threshold(self, tmp_path):
        rng = np.random.default_rng(2)
        text, audio, video = _make_modality_dicts(rng, 265, 1)
        _dump_dicts(tmp_path, (text, audio, video),
                    ("text_dict_s.p", "audio_dict_s.p", "video_dict_s.p"))
        rows = ["link,score,final"]
        for v, vid in enumerate(text):
            rows.append(f"{vid}.mp4,{3.0},{1 + (v % 7)}")
        (tmp_path / "annotations_full.csv").write_text("\n".join(rows))

        X_tr, y_tr, X_v, y_v, X_te, y_te = mmmo.get_data(
            seqlength=4, data_root=str(tmp_path))
        assert len(y_tr) == 220 and len(y_v) == 40 and len(y_te) == 5
        assert 1.0 <= y_tr.min() and y_tr.max() <= 7.0
        assert mmmo.BINARY_THRESHOLD == 3.5
        assert mmmo.THRESHOLD_MODE == "gt"


class TestParserFuzz:
    """Malformed-input behavior of the real-data parsers (VERDICT r1
    item 8): garbage rows are SKIPPED, mirroring the reference's
    bare-except tolerance (``mfm_moud.py:91-107``), never crash."""

    def test_moud_malformed_cats_lines_skipped(self, tmp_path):
        rng = np.random.default_rng(0)
        text, audio, video = _make_modality_dicts(rng, 62, 2,
                                                  vid_fmt="sp_{:03d}")
        _dump_dicts(tmp_path, (text, audio, video),
                    ("text_dict.p", "audio_dict.p", "video_dict.p"))
        lines = []
        for v, vid in enumerate(text):
            for sid in text[vid]:
                lines.append(f"{vid}_{sid} "
                             f"{'positive' if v % 2 else 'negative'}")
        clean = "\n".join(lines)
        (tmp_path / "cats.txt").write_text(clean)
        ref = moud.get_data(seqlength=5, data_root=str(tmp_path))

        # now inject garbage: ids with <2 underscores, missing label,
        # unknown label, blank lines
        dirty = clean + ("\nnounderscore positive\none_underscore negative"
                         "\n\nsp_000_9 maybe\nlonelytoken\n")
        (tmp_path / "cats.txt").write_text(dirty)
        fuzzed = moud.get_data(seqlength=5, data_root=str(tmp_path))
        for a, b in zip(ref, fuzzed):
            np.testing.assert_array_equal(a, b)

    def test_mmmo_malformed_rows_skipped_and_fallback(self, tmp_path):
        rng = np.random.default_rng(1)
        text, audio, video = _make_modality_dicts(rng, 265, 1)
        _dump_dicts(tmp_path, (text, audio, video),
                    ("text_dict_s.p", "audio_dict_s.p", "video_dict_s.p"))
        vids = list(text)
        rows = ["link,score,final"]
        # first video: last column garbage -> column-1 fallback
        rows.append(f"{vids[0]}.mp4,4.5,garbage")
        # second video: no parseable label anywhere -> row skipped
        rows.append(f"{vids[1]}.mp4,notanum,alsonot")
        # a single-cell junk row -> skipped (would IndexError naively)
        rows.append("justonecell")
        for vid in vids[2:]:
            rows.append(f"{vid}.mp4,3.0,2.0")
        (tmp_path / "annotations_full.csv").write_text("\n".join(rows))

        X_tr, y_tr, *_ = mmmo.get_data(seqlength=4,
                                       data_root=str(tmp_path))
        # vids[0] got the fallback label 4.5; vids[1] was dropped
        assert y_tr[0] == 4.5
        # 220-video train split minus the one skipped video
        assert len(y_tr) == 219


class TestMoudCsvOrder:
    def test_split_uses_spanish_text_order(self, tmp_path):
        rng = np.random.default_rng(3)
        text, audio, video = _make_modality_dicts(rng, 62, 1,
                                                  vid_fmt="sp_{:03d}")
        _dump_dicts(tmp_path, (text, audio, video),
                    ("text_dict.p", "audio_dict.p", "video_dict.p"))
        vids = list(text)
        (tmp_path / "cats.txt").write_text("\n".join(
            f"{vid}_1 positive" for vid in vids))
        # csv lists videos in REVERSED order -> split must follow it
        (tmp_path / "spanish_text.csv").write_text("\n".join(
            f"{vid}.mp4_seg_1,x" for vid in reversed(vids)))
        X_tr, y_tr, X_v, y_v, X_te, y_te = moud.get_data(
            seqlength=4, data_root=str(tmp_path))
        # 62 videos reversed; split 48/10/rest (mfm_moud.py:90-107)
        assert len(y_tr) == 48 and len(y_v) == 10 and len(y_te) == 4


class TestRealMultitrait:
    def test_trait_csv_and_vector_labels(self, tmp_path):
        from factorized_tpu.data import multitrait

        rng = np.random.default_rng(4)
        text, audio, video = _make_modality_dicts(rng, 30, 1)
        _dump_dicts(tmp_path, (text, audio, video),
                    ("text_dict_s.p", "audio_dict_s.p", "video_dict_s.p"))
        n_traits = len(multitrait.POM_TRAITS)
        rows = ["video," + ",".join(multitrait.POM_TRAITS)]
        for vid in text:
            vals = rng.uniform(1, 7, n_traits)
            rows.append(vid + ".mp4," + ",".join(f"{v:.2f}" for v in vals))
        (tmp_path / "trait_annotations.csv").write_text("\n".join(rows))

        X_tr, y_tr, X_v, y_v, X_te, y_te = multitrait.get_data(
            seqlength=5, data_root=str(tmp_path), style="pom")
        assert X_tr.shape[1:] == (5, 410)
        assert y_tr.shape == (21, n_traits)  # 70% of 30 videos
        assert (X_v.shape[0], X_te.shape[0]) == (3, 6)
        assert y_tr.min() >= 1.0 and y_tr.max() <= 7.0
        assert np.abs(X_tr).max() <= 255.0

    def test_iemocap_style_right_pad(self, tmp_path):
        from factorized_tpu.data import multitrait

        rng = np.random.default_rng(5)
        text, audio, video = _make_modality_dicts(rng, 20, 1)
        _dump_dicts(tmp_path, (text, audio, video),
                    ("text_dict_s.p", "audio_dict_s.p", "video_dict_s.p"))
        n_traits = len(multitrait.IEMOCAP_TRAITS)
        rows = ["video," + ",".join(multitrait.IEMOCAP_TRAITS)]
        for vid in text:
            vals = rng.uniform(0, 3, n_traits)
            rows.append(vid + "," + ",".join(f"{v:.2f}" for v in vals))
        (tmp_path / "trait_annotations.csv").write_text("\n".join(rows))

        X_tr, y_tr, _, _, _, _ = multitrait.get_data(
            seqlength=10, data_root=str(tmp_path), style="iemocap")
        assert y_tr.shape[1] == n_traits
        # right-padded (MOUD/YouTube side): segments are 2-6 words, so
        # the TAIL rows of every 10-step sequence are zero
        assert np.all(X_tr[:, -1, :] == 0.0)
        assert not np.all(X_tr[:, 0, :] == 0.0)
