"""CMU-MOSI adapter.

Real pipeline parity (``data_loader.py`` + ``mfm_mosi.py:41-126``):
- truth CSV -> per-video/segment sentiment + time bounds
  (``data_loader.py:51-59``);
- word-aligned transcript rows (``data_loader.py:104-115``);
- FACET visual features averaged over each word's frame range at 30 fps
  (``data_loader.py:62-80``), COVAREP audio at 100 Hz with NaN/-inf
  zeroing (``data_loader.py:83-101``);
- videos sorted by id, split 52 train / 10 valid / 31 test
  (``data_loader.py:118-128``);
- segments LEFT-padded with zeros / truncated keeping the LAST
  ``seqlength`` words (``data_loader.py:139-152``);
- feature selection via fs_mask (covarep -> 5 dims, facet -> 20 dims;
  ``mfm_mosi.py:60-69``) or raw covarep columns 1:35;
- facet max-abs normalization by TRAIN statistics (``mfm_mosi.py:94-103``;
  the missing-modality variant also normalizes covarep:
  ``mfm_mosi.py:181-191``);
- frozen 300-d embedding lookup (the reference's only Keras use,
  ``mfm_mosi.py:105-108`` — here a plain gather), then feature-axis
  concat [text | audio | video].

When ``data_root`` is absent the schema-faithful synthetic generator
supplies the word-level dicts and the SAME downstream pipeline runs.
"""

from __future__ import annotations

import csv
import os
import pickle
from collections import defaultdict

import numpy as np

from factorized_tpu.data import synthetic

INPUT_DIMS_FS = [300, 5, 20]
SEQLENGTH = 20
BINARY_THRESHOLD = 0.0


# ---------------------------------------------------------- real pipeline

def load_truth(truth_path):
    truth = defaultdict(dict)
    with open(truth_path, newline="") as f:
        for line in f.read().replace("\r\n", "\n").split("\n"):
            if not line:
                continue
            row = line.split(",")
            truth[row[2]][row[3]] = {
                "start_time": float(row[0]),
                "end_time": float(row[1]),
                "sentiment": float(row[4]),
            }
    return truth


def load_transcripts(truth, transcript_dir, word2ix):
    for vid in truth:
        for seg in truth[vid]:
            path = os.path.join(transcript_dir, f"{vid}_{seg}")
            truth[vid][seg]["data"] = []
            with open(path) as f:
                for line in f.read().split("\n"):
                    if not line:
                        continue
                    row = line.split(",")
                    truth[vid][seg]["data"].append({
                        "word_ix": word2ix[row[1]],
                        "word": row[1],
                        "start_time_clip": float(row[4]),
                        "end_time_clip": float(row[5]),
                    })


def _assign_word_averages(truth_vid, feats, rate, field):
    """Batch all of a video's word windows into one native
    segment_average call (factorized_tpu.native; C++ hot loop replacing
    the reference's per-word python loop)."""
    from factorized_tpu import native

    words = [w for seg in truth_vid.values() for w in seg["data"]]
    starts = np.array([int(w["start_time_clip"] * rate) for w in words],
                      np.int64)
    ends = np.array([int(w["end_time_clip"] * rate) for w in words],
                    np.int64)
    avgs = native.segment_average(feats.astype(np.float32), starts, ends)
    for w, a in zip(words, avgs):
        w[field] = a


def load_facet(truth, facet_dir, fps=30):
    """Average FACET rows over each word's frame window (native C++
    batch kernel instead of the reference's per-word python loop)."""
    for vid in truth:
        path = os.path.join(facet_dir, f"{vid}.FACET_out.csv")
        with open(path, newline="") as f:
            lines = [l for l in f.read().replace("\r\n", "\n").split("\n")[1:]
                     if l]
        # a truncated/garbage row (wrong column count, non-numeric) is
        # skipped; a file with NO valid rows is data corruption and
        # raises with the path rather than silently producing zeros
        rows = []
        for l in lines:
            cells = l.split(",")
            if len(cells) <= 5:
                continue
            try:
                rows.append([float(x) for x in cells])
            except ValueError:
                continue
        if rows:
            width = max(len(r) for r in rows)
            rows = [r for r in rows if len(r) == width]
        if not rows:
            raise ValueError(f"no valid FACET rows in {path}")
        feats = np.array(rows, dtype=np.float64)[:, 5:]
        _assign_word_averages(truth[vid], feats, fps, "facet")


def load_covarep(truth, covarep_dir, hz=100):
    import scipy.io as sio

    for vid in truth:
        path = os.path.join(covarep_dir, f"{vid}.mat")
        fts = np.asarray(sio.loadmat(path)["features"], np.float64)
        # zero frames but a known width is fine (every word window is
        # empty -> zero vectors, segavg.cpp:21-45); a features matrix
        # with no width at all is corruption and raises with the path
        if fts.ndim != 2 or fts.shape[1] == 0:
            raise ValueError(
                f"empty/invalid COVAREP features in {path}: "
                f"shape {fts.shape}")
        _assign_word_averages(truth[vid], fts, hz, "covarep")


def split_videos(truth):
    """Sorted by video id; hardcoded 52/10/31 (``data_loader.py:122-124``)."""
    data = sorted(truth.items(), key=lambda kv: kv[0])
    return data[:52], data[52:62], data[62:]


def segments_to_arrays(videos, max_segment_len):
    segs = []
    for vid, v in videos:
        for seg_id, seg in v.items():
            fts = seg["data"]
            segs.append({
                "text": np.array([w["word_ix"] for w in fts]),
                "covarep": np.array([w["covarep"] for w in fts], np.float32),
                "facet": np.array([w["facet"] for w in fts], np.float32),
                "label": seg["sentiment"],
                "length": len(fts),
            })
    return synthetic.pad_segments(segs, max_segment_len, side="left")


def load_word_level_features(max_segment_len, data_root):
    """Real-data path, mirroring ``data_loader.py:168-178``."""
    with open(os.path.join(data_root,
                           "glove_word_embedding/word2ix_300_mosi.pkl"),
              "rb") as f:
        word2ix = pickle.load(f)
    truth = load_truth(os.path.join(
        data_root, "Meta_data/boundaries_sentimentint_avg.csv"))
    load_transcripts(truth, os.path.join(data_root,
                                         "Transcript/SEGMENT_ALIGNED"),
                     word2ix)
    load_facet(truth, os.path.join(data_root,
                                   "Features/Visual/FACET_GIOTA"))
    load_covarep(truth, os.path.join(data_root, "Features/Audio/raw"))
    train, valid, test = split_videos(truth)
    return (
        segments_to_arrays(train, max_segment_len),
        segments_to_arrays(valid, max_segment_len),
        segments_to_arrays(test, max_segment_len),
    )


# ------------------------------------------------------------- adapter

def get_data(seqlength: int = SEQLENGTH, feature_selection: bool = True,
             data_root=None, normalize_covarep: bool = False,
             synthetic_seed: int = 123):
    """-> (X_train, y_train, X_valid, y_valid, X_test, y_test) with
    X batch-major (n, t, d_total) exactly like ``mfm_mosi.py:41-126``.

    ``normalize_covarep=True`` reproduces ``get_data_missing``
    (``mfm_mosi.py:181-191``).
    """
    if data_root and os.path.isdir(data_root):
        train, valid, test = load_word_level_features(seqlength, data_root)
        with open(os.path.join(data_root, "glove_word_embedding/"
                               "glove_300_mosi.pkl"), "rb") as f:
            embedding = pickle.load(f)
        if feature_selection:
            with open(os.path.join(data_root, "fs_mask.pkl"), "rb") as f:
                covarep_ix, facet_ix = pickle.load(f)
        else:
            covarep_ix = facet_ix = None
    else:
        train, valid, test = synthetic.synthetic_word_level(
            seqlength, seed=synthetic_seed)
        embedding = synthetic.synthetic_embedding()
        covarep_ix, facet_ix = (synthetic.synthetic_fs_mask()
                                if feature_selection else (None, None))

    if feature_selection:
        sel = lambda d: (d["covarep"][:, :, covarep_ix],
                         d["facet"][:, :, facet_ix])
    else:
        # raw path keeps covarep columns 1:35 (mfm_mosi.py:73)
        sel = lambda d: (d["covarep"][:, :, 1:35], d["facet"])

    cov_tr, fac_tr = sel(train)
    cov_va, fac_va = sel(valid)
    cov_te, fac_te = sel(test)

    # facet max-abs normalization by train stats (mfm_mosi.py:94-103)
    from factorized_tpu.data.batcher import compute_train_max

    fac_max = compute_train_max(fac_tr)
    fac_tr, fac_va, fac_te = fac_tr / fac_max, fac_va / fac_max, fac_te / fac_max
    if normalize_covarep:
        cov_max = compute_train_max(cov_tr)
        cov_tr, cov_va, cov_te = (cov_tr / cov_max, cov_va / cov_max,
                                  cov_te / cov_max)

    def build(split, cov, fac):
        text_emb = embedding[split["text"]]
        return np.concatenate([text_emb, cov, fac], axis=2).astype(np.float32)

    return (
        build(train, cov_tr, fac_tr), train["label"].astype(np.float32),
        build(valid, cov_va, fac_va), valid["label"].astype(np.float32),
        build(test, cov_te, fac_te), test["label"].astype(np.float32),
    )


def input_dims(feature_selection: bool = True):
    return INPUT_DIMS_FS if feature_selection else [300, 34, synthetic.FACET_RAW]
