"""CMU-MultimodalSDK adapter — load computational-sequence (``.csd``)
HDF5 files, the PUBLIC distribution channel the reference README points
users to (``README.md:28-30``: "download from CMU-MultimodalSDK").

The reference's own loaders read word-aligned features from CMU lab
storage that is unreachable outside the lab (``data_loader.py:9-22``
hardcodes ``/media/bighdd5`` paths), so a user reproducing the paper
today starts from the SDK's public ``.csd`` releases. This adapter
produces the SAME ``(X, y)`` arrays as :mod:`factorized_tpu.data.mosi`
from those files.

``.csd`` layout (h5py):

    <root>/data/<segment_id>/features   (n, d) float
    <root>/data/<segment_id>/intervals  (n, 2) float seconds
    <root>/metadata/...

where ``segment_id`` is ``"<video_id>[<segment_index>]"``.

Pipeline (the word-level alignment of ``data_loader.py:62-101`` recast
on interval data):
- the TEXT sequence (timestamped word vectors) provides the word
  timeline: one row per word, already embedded (300-d GloVe) — the
  SDK ships vectors, so no word2ix/embedding pickles are needed;
- audio/visual rows are aligned TO each word by averaging all rows
  whose intervals overlap the word's interval (the interval form of
  the reference's frame-window averaging), NaN/±inf zeroed like
  ``load_covarep`` (``data_loader.py:83-101``);
- one label per segment from the labels sequence;
- videos sorted by id, 52/10/31 split (``data_loader.py:118-128``),
  segments LEFT-padded / truncated keeping the LAST ``seqlength``
  words (``data_loader.py:139-152``);
- visual features max-abs normalized by TRAIN statistics
  (``mfm_mosi.py:94-103``), audio too when ``normalize_covarep``
  (the ``get_data_missing`` variant, ``mfm_mosi.py:181-191``).
"""

from __future__ import annotations

import os
import re
from collections import defaultdict

import numpy as np

# standard SDK release filenames for CMU-MOSI; override via ``files=``
DEFAULT_FILES = {
    "text": "CMU_MOSI_TimestampedWordVectors.csd",
    "audio": "CMU_MOSI_COVAREP.csd",
    "visual": "CMU_MOSI_Visual_Facet_41.csd",
    "labels": "CMU_MOSI_Opinion_Labels.csd",
}

# CMU-MOSEI releases: the labels sequence carries 7 columns
# (sentiment + 6 emotion intensities) -> the multi-trait path
MOSEI_FILES = {
    "text": "CMU_MOSEI_TimestampedWordVectors.csd",
    "audio": "CMU_MOSEI_COVAREP.csd",
    "visual": "CMU_MOSEI_VisualFacet42.csd",
    "labels": "CMU_MOSEI_Labels.csd",
}
MOSEI_TRAITS = ["sentiment", "happy", "sad", "anger", "surprise",
                "disgust", "fear"]

# POM releases (speaker-trait regression): the labels sequence carries
# one column per trait in the SDK's column order, which matches
# data/multitrait.py POM_TRAITS (confident .. humorous, 17 columns).
# Filenames follow the SDK's published release names; override via
# ``files=`` if a download uses different ones.
POM_FILES = {
    "text": "POM_TimestampedWordVectors.csd",
    "audio": "POM_COVAREP.csd",
    "visual": "POM_Facet_42.csd",
    "labels": "POM_Labels.csd",
}

SEQLENGTH = 20

# the reference MOSI split: 52 train / 10 valid / 31 test videos of the
# full 93 (``data_loader.py:122-124``)
MOSI_N_VIDEOS = 93
MOSI_SPLIT = (52, 10)

_SEG_RE = re.compile(r"^(.*)\[(\d+)\]$")


class SdkSplits(tuple):
    """The standard 6-tuple ``(X_train, y_train, X_valid, y_valid,
    X_test, y_test)`` — unpacks everywhere the pickle loaders' tuples
    do — carrying ``input_dims`` ([text, audio, visual] feature widths,
    known only once the csd files are open) as an attribute so callers
    can size models without module-global state."""

    input_dims: list

    def __new__(cls, arrays, input_dims):
        obj = super().__new__(cls, arrays)
        obj.input_dims = list(input_dims)
        return obj


def read_csd(path):
    """-> {segment_id: (features (n,d) float32, intervals (n,2))}."""
    import h5py

    out = {}
    with h5py.File(path, "r") as f:
        roots = list(f.keys())
        if not roots:
            raise ValueError(f"empty csd file: {path}")
        if len(roots) != 1:
            # a real SDK csd has exactly one root computational
            # sequence; silently reading the alphabetically-first one
            # of several would load the wrong data
            raise ValueError(
                f"csd file {path} has {len(roots)} root groups "
                f"({sorted(roots)}); expected exactly one computational "
                "sequence - the file is malformed or concatenated")
        data = f[roots[0]]["data"]
        for seg_id in data:
            grp = data[seg_id]
            out[seg_id] = (
                np.asarray(grp["features"], np.float32),
                np.asarray(grp["intervals"], np.float64),
            )
    if not out:
        raise ValueError(f"csd has no segments: {path}")
    return out


def split_segment_id(seg_id):
    """``"2iD-tVS8NPw[3]"`` -> ``("2iD-tVS8NPw", 3)``."""
    m = _SEG_RE.match(seg_id)
    if not m:
        return seg_id, 0
    return m.group(1), int(m.group(2))


def align_to_words(word_intervals, feats, feat_intervals):
    """Average the feature rows overlapping each word interval.

    One (n_words, n_rows) overlap mask -> one matmul; empty windows
    give zero vectors and non-finite values are zeroed, both like the
    reference's averaging loops (``data_loader.py:62-101``).
    """
    feats = np.nan_to_num(feats, nan=0.0, posinf=0.0, neginf=0.0)
    if feats.size == 0:
        return np.zeros((len(word_intervals), feats.shape[1] or 0),
                        np.float32)
    w_s = word_intervals[:, 0:1]          # (n, 1)
    w_e = word_intervals[:, 1:2]
    f_s = feat_intervals[None, :, 0]      # (1, m)
    f_e = feat_intervals[None, :, 1]
    mask = ((f_e > w_s) & (f_s < w_e)).astype(np.float32)  # (n, m)
    counts = mask.sum(axis=1, keepdims=True)
    sums = mask @ feats                   # (n, d)
    return np.where(counts > 0, sums / np.maximum(counts, 1.0),
                    0.0).astype(np.float32)


def _pad_keep_last(arr, t):
    """LEFT-pad with zeros / keep the LAST t rows
    (``data_loader.py:139-152`` semantics)."""
    n = arr.shape[0]
    if n >= t:
        return arr[n - t:]
    out = np.zeros((t,) + arr.shape[1:], arr.dtype)
    out[t - n:] = arr
    return out


def load_segments(data_root, files=None, label_mode="scalar"):
    """Read + word-align the four sequences.

    -> {video_id: [ {text, covarep, facet, label, length} sorted by
       segment index ]}

    ``label_mode``: "scalar" takes COLUMN 0 of the label features (the
    sentiment column — averaged over rows when a segment has several);
    "vector" keeps one value per label COLUMN (multi-trait sets like
    MOSEI's sentiment + 6 emotions).
    """
    f = dict(DEFAULT_FILES)
    if files:
        f.update(files)

    def path(kind):
        p = os.path.join(data_root, f[kind])
        if not os.path.exists(p):
            raise FileNotFoundError(
                f"missing {kind} csd: {p} — point --data-root at a "
                f"directory of CMU-MultimodalSDK .csd files (defaults: "
                f"{sorted(DEFAULT_FILES.values())})")
        return p

    text = read_csd(path("text"))
    audio = read_csd(path("audio"))
    visual = read_csd(path("visual"))
    labels = read_csd(path("labels"))

    by_vid = defaultdict(list)
    for seg_id, (wvecs, w_iv) in text.items():
        if seg_id not in labels:
            continue  # unlabeled segment: nothing to train on
        lab_feats, _ = labels[seg_id]
        lab = np.asarray(lab_feats, np.float64).reshape(
            np.asarray(lab_feats).shape[0], -1)
        if label_mode == "vector":
            label = lab.mean(axis=0).astype(np.float32)
        else:
            # scalar mode: COLUMN 0 only — the sentiment column. For
            # multi-column label sets (MOSEI: sentiment + 6 emotion
            # intensities on a different scale) averaging across
            # columns would produce a meaningless mixed-scale target.
            label = float(lab[:, 0].mean())
        seg = {
            "text": wvecs,
            "label": label,
            "length": wvecs.shape[0],
        }
        for kind, src in (("covarep", audio), ("facet", visual)):
            if seg_id in src:
                fts, f_iv = src[seg_id]
                seg[kind] = align_to_words(w_iv, fts, f_iv)
            else:
                seg[kind] = None  # width filled in once known
        vid, idx = split_segment_id(seg_id)
        by_vid[vid].append((idx, seg))

    # fill missing-modality segments with zero vectors of the dataset's
    # width (the reference zero-fills empty windows the same way)
    widths = {}
    for kind in ("covarep", "facet"):
        for segs in by_vid.values():
            for _, seg in segs:
                if seg[kind] is not None:
                    widths[kind] = seg[kind].shape[1]
                    break
            if kind in widths:
                break
        if kind not in widths:
            raise ValueError(f"no segment carries {kind} features")
    for segs in by_vid.values():
        for _, seg in segs:
            for kind in ("covarep", "facet"):
                if seg[kind] is None:
                    seg[kind] = np.zeros(
                        (seg["length"], widths[kind]), np.float32)

    return {vid: [s for _, s in sorted(segs, key=lambda x: x[0])]
            for vid, segs in by_vid.items()}


def _stack_split(videos, seqlength):
    text, cov, fac, labels = [], [], [], []
    for _, segs in videos:
        for seg in segs:
            text.append(_pad_keep_last(seg["text"], seqlength))
            cov.append(_pad_keep_last(seg["covarep"], seqlength))
            fac.append(_pad_keep_last(seg["facet"], seqlength))
            labels.append(seg["label"])
    return (np.stack(text), np.stack(cov), np.stack(fac),
            np.asarray(labels, np.float32))


def _cache_path(data_root, kind_paths, seqlength, label_mode, split,
                normalize_covarep):
    """Content-keyed cache file for the aligned/split arrays.

    The key hashes each csd's (KIND, name, size, mtime_ns) — the
    modality binding matters: the same file set bound to swapped
    modalities must not collide — plus every argument that changes the
    output, so editing/replacing a csd or changing the split
    invalidates automatically."""
    import hashlib

    h = hashlib.sha256()
    for kind in sorted(kind_paths):
        p = kind_paths[kind]
        st = os.stat(p)
        h.update(f"{kind}={os.path.basename(p)}:{st.st_size}:"
                 f"{st.st_mtime_ns};".encode())
    h.update(f"{seqlength}|{label_mode}|{split}|"
             f"{normalize_covarep}|v1".encode())
    return os.path.join(data_root, ".factorized_cache",
                        h.hexdigest()[:20] + ".npz")


def get_data(seqlength: int = SEQLENGTH, data_root=None, files=None,
             split=None, normalize_covarep: bool = False,
             label_mode: str = "scalar", cache: bool = True):
    """-> (X_train, y_train, X_valid, y_valid, X_test, y_test), X
    batch-major (n, t, d_total = text+audio+visual), exactly the shape
    contract of :func:`factorized_tpu.data.mosi.get_data`. With
    ``label_mode="vector"`` the y arrays are (n, n_traits) — the
    multi-trait trainer's contract (MOSEI: pass ``files=MOSEI_FILES``).

    ``split=(n_train_videos, n_valid_videos)``; the remainder is test.
    Default: the reference's absolute 52/10/31
    (``data_loader.py:122-124``) ONLY when the dataset is exactly
    MOSI-sized (93 videos); any other video count — fixture subsets or
    much larger sets like CMU-MOSEI (~3200 videos, where 52 absolute
    train videos would be degenerate) — gets the same PROPORTIONS
    (56%/11%/rest, at least one video per split). Pass ``split=`` (CLI:
    ``--split N_TRAIN,N_VALID``) to override either way.
    """
    if not data_root or not os.path.isdir(data_root):
        raise FileNotFoundError(
            "mosi_sdk needs --data-root pointing at CMU-MultimodalSDK "
            ".csd files (public download; see DEFAULT_FILES)")

    # word alignment reads ~2 datasets per segment per modality through
    # h5py — at MOSEI scale (22k segments) that is ~180k object opens
    # and minutes of single-core host time, so the aligned/split arrays
    # are cached on disk keyed by csd (size, mtime) + every argument
    cache_file = None
    if cache:
        f_all = dict(DEFAULT_FILES)
        if files:
            f_all.update(files)
        kind_paths = {k: os.path.join(data_root, v)
                      for k, v in f_all.items()}
        if all(os.path.exists(p) for p in kind_paths.values()):
            cache_file = _cache_path(data_root, kind_paths, seqlength,
                                     label_mode, split, normalize_covarep)
            if os.path.exists(cache_file):
                try:
                    z = np.load(cache_file)
                    return SdkSplits(
                        tuple(z[k] for k in ("X_train", "y_train", "X_valid",
                                             "y_valid", "X_test", "y_test")),
                        input_dims=z["input_dims"].tolist(),
                    )
                except Exception:
                    # corrupt/truncated cache (e.g. interrupted write):
                    # drop it and fall through to the rebuild path
                    try:
                        os.remove(cache_file)
                    except OSError:
                        pass

    by_vid = load_segments(data_root, files, label_mode=label_mode)
    vids = sorted(by_vid.items(), key=lambda kv: kv[0])
    if split is None:
        if len(vids) == MOSI_N_VIDEOS:
            split = MOSI_SPLIT
        else:
            n_tr = max(1, int(len(vids) * MOSI_SPLIT[0] / MOSI_N_VIDEOS))
            n_va = max(1, int(len(vids) * MOSI_SPLIT[1] / MOSI_N_VIDEOS))
            split = (n_tr, n_va)
    n_tr, n_va = split
    if len(vids) <= n_tr + n_va:
        raise ValueError(
            f"only {len(vids)} videos but split={split} needs more — "
            f"pass split=(n_train, n_valid) sized for this dataset")
    train_v, valid_v = vids[:n_tr], vids[n_tr:n_tr + n_va]
    test_v = vids[n_tr + n_va:]

    te_tr, co_tr, fa_tr, y_tr = _stack_split(train_v, seqlength)
    te_va, co_va, fa_va, y_va = _stack_split(valid_v, seqlength)
    te_te, co_te, fa_te, y_te = _stack_split(test_v, seqlength)

    from factorized_tpu.data.batcher import compute_train_max

    fa_max = compute_train_max(fa_tr)
    fa_tr, fa_va, fa_te = fa_tr / fa_max, fa_va / fa_max, fa_te / fa_max
    if normalize_covarep:
        co_max = compute_train_max(co_tr)
        co_tr, co_va, co_te = co_tr / co_max, co_va / co_max, co_te / co_max

    def build(t, c, f):
        return np.concatenate([t, c, f], axis=2).astype(np.float32)

    out = SdkSplits(
        (build(te_tr, co_tr, fa_tr), y_tr,
         build(te_va, co_va, fa_va), y_va,
         build(te_te, co_te, fa_te), y_te),
        input_dims=[te_tr.shape[2], co_tr.shape[2], fa_tr.shape[2]],
    )
    if cache_file is not None:
        os.makedirs(os.path.dirname(cache_file), exist_ok=True)
        # pid-unique tmp: concurrent processes building the same key
        # each write their own file and atomically replace — no
        # interleaved half-written npz can land under cache_file
        tmp = f"{cache_file}.{os.getpid()}.tmp"
        np.savez(tmp, X_train=out[0], y_train=out[1], X_valid=out[2],
                 y_valid=out[3], X_test=out[4], y_test=out[5],
                 input_dims=np.asarray(out.input_dims))
        # np.savez appends .npz to names without it
        os.replace(tmp if os.path.exists(tmp) else tmp + ".npz",
                   cache_file)
    return out
