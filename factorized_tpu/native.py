"""ctypes bindings for the native data-path kernels (``native/segavg.cpp``).

The library auto-builds on first import (``make -C native``); every
entry point has a numpy fallback so the framework works without a
toolchain. Use :func:`available` to check which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_REPO, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsegavg.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.segment_average.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_int64, i64p, i64p,
            ctypes.c_int64, f32p,
        ]
        lib.pad_truncate.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, f32p,
        ]
        lib.pad_truncate_batch.argtypes = [
            f32p, i64p, i64p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int, ctypes.c_float, ctypes.c_int,
            f32p,
        ]
        _lib = lib
    except OSError:
        _lib = False
    return _lib


def available() -> bool:
    return bool(_load())


def segment_average(feats, starts, ends):
    """Average ``feats[s:e]`` per (s, e) word window -> (n_words, dim);
    zero vector for empty windows, NaN/-inf zeroed
    (``data_loader.py:62-101`` semantics)."""
    feats = np.ascontiguousarray(feats, np.float32)
    starts = np.ascontiguousarray(starts, np.int64)
    ends = np.ascontiguousarray(ends, np.int64)
    n_words = len(starts)
    out = np.empty((n_words, feats.shape[1]), np.float32)
    lib = _load()
    if lib:
        lib.segment_average(feats, feats.shape[0], feats.shape[1],
                            starts, ends, n_words, out)
        return out
    # numpy fallback: per-window means. (A cumsum trick would let one
    # NaN frame poison every later window; the reference zeroes NaN
    # only in the windows containing it, data_loader.py:93-100.)
    avg = np.zeros((n_words, feats.shape[1]), np.float64)
    s = np.clip(starts, 0, feats.shape[0])
    e = np.clip(ends, 0, feats.shape[0])
    for w in range(n_words):
        if e[w] > s[w]:
            avg[w] = feats[s[w]:e[w]].mean(0)
    avg[np.isnan(avg)] = 0.0
    avg[np.isneginf(avg)] = 0.0
    return avg.astype(np.float32)


def pad_truncate_batch(segments, max_len, left_pad, clip=None,
                       nan_to_num=False):
    """Batch of (len_i, dim) segments -> (n, max_len, dim) with the
    reference pad/truncate/clip semantics."""
    n = len(segments)
    dim = segments[0].shape[1]
    lib = _load()
    if lib:
        lens = np.array([len(s) for s in segments], np.int64)
        offsets = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
        flat = np.ascontiguousarray(
            np.concatenate([np.asarray(s, np.float32).reshape(-1, dim)
                            for s in segments]), np.float32)
        out = np.empty((n, max_len, dim), np.float32)
        lib.pad_truncate_batch(flat, offsets, lens, n, dim, max_len,
                               int(left_pad), float(clip or 0.0),
                               int(nan_to_num), out.reshape(-1))
        return out
    from factorized_tpu.data.synthetic import pad_dict_segment

    side = "left" if left_pad else "right"
    out = np.stack([pad_dict_segment(s, max_len, side, dim)
                    for s in segments])
    if nan_to_num:
        out = np.nan_to_num(out)
    if clip:
        out = np.clip(out, -clip, clip)
    return out
