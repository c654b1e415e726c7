"""Native C++ data-path kernels vs numpy fallbacks."""

import numpy as np
import pytest

from factorized_tpu import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


class TestSegmentAverage:
    def test_matches_naive(self):
        rng = np.random.default_rng(0)
        feats = rng.normal(size=(50, 7)).astype(np.float32)
        starts = np.array([0, 10, 45, 20], np.int64)
        ends = np.array([5, 10, 60, 21], np.int64)  # empty + clamped
        got = native.segment_average(feats, starts, ends)
        assert got.shape == (4, 7)
        np.testing.assert_allclose(got[0], feats[0:5].mean(0), rtol=1e-5)
        np.testing.assert_array_equal(got[1], np.zeros(7))  # empty window
        np.testing.assert_allclose(got[2], feats[45:50].mean(0), rtol=1e-5)
        np.testing.assert_allclose(got[3], feats[20:21].mean(0), rtol=1e-5)

    def test_nan_neginf_zeroed(self):
        feats = np.full((4, 3), np.nan, np.float32)
        feats[:, 1] = -np.inf
        feats[:, 2] = 2.0
        got = native.segment_average(feats, np.array([0], np.int64),
                                     np.array([4], np.int64))
        assert got[0, 0] == 0.0 and got[0, 1] == 0.0 and got[0, 2] == 2.0


class TestPadTruncateBatch:
    def test_left_right_and_truncate(self):
        segs = [np.arange(6, dtype=np.float32).reshape(3, 2),
                np.arange(20, dtype=np.float32).reshape(10, 2)]
        left = native.pad_truncate_batch(segs, 5, left_pad=True)
        right = native.pad_truncate_batch(segs, 5, left_pad=False)
        assert left.shape == (2, 5, 2)
        np.testing.assert_array_equal(left[0][:2], np.zeros((2, 2)))
        np.testing.assert_array_equal(left[0][2:],
                                      np.arange(6).reshape(3, 2))
        np.testing.assert_array_equal(right[0][:3],
                                      np.arange(6).reshape(3, 2))
        # truncation keeps the LAST rows in both modes
        np.testing.assert_array_equal(left[1],
                                      np.arange(10, 20).reshape(5, 2))
        np.testing.assert_array_equal(right[1],
                                      np.arange(10, 20).reshape(5, 2))

    def test_clip_and_nan(self):
        segs = [np.array([[300.0, -300.0], [np.nan, 1.0]], np.float32)]
        out = native.pad_truncate_batch(segs, 3, left_pad=False,
                                        clip=255.0, nan_to_num=True)
        assert out[0, 0, 0] == 255.0 and out[0, 0, 1] == -255.0
        assert out[0, 1, 0] == 0.0

    def test_matches_python_fallback(self):
        rng = np.random.default_rng(1)
        segs = [rng.normal(size=(rng.integers(2, 12), 4)).astype(np.float32)
                for _ in range(6)]
        got = native.pad_truncate_batch(segs, 8, left_pad=True)
        from factorized_tpu.data.synthetic import pad_dict_segment

        want = np.stack([pad_dict_segment(s, 8, "left", 4) for s in segs])
        np.testing.assert_array_equal(got, want)
