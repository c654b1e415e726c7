"""Dataset adapters (MOSI, MOUD, YouTube, MMMO) and schema-faithful
synthetic fixtures.

The reference hardcodes paths into CMU lab storage
(``data_loader.py:9-22``, ``mfm_moud.py:37-40``), so the real features
are unavailable outside that environment. Every adapter here:

1. implements the REAL loading pipeline faithfully (word-aligned
   feature averaging, per-dataset splits, padding sides, normalization,
   clipping) against a configurable ``data_root``;
2. falls back to a deterministic synthetic generator that emits the
   exact same array schema when the real files are absent — so every
   experiment, test and benchmark runs anywhere.
"""

from factorized_tpu.data import mosi, moud, multitrait, youtube, mmmo  # noqa: F401
from factorized_tpu.data.synthetic import synthetic_word_level  # noqa: F401
