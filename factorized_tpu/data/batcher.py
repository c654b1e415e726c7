"""Device-resident batching: embedding lookup + modality concat inside
jit (SURVEY.md §7 item 3 — the device-side alternative to the
reference's host-side frozen Keras ``Embedding.predict`` + numpy concat,
``mfm_mosi.py:105-124``).

The host adapters (data/mosi.py) still assemble numpy arrays for the
trainer interface; this module serves pipelines that want the embedding
matrix device-resident so only integer ids (n, t) and the small
audio/visual features cross the host->device boundary, with the gather
+ concat fusing into the first consumer under jit. The normalization
helpers here are also the single implementation used by the host
adapter (train-stat max-abs, ``mfm_mosi.py:94-103``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def embed_concat(text_ids, covarep, facet, embedding):
    """(n, t) int ids + (n, t, d_a) + (n, t, d_v) + (V, 300)
    -> (n, t, 300 + d_a + d_v) on device."""
    emb = jnp.take(embedding, text_ids, axis=0)
    return jnp.concatenate([emb, covarep, facet], axis=2)


@jax.jit
def normalize_maxabs(x, train_max):
    """Max-abs normalization by train statistics (``mfm_mosi.py:94-103``);
    ``train_max`` should already have zeros replaced by 1."""
    return x / train_max


def compute_train_max(x):
    """Per-feature max-abs over (n, t) train axes, zeros -> 1."""
    m = np.max(np.abs(np.asarray(x)), axis=(0, 1))
    m[m == 0] = 1.0
    return m.astype(np.float32)


class DeviceBatcher:
    """Holds the frozen embedding + normalization stats on device and
    assembles model-ready (n, t, d_total) batches under jit."""

    def __init__(self, embedding, facet_train_max, covarep_train_max=None):
        self.embedding = jnp.asarray(embedding, jnp.float32)
        self.facet_max = jnp.asarray(facet_train_max, jnp.float32)
        self.covarep_max = (jnp.asarray(covarep_train_max, jnp.float32)
                            if covarep_train_max is not None else None)

    def __call__(self, text_ids, covarep, facet):
        covarep = jnp.asarray(covarep, jnp.float32)
        facet = normalize_maxabs(jnp.asarray(facet, jnp.float32),
                                 self.facet_max)
        if self.covarep_max is not None:
            covarep = normalize_maxabs(covarep, self.covarep_max)
        return embed_concat(jnp.asarray(text_ids), covarep, facet,
                            self.embedding)
