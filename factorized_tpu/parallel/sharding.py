"""Device-mesh sharding for training.

TPU-native design (replaces: nothing — the reference has no distributed
story at all, only hardcoded single-GPU ``.cuda()`` calls,
``mfm_model.py:51``):

- 1-D (or 2-D) ``jax.sharding.Mesh``; batch axis sharded over ``data``.
- Parameters replicated; with batch sharded and the loss a mean over
  batch, XLA inserts the gradient ``psum`` over ICI automatically when
  the train step is jitted with these shardings — no hand-written
  collectives (the "How to Scale Your Model" recipe).
- Optional tensor-parallel axis ``model`` sharding the widest weight
  matrices (the 300-wide text decoder output projections); for MFM-size
  models this is demonstrative — DP is the production strategy
  (SURVEY.md §5.8).

Why per-batch-axis sharding composes with the whole-epoch scan: the
batched epoch tensor is (nb, t, B, d) and we shard B, so every scanned
minibatch is already distributed and the scan body's collectives ride
ICI once per step.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axes: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(
            f"make_mesh: need {n} devices, have {len(devices)} "
            f"(platform={devices[0].platform!r}). For CPU testing set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n} and "
            "force the cpu platform BEFORE first backend use via "
            "jax.config.update('jax_platforms', 'cpu') — env "
            "JAX_PLATFORMS alone is too late on images that preload a "
            "TPU plugin (see tests/conftest.py)."
        )
    devices = np.asarray(devices[:n])
    if shape is None:
        shape = (n,) if len(axes) == 1 else (n // 2, 2)
    return Mesh(devices.reshape(shape), axes)


class DataParallel:
    """Placement helpers for DP training over ``mesh`` axis 'data'."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh
        self.n = mesh.shape["data"]
        self.replicated = NamedSharding(mesh, P())

    def params(self, params):
        """Replicate a parameter/optimizer pytree on every device."""
        return jax.device_put(params, self.replicated)

    def epoch_batches(self, Xb, yb):
        """Shard the epoch tensor (nb, t, B, d) / labels (nb, B) over
        the batch axis B. B must divide by mesh size (callers pad or
        pick batch sizes accordingly)."""
        assert Xb.shape[2] % self.n == 0, (
            f"batch {Xb.shape[2]} not divisible by mesh data={self.n}"
        )
        xs = NamedSharding(self.mesh, P(None, None, "data", None))
        ys = NamedSharding(self.mesh, P(None, "data"))
        return jax.device_put(Xb, xs), jax.device_put(yb, ys)

    def full_set(self, X, y=None):
        """Shard a full-set eval batch (t, N, d) over N (pad to mesh)."""
        t, n, d = X.shape
        pad = (-n) % self.n
        if pad:
            X = np.concatenate([X, np.zeros((t, pad, d), X.dtype)], axis=1)
            if y is not None:
                y = np.concatenate([y, np.zeros((pad,), y.dtype)])
        xs = NamedSharding(self.mesh, P(None, "data", None))
        X = jax.device_put(X, xs)
        if y is None:
            return X, n
        return X, jax.device_put(
            y, NamedSharding(self.mesh, P("data"))), n


def tp_param_shardings(mesh: Mesh, params, rules=None):
    """Optional tensor-parallel shardings for the widest projection
    weights, composed with DP on a 2-D ('data', 'model') mesh.

    For MFM-sized models TP is demonstrative (SURVEY.md §5.8: ~1M
    params, DP is the production strategy) — but the mechanism is real:
    selected weight matrices shard their output columns over 'model'
    and XLA inserts the all-gathers. ``rules`` is a list of
    (path_substring, axis) pairs; default shards the decoder output
    projections and decoder recurrent weights (the 300-wide text heads).
    """
    if rules is None:
        rules = [("decoder_l/fc1/w", 1), ("decoder_l/lstm/wx", 1),
                 ("decoder_l/lstm/wh", 1)]
    replicated = NamedSharding(mesh, P())

    def path_str(path):
        return "/".join(str(getattr(k, "key", k)) for k in path)

    def assign(path, leaf):
        p = path_str(path)
        for sub, axis in rules:
            if sub in p and hasattr(leaf, "ndim") and leaf.ndim == 2:
                spec = [None, None]
                spec[axis] = "model"
                if leaf.shape[axis] % mesh.shape["model"] == 0:
                    return NamedSharding(mesh, P(*spec))
        return replicated

    shardings = jax.tree_util.tree_map_with_path(assign, params)
    return jax.tree.map(lambda x, s: jax.device_put(x, s), params,
                        shardings)
