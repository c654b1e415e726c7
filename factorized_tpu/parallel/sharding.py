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


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Thin multi-host runtime bootstrap: ``jax.distributed.initialize``
    with explicit args, env-var args, or TPU-metadata auto-detection.

    Precedence per field: explicit argument, then environment
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID`` — the names jax itself documents), then jax's
    own auto-detection (on Cloud TPU the coordinator comes from TPU
    metadata and no field is needed).

    Returns True when initialize() was called, False when it was
    skipped because the runtime is already initialized. Call BEFORE
    any backend use; after it, ``jax.devices()`` spans all hosts and
    ``make_mesh()`` builds global meshes unchanged (docs/scaling.md
    "Multi-host"). Single-process jobs never need this.
    """
    import os

    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    try:  # tolerate jax-internal layout drift; worst case we re-init
        already = jax._src.distributed.global_state.client is not None
    except Exception:  # pragma: no cover
        already = False
    if already:
        return False  # already initialized (re-init would raise)
    kw = {}
    if coordinator_address is not None:
        kw["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is not None:
        kw["process_id"] = process_id
    jax.distributed.initialize(**kw)
    return True


def make_mesh(n_devices: Optional[int] = None,
              axes: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None,
              multihost: bool = False) -> Mesh:
    if multihost:
        init_distributed()
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
        shape = (n,) if len(axes) == 1 else _default_2d_shape(n, axes)
    return Mesh(devices.reshape(shape), axes)


def _default_2d_shape(n: int, axes) -> tuple:
    """Default 2-axis mesh split: prefer ``(n//2, 2)``; for odd
    composite ``n`` use the smallest odd factor; refuse loudly for
    prime ``n>2`` instead of letting numpy reshape throw a raw error."""
    if n == 1:
        return (1, 1)  # degenerate but valid single-device 2-axis mesh
    if n % 2 == 0:
        return (n // 2, 2)
    p = next((f for f in range(3, int(n ** 0.5) + 1, 2) if n % f == 0),
             None)
    if p is None:
        raise ValueError(
            f"make_mesh: cannot pick a default 2-D shape for "
            f"axes={tuple(axes)} over {n} devices ({n} is prime). "
            f"Pass shape=(a, b) with a*b == {n} explicitly, or use a "
            "device count that factors (e.g. n_devices=n-1)."
        )
    return (n // p, p)


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

    A rule that MATCHES a weight whose sharded dim does not divide the
    'model' axis raises: silently replicating it would leave the user
    believing they enabled TP while actually running DP.
    """
    if rules is None:
        rules = [("decoder_l/fc1/w", 1), ("decoder_l/lstm/wx", 1),
                 ("decoder_l/lstm/wh", 1)]
    replicated = NamedSharding(mesh, P())
    n_model = mesh.shape["model"]

    def path_str(path):
        return "/".join(str(getattr(k, "key", k)) for k in path)

    def assign(path, leaf):
        p = path_str(path)
        for sub, axis in rules:
            if sub in p and hasattr(leaf, "ndim") and leaf.ndim == 2:
                if leaf.shape[axis] % n_model:
                    raise ValueError(
                        f"tensor-parallel rule {sub!r} matches weight "
                        f"{p} with shape {tuple(leaf.shape)}, but dim "
                        f"{axis} ({leaf.shape[axis]}) does not divide "
                        f"the mesh 'model' axis ({n_model}) - shard a "
                        "divisible weight, resize the model, or drop "
                        "the rule (silently replicating would be DP "
                        "masquerading as TP)")
                spec = [None, None]
                spec[axis] = "model"
                return NamedSharding(mesh, P(*spec))
        return replicated

    shardings = jax.tree_util.tree_map_with_path(assign, params)
    return jax.tree.map(lambda x, s: jax.device_put(x, s), params,
                        shardings)
