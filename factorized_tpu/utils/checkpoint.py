"""Checkpointing: a strict superset of the reference's whole-module
pickle (``torch.save(model, 'res_*/mfn_%d.pt')``, ``mfm_mosi.py:473-477``)
— we persist (params, opt_state, step, config) so training can RESUME,
which the reference cannot.

Primary format: Orbax (the TPU-production answer: async-capable,
sharding-aware). A flax.serialization msgpack fallback keeps restores
working in minimal environments; both write a sidecar ``meta.json``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np


def _to_host(tree):
    return jax.tree.map(np.asarray, tree)


def save_checkpoint(path: str, params, opt_state=None, step: int = 0,
                    config: Optional[dict] = None, use_orbax: bool = True):
    """Save a training state under ``path`` (a directory)."""
    os.makedirs(path, exist_ok=True)
    state = {"params": _to_host(params)}
    if opt_state is not None:
        state["opt_state"] = _to_host(opt_state)
    meta = {"step": int(step), "config": config or {},
            "has_opt_state": opt_state is not None}
    if use_orbax:
        try:
            import orbax.checkpoint as ocp

            ckptr = ocp.PyTreeCheckpointer()
            ckptr.save(os.path.join(os.path.abspath(path), "state"), state,
                       force=True)
            meta["format"] = "orbax"
        except Exception:  # pragma: no cover - orbax API drift fallback
            use_orbax = False
    if not use_orbax:
        from flax import serialization

        with open(os.path.join(path, "state.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(state))
        meta["format"] = "msgpack"
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    return path


def restore_checkpoint(path: str, target: Optional[Any] = None):
    """Restore -> (state dict, meta dict). ``target`` is an example
    pytree (required for msgpack, structure hint for orbax)."""
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if meta.get("format") == "orbax":
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        kw = {}
        if (target is not None and meta.get("has_opt_state")
                and "opt_state" not in target):
            # restoring a params-only view of a full training state
            kw["partial_restore"] = True
        state = ckptr.restore(os.path.join(os.path.abspath(path), "state"),
                              item=target, **kw)
    else:
        from flax import serialization

        with open(os.path.join(path, "state.msgpack"), "rb") as f:
            data = f.read()
        if target is None:
            raise ValueError("msgpack restore requires a target pytree")
        state = serialization.from_bytes(target, data)
    return state, meta


class BestKeeper:
    """Track best-metric params in host memory (and optionally on disk),
    mirroring the reference's save-on-best-valid policy
    (``mfm_mosi.py:473-477``; acc-maximizing variant
    ``mfm_mosi_acc.py:479-485`` uses mode='max' with >=)."""

    def __init__(self, mode: str = "min", ckpt_dir: Optional[str] = None):
        assert mode in ("min", "max")
        self.mode = mode
        self.ckpt_dir = ckpt_dir
        self.best = float("inf") if mode == "min" else float("-inf")
        self.best_params = None
        self.best_epoch = -1

    def update(self, metric: float, params, epoch: int, **save_kw) -> bool:
        better = (
            metric <= self.best if self.mode == "min" else metric >= self.best
        )
        if better:
            self.best = metric
            self.best_params = _to_host(params)
            self.best_epoch = epoch
            if self.ckpt_dir:
                save_checkpoint(self.ckpt_dir, params, step=epoch, **save_kw)
        return better
