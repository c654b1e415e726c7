"""Evolving-search probe: rung chaining must run at bucket throughput
with no per-rung recompile and ~zero recycle overhead.

The search-efficiency win of ``--evolve`` is arithmetic — at cull_frac
c over R rungs a K-lane program explores K*(1 + c*(R-1)) trials in the
chip-time a plain bucket search spends on K — but it only materializes
if (a) rung 2..R reuse rung 1's compiled program (value swaps are
traced, ``parallel/multiconfig.py``), and (b) the host-side lane
recycling between rungs is negligible. This probe measures both on
MOSI-shaped synthetic data at the pinned best-acc shape.

Usage (TPU host): python scripts/evolve_probe.py [--k 16] [--rungs 3]
                  [--epochs 5]
Prints one JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from factorized_tpu.config import best_acc_mosi_config
from factorized_tpu.utils.compilation_cache import enable
from factorized_tpu.utils.logging import RunLogger

enable()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--rungs", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--cull-frac", type=float, default=0.5)
    args = ap.parse_args()

    import jax

    import factorized_tpu.parallel.multiconfig as mc

    cfg = best_acc_mosi_config().replace(num_epochs=args.epochs)
    rng = np.random.default_rng(0)
    d = cfg.d_total
    X_train = rng.normal(size=(1248, cfg.seqlength, d)).astype(np.float32)
    y_train = rng.normal(size=(1248,)).astype(np.float32)
    X_valid = rng.normal(size=(320, cfg.seqlength, d)).astype(np.float32)
    y_valid = rng.normal(size=(320,)).astype(np.float32)
    X_test = rng.normal(size=(686, cfg.seqlength, d)).astype(np.float32)
    y_test = rng.normal(size=(686,)).astype(np.float32)
    nb = X_train.shape[0] // cfg.batchsize

    # instrument rung boundaries: wall per train_config_bucket call and
    # the recycle cost between calls
    walls, recycle_s = [], []
    orig_bucket = mc.train_config_bucket
    orig_recycle = mc.recycle_lanes

    def timed_bucket(*a, **kw):
        t0 = time.perf_counter()
        out = orig_bucket(*a, **kw)
        walls.append(time.perf_counter() - t0)
        return out

    def timed_recycle(*a, **kw):
        t0 = time.perf_counter()
        out = orig_recycle(*a, **kw)
        recycle_s.append(time.perf_counter() - t0)
        return out

    mc.train_config_bucket = timed_bucket
    mc.recycle_lanes = timed_recycle
    try:
        res = mc.train_evolving_search(
            X_train, y_train, X_valid, y_valid, X_test, y_test, cfg,
            "mosi", n_configs=args.k, rungs=args.rungs,
            cull_frac=args.cull_frac, seeds_per_config=1, seed=0,
            logger=RunLogger(echo=False))
    finally:
        mc.train_config_bucket = orig_bucket
        mc.recycle_lanes = orig_recycle

    steady = min(walls[1:]) if len(walls) > 1 else walls[0]
    sps = args.k * nb * args.epochs / steady
    out = {
        "k": args.k, "rungs": args.rungs, "epochs_per_rung": args.epochs,
        "rung_walls_s": [round(w, 2) for w in walls],
        "steady_model_steps_per_s": round(sps, 1),
        # first entry includes the recycle programs' compile; the
        # steady-state cost is the tail
        "recycle_s": [round(float(r), 3) for r in recycle_s],
        "explored_configs": res["explored_configs"],
        "trials_per_bucket_cost": round(res["explored_configs"] / args.k, 2),
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
