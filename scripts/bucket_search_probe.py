"""Mixed-config bucket search vs same-config multiseed — throughput A/B.

VERDICT r2 item 4's acceptance probe: train K lanes at the pinned
best-acc shape where every lane carries DIFFERENT per-lane values
(dropout rates, loss weights, lr — the fields the random search
samples, ``mfm_mosi.py:1311-1344``) via the traced-hyperparameter
program (parallel/multiconfig.py), and compare model-steps/s against
the same-config multiseed program at the same K. Target: within ~20%.

Usage (TPU host): python scripts/bucket_search_probe.py [--k 32]
Prints one JSON line.

Measured 2026-08-17, one v5e chip, K=32, best-acc shape:
  multiseed  (same config x32): 510.7 ms/epoch = 2444 model-steps/s
  bucket (32 distinct configs): 508.2 ms/epoch = 2456 model-steps/s
  ratio 1.005 — traced per-lane hyperparameters are FREE at this size;
  search throughput no longer requires trials to share a config.
"""
from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from factorized_tpu.config import best_acc_mosi_config
from factorized_tpu.models import get_model
from factorized_tpu.parallel.multiconfig import ConfigBucketProgram, hp_matrix
from factorized_tpu.parallel.multiseed import MultiSeedProgram
from factorized_tpu.train import make_optimizer
from factorized_tpu.utils.compilation_cache import enable

enable()

NB = 39  # MOSI: 1248 shuffled train samples / batch 32
DROPS = [0.0, 0.2, 0.5, 0.7]
LDA_MMD = [10, 50, 100, 200]
LDA_X = [0.01, 0.1, 0.5, 1.0, 2.0, 5.0, 10.0]


def sampled_value_configs(k, rng):
    """K configs sharing the best-acc SHAPE but with search-sampled
    value fields — a worst-case mixed bucket."""
    cfgs = []
    for _ in range(k):
        cfgs.append(best_acc_mosi_config(
            zy_to_fy_dropout=rng.choice(DROPS),
            zl_to_fl_dropout=rng.choice(DROPS),
            za_to_fa_dropout=rng.choice(DROPS),
            zv_to_fv_dropout=rng.choice(DROPS),
            fy_to_y_dropout=rng.choice(DROPS),
            att1_drop=rng.choice(DROPS), att2_drop=rng.choice(DROPS),
            gamma1_drop=rng.choice(DROPS), gamma2_drop=rng.choice(DROPS),
            lda_mmd=float(rng.choice(LDA_MMD)),
            lda_xl=float(rng.choice(LDA_X)),
            lda_xa=float(rng.choice(LDA_X)),
            lda_xv=float(rng.choice(LDA_X)),
        ))
    return cfgs


def bench_epochs(run_epoch, warm_args, fold):
    """best-of-3-groups-of-5 epochs; run_epoch must block."""
    run_epoch(*warm_args(0))  # compile
    best = float("inf")
    for g in range(3):
        t0 = time.perf_counter()
        for i in range(5):
            run_epoch(*warm_args(fold(g * 5 + i + 1)))
        best = min(best, (time.perf_counter() - t0) / 5)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=32)
    args = ap.parse_args()
    k = args.k
    cfg = best_acc_mosi_config()
    init, apply_fn = get_model("mfm")
    rng = np.random.default_rng(0)
    Xb = jnp.asarray(rng.normal(size=(NB, cfg.seqlength, cfg.batchsize,
                                      cfg.d_total)), jnp.float32)
    yb = jnp.asarray(rng.normal(size=(NB, cfg.batchsize)), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(1), k)
    lrs = jnp.full((k,), 1e-3, jnp.float32)

    # --- same-config multiseed baseline ---
    opt = make_optimizer("adam", 1e-3)
    params = MultiSeedProgram.vinit(init, cfg, jax.random.PRNGKey(0), k)
    opt_state = jax.vmap(opt.init)(params)
    ms = MultiSeedProgram(apply_fn, cfg, opt)
    state = {"p": params, "o": opt_state}

    def ms_epoch(ks):
        state["p"], state["o"], acc = ms.epoch(state["p"], state["o"],
                                               Xb, yb, ks, lrs)
        np.asarray(acc)

    ms_dt = bench_epochs(
        ms_epoch, lambda i: (jax.vmap(
            lambda kk: jax.random.fold_in(kk, i))(keys),),
        lambda i: i)
    ms_sps = k * NB / ms_dt
    print(f"multiseed K={k}: {ms_dt*1e3:.1f} ms/epoch = "
          f"{ms_sps:.0f} model-steps/s", file=sys.stderr)

    # --- mixed-config bucket ---
    cfgs = sampled_value_configs(k, np.random.default_rng(7))
    hps = jnp.asarray(hp_matrix(cfgs, 1))
    opt2 = make_optimizer("adam", 1e-3)
    params2 = jax.vmap(lambda kk: init(kk, cfg))(
        jax.random.split(jax.random.PRNGKey(0), k))
    opt_state2 = jax.vmap(opt2.init)(params2)
    cb = ConfigBucketProgram(apply_fn, cfg, opt2)
    state2 = {"p": params2, "o": opt_state2}

    def cb_epoch(ks):
        state2["p"], state2["o"], acc = cb.epoch(state2["p"], state2["o"],
                                                 Xb, yb, ks, lrs, hps)
        np.asarray(acc)

    cb_dt = bench_epochs(
        cb_epoch, lambda i: (jax.vmap(
            lambda kk: jax.random.fold_in(kk, i))(keys),),
        lambda i: i)
    cb_sps = k * NB / cb_dt
    print(f"mixed-config bucket K={k}: {cb_dt*1e3:.1f} ms/epoch = "
          f"{cb_sps:.0f} model-steps/s", file=sys.stderr)

    print(json.dumps({
        "k": k,
        "multiseed_model_steps_per_s": round(ms_sps, 1),
        "bucket_model_steps_per_s": round(cb_sps, 1),
        "bucket_vs_multiseed": round(cb_sps / ms_sps, 4),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
