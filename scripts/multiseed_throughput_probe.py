"""Throughput vs seed count for the vmapped multiseed trainer — the
production workload (the reference's endless random search,
``mfm_mosi.py:1302-1369``, here K seeds per drawn config).

For each K, compiles the K-seed whole-epoch program at the pinned
best-acc config and measures sustained model-steps/s (K x train steps
per wall second), best of 3 groups of 5 epochs. Prints one JSON line
with the sweep and the best K.

Usage: python scripts/multiseed_throughput_probe.py [--ks 8,16,32,64]

Measured 2026-08-16 on one v5e chip (best-acc config, batch 32, t=20),
with the v2 STREAMED Pallas encode active under vmap (the v1 kernel
fell back to the XLA scan here, and its grid=1 fwd OOM'd VMEM at K>=16
once vmap double-buffered the per-seed blocks):
  K=8  -> 2252 model-steps/s   (was 2018 on the scan path)
  K=16 -> 2358 model-steps/s   (was 1919)
  K=32 -> 2478 model-steps/s   (was 1655)  <- new sweet spot, 287x/chip
  K=64 -> 2320 model-steps/s   (was 1387)
The default n_seeds stays 8 (per-config wall time matters for search
interactivity); pass --seeds 32 for maximum chip utilization.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from factorized_tpu.config import best_acc_mosi_config
from factorized_tpu.models import get_model
from factorized_tpu.parallel.multiseed import MultiSeedProgram
from factorized_tpu.train import make_optimizer
from factorized_tpu.utils.compilation_cache import enable

enable()

NB = 39  # MOSI: 1248 shuffled train samples / batch 32


def measure(k, cfg, Xb, yb):
    init, apply_fn = get_model("mfm")
    opt = make_optimizer("adam", 1e-3)
    params = MultiSeedProgram.vinit(init, cfg, jax.random.PRNGKey(0), k)
    opt_state = jax.vmap(opt.init)(params)
    program = MultiSeedProgram(apply_fn, cfg, opt)
    keys = jax.random.split(jax.random.PRNGKey(1), k)
    lrs = jnp.full((k,), 1e-3, jnp.float32)

    t0 = time.perf_counter()
    params, opt_state, acc = program.epoch(params, opt_state, Xb, yb,
                                           keys, lrs)
    np.asarray(acc)
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for g in range(3):
        t0 = time.perf_counter()
        for i in range(5):
            params, opt_state, acc = program.epoch(
                params, opt_state, Xb, yb,
                jax.vmap(lambda kk: jax.random.fold_in(kk, g * 5 + i))(keys),
                lrs)
            np.asarray(acc)
        best = min(best, (time.perf_counter() - t0) / 5)
    sps = k * NB / best
    print(f"K={k}: compile {compile_s:.1f}s, best epoch {best * 1e3:.1f}ms"
          f" -> {sps:.0f} model-steps/s", file=sys.stderr)
    return sps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", default="8,16,32,64")
    args = ap.parse_args()
    ks = [int(x) for x in args.ks.split(",")]

    cfg = best_acc_mosi_config()
    t, B, d = cfg.seqlength, cfg.batchsize, cfg.d_total
    rng = np.random.default_rng(0)
    Xb = jnp.asarray(rng.normal(size=(NB, t, B, d)), jnp.float32)
    yb = jnp.asarray(rng.normal(size=(NB, B)), jnp.float32)

    sweep = {k: round(measure(k, cfg, Xb, yb), 1) for k in ks}
    best_k = max(sweep, key=sweep.get)
    print(json.dumps({"model_steps_per_sec_by_K": sweep,
                      "best_K": best_k,
                      "best_model_steps_per_sec": sweep[best_k]}))


if __name__ == "__main__":
    main()
