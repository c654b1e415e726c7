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

    # chunked mode: 20 epochs per dispatch (the production loop shape,
    # trainers/multiseed chunk programs) — amortizes the per-epoch
    # tunnel round-trip exactly like bench.py's headline mode
    E = 20
    epoch_raw = program._pieces[0]

    def chunk(params, opt_state, keys, lrs):
        def body(carry, _):
            params, opt_state, keys = carry
            keys, eks = jax.vmap(jax.random.split, out_axes=1)(keys)
            params, opt_state, tr = epoch_raw(params, opt_state, Xb, yb,
                                              eks, lrs)
            return (params, opt_state, keys), tr

        (params, opt_state, keys), trs = jax.lax.scan(
            body, (params, opt_state, keys), None, length=E)
        return params, opt_state, trs

    cj = jax.jit(chunk, donate_argnums=(0, 1))
    t0 = time.perf_counter()
    params, opt_state, trs = cj(params, opt_state, keys, lrs)
    np.asarray(trs)
    log_c = time.perf_counter() - t0
    cbest = float("inf")
    for g in range(3):
        t0 = time.perf_counter()
        params, opt_state, trs = cj(params, opt_state,
                                    jax.vmap(lambda kk: jax.random.fold_in(
                                        kk, 100 + g))(keys), lrs)
        np.asarray(trs)
        cbest = min(cbest, (time.perf_counter() - t0) / E)
    csps = k * NB / cbest
    print(f"K={k} chunked: compile {log_c:.1f}s, {cbest * 1e3:.1f}ms/epoch"
          f" -> {csps:.0f} model-steps/s", file=sys.stderr)
    return sps, csps


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

    pairs = {k: measure(k, cfg, Xb, yb) for k in ks}
    sweep = {k: round(v[0], 1) for k, v in pairs.items()}
    chunked = {k: round(v[1], 1) for k, v in pairs.items()}
    best_k = max(chunked, key=chunked.get)
    print(json.dumps({"model_steps_per_sec_by_K": sweep,
                      "chunked_model_steps_per_sec_by_K": chunked,
                      "best_K": best_k,
                      "best_model_steps_per_sec": chunked[best_k]}))


if __name__ == "__main__":
    main()
