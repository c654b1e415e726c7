"""Epoch-level A/B: XLA-scan encode vs the Pallas encode (v2 streamed
backward) inside the REAL whole-epoch train program at the bench
config. This is the ground-truth measurement — the chained-loop micro
probes through the tunnel are noise-bound at sub-ms scales
(scripts/bwd_residual_probe.py history).

Run on the TPU host:  python scripts/encode_epoch_ab.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH, T, NB = 32, 20, 39


def build(cfg):
    import jax
    import jax.numpy as jnp

    from factorized_tpu.models import get_model
    from factorized_tpu.train import TrainProgram, make_optimizer

    init, apply_fn = get_model("mfm")
    params = init(jax.random.PRNGKey(123), cfg)
    opt = make_optimizer("adam", 1e-3)
    opt_state = opt.init(params)
    program = TrainProgram(apply_fn, cfg, "joint", opt)
    rng = np.random.default_rng(0)
    Xb = jnp.asarray(rng.normal(size=(NB, T, BATCH, cfg.d_total)),
                     jnp.float32)
    yb = jnp.asarray(rng.normal(size=(NB, BATCH)), jnp.float32)
    return program, params, opt_state, Xb, yb


def time_epochs(program, params, opt_state, Xb, yb, label):
    import jax
    import jax.numpy as jnp

    lr = jnp.asarray(1e-3, jnp.float32)
    t0 = time.perf_counter()
    params, opt_state, acc = program.epoch(params, opt_state, Xb, yb,
                                           jax.random.PRNGKey(2), lr)
    float(acc)
    print(f"{label}: compile+first {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    groups = []
    for g in range(4):
        t0 = time.perf_counter()
        for i in range(5):
            params, opt_state, acc = program.epoch(
                params, opt_state, Xb, yb,
                jax.random.fold_in(jax.random.PRNGKey(3), 5 * g + i), lr)
            float(acc)
        groups.append((time.perf_counter() - t0) / 5)
    dt = min(groups)
    print(f"{label}: groups {[f'{x*1e3:.1f}' for x in groups]} ms "
          f"-> best {dt*1e3:.1f} ms/epoch = {NB/dt:.1f} steps/s",
          file=sys.stderr)
    return NB / dt, float(acc)


def main():
    from factorized_tpu.utils.compilation_cache import enable

    enable()
    import factorized_tpu.ops.fused as fused
    from factorized_tpu.config import best_acc_mosi_config

    cfg = best_acc_mosi_config()
    results = {}

    fused.USE_PALLAS = False
    prog, params, opt_state, Xb, yb = build(cfg)
    results["scan_steps_per_sec"], acc_s = time_epochs(
        prog, params, opt_state, Xb, yb, "scan")

    fused.USE_PALLAS = None  # auto: pallas now that encode_fits passes
    prog, params, opt_state, Xb, yb = build(cfg)
    results["pallas_steps_per_sec"], acc_p = time_epochs(
        prog, params, opt_state, Xb, yb, "pallas")

    results["tracked_loss_scan"] = acc_s
    results["tracked_loss_pallas"] = acc_p
    print(json.dumps(results))


if __name__ == "__main__":
    main()
