"""Per-kernel contribution to the train-step time at the bench config.

Runs the whole-epoch program four ways by gating each Pallas kernel's
fits-check (encode mega-kernel / decoder kernel / both / neither) and
reports epoch-level steps/s — the only trustworthy granularity on this
host (see docs/performance.md). Use to target future kernel work.

Run on the TPU host: python scripts/kernel_contribution_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH, T, NB = 32, 20, 39


def measure(label):
    import jax
    import jax.numpy as jnp

    from factorized_tpu.config import best_acc_mosi_config
    from factorized_tpu.models import get_model
    from factorized_tpu.train import TrainProgram, make_optimizer

    cfg = best_acc_mosi_config()
    init, apply_fn = get_model("mfm")
    params = init(jax.random.PRNGKey(123), cfg)
    opt = make_optimizer("adam", 1e-3)
    opt_state = opt.init(params)
    program = TrainProgram(apply_fn, cfg, "joint", opt)
    rng = np.random.default_rng(0)
    Xb = jnp.asarray(rng.normal(size=(NB, T, BATCH, cfg.d_total)),
                     jnp.float32)
    yb = jnp.asarray(rng.normal(size=(NB, BATCH)), jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)
    params, opt_state, acc = program.epoch(params, opt_state, Xb, yb,
                                           jax.random.PRNGKey(2), lr)
    float(acc)
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
    print(f"{label}: best {dt*1e3:.1f} ms/epoch = {NB/dt:.1f} steps/s",
          file=sys.stderr)
    return NB / dt


def main():
    from factorized_tpu.utils.compilation_cache import enable

    enable()
    from factorized_tpu.ops import pallas_lstm, pallas_mfn

    true_enc = pallas_mfn.encode_fits
    true_dec = pallas_lstm.decoder_fits
    off = lambda *a, **k: False

    results = {}
    combos = [
        ("both_kernels", true_enc, true_dec),
        ("encode_only", true_enc, off),
        ("decoder_only", off, true_dec),
        ("neither_scan", off, off),
    ]
    for label, enc, dec in combos:
        pallas_mfn.encode_fits = enc
        pallas_lstm.decoder_fits = dec
        results[label] = measure(label)
    pallas_mfn.encode_fits = true_enc
    pallas_lstm.decoder_fits = true_dec
    print(json.dumps({k: round(v, 1) for k, v in results.items()}))


if __name__ == "__main__":
    main()
