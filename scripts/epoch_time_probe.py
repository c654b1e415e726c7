"""Time the bench-config whole-epoch train program (best-of-groups).

Ground-truth epoch-level measurement for assembly/DUS experiments:
sub-ms micro probes through the tunnel are noise (CLAUDE.md r2/r3).

Run on the TPU host:  python scripts/epoch_time_probe.py [--epochs-per-group 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH, T, NB = 32, 20, 39


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs-per-group", type=int, default=5)
    ap.add_argument("--groups", type=int, default=4)
    args = ap.parse_args()

    from factorized_tpu.utils.compilation_cache import enable

    enable()
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
    Xb = jnp.asarray(rng.normal(size=(NB, T, BATCH, cfg.d_total)), jnp.float32)
    yb = jnp.asarray(rng.normal(size=(NB, BATCH)), jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)

    t0 = time.perf_counter()
    params, opt_state, acc = program.epoch(params, opt_state, Xb, yb,
                                           jax.random.PRNGKey(2), lr)
    float(acc)
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    E, G = args.epochs_per_group, args.groups
    groups = []
    for g in range(G):
        t0 = time.perf_counter()
        for i in range(E):
            params, opt_state, acc = program.epoch(
                params, opt_state, Xb, yb,
                jax.random.fold_in(jax.random.PRNGKey(3), E * g + i), lr)
        float(acc)
        groups.append((time.perf_counter() - t0) / E)
    ms = min(groups) * 1000
    print(f"epoch: {ms:.2f} ms  ({NB / min(groups):.0f} steps/s)  "
          f"groups_ms={[f'{g*1000:.1f}' for g in groups]}")


if __name__ == "__main__":
    main()
