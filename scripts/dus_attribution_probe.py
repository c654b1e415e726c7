"""Attribute the dynamic-update-slice op class in the epoch program.

docs/performance.md's trace anatomy shows 5.69 ms/epoch (4134 calls)
of `dynamic_update_slice` — the single biggest op class in the 16.5 ms
device epoch. The trace only gives the op CLASS; this probe compiles
the exact bench epoch program (TPU backend, production shapes) and
groups every dynamic-update-slice in the OPTIMIZED HLO by its
`metadata.op_name` (the jax source scope), so the writes can be
attributed to real code: scan carry stacking vs optimizer vs residual
buffers vs mask precompute.

Run on the TPU host:  python scripts/dus_attribution_probe.py
Optional:             --cpu (attribute the CPU lowering instead)
"""

from __future__ import annotations

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH, T, NB = 32, 20, 39


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--full", action="store_true",
                    help="dump every DUS line, not just the grouping")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from factorized_tpu.utils.compilation_cache import enable

    enable()

    import jax
    import jax.numpy as jnp
    import numpy as np

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

    lowered = jax.jit(program._raw[0]).lower(
        params, opt_state, Xb, yb, jax.random.PRNGKey(2), lr)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    print(f"optimized HLO: {len(hlo.splitlines())} lines", file=sys.stderr)

    # one optimized-HLO line per op; metadata carries the jax scope
    meta = re.compile(r'op_name="([^"]*)"')
    shape = re.compile(r"= (\S+) dynamic-update-slice")
    groups = collections.Counter()
    bytes_by_group = collections.Counter()

    def nbytes(s):
        m = re.match(r"(bf16|f16|f32|f64|s32|u32|s8|u8|pred)\[([0-9,]*)\]", s)
        if not m:
            return 0
        sz = {"f32": 4, "s32": 4, "u32": 4, "f64": 8, "bf16": 2, "f16": 2,
              "s8": 1, "u8": 1, "pred": 1}[m.group(1)]
        dims = [int(x) for x in m.group(2).split(",") if x]
        n = 1
        for d in dims:
            n *= d
        return n * sz

    n_total = 0
    for line in hlo.splitlines():
        # one line per op; fusion bodies appear as their own lines, so
        # this counts both standalone DUS and DUS inside fusions
        if "dynamic-update-slice(" not in line:
            continue
        n_total += 1
        m = meta.search(line)
        scope = m.group(1) if m else "<no-metadata>"
        # collapse uniquifying suffixes: keep the last 8 scope segments
        segs = scope.split("/")
        key = "/".join(segs[-8:])
        groups[key] += 1
        sm = shape.search(line)
        if sm:
            bytes_by_group[key] += nbytes(sm.group(1))
        if args.full:
            print(line.strip()[:400])

    print(f"\nTOTAL dynamic-update-slice ops in HLO: {n_total}")
    print(f"{'count':>6} {'KiB/write-set':>14}  scope (last 3 segments)")
    for key, c in groups.most_common(40):
        print(f"{c:>6} {bytes_by_group[key]/1024:>14.1f}  {key}")

    # where do the loops multiply these? count while-loops too
    n_while = len(re.findall(r"= \S+ while\(", hlo))
    print(f"\nwhile-loops in optimized HLO: {n_while}")


if __name__ == "__main__":
    main()
