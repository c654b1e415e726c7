"""Profile the bench-config epoch program and print its device op-class
anatomy (ms/epoch + calls/epoch per HLO op class).

This is the tool behind docs/performance.md's "Anatomy of the epoch"
table: it captures a jax.profiler trace around N steady-state epochs,
parses the ``*.trace.json.gz`` directly (the installed
tensorboard_plugin_profile mismatches TF), keeps only TPU device-track
events, and groups durations by op-class prefix (fusion kinds, Pallas
custom-calls, copies, dynamic-update-slice, ...).

Run on the TPU host:  python scripts/epoch_trace_anatomy.py [--epochs 3]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH, T, NB = 32, 20, 39


def classify(name):
    """Collapse an HLO op name to a class."""
    base = name.split(".")[0]
    base = re.sub(r"_?\d+$", "", base)
    return base


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--config", default="parity",
                    help="parity (bench MOSI config) or a candidate "
                         "name from scripts/scale_mfu_probe.py "
                         "(A_b256_h256 / B_b512_h512 / C_b1024_h1024)")
    ap.add_argument("--nb", type=int, default=None,
                    help="batches per epoch (default 39 parity, 4 scale)")
    ap.add_argument("--raw", action="store_true",
                    help="also print the top RAW event names (un-classed)"
                         " — for chasing container/unnamed events")
    args = ap.parse_args()

    from factorized_tpu.utils.compilation_cache import enable

    enable()
    import jax
    import jax.numpy as jnp

    from factorized_tpu.config import best_acc_mosi_config
    from factorized_tpu.models import get_model
    from factorized_tpu.train import TrainProgram, make_optimizer

    if args.config == "parity":
        cfg = best_acc_mosi_config()
        nb, batch = args.nb or NB, BATCH
    else:
        import scale_mfu_probe

        cfg = scale_mfu_probe.candidate_configs()[args.config]
        nb, batch = args.nb or 4, cfg.batchsize
    init, apply_fn = get_model("mfm")
    params = init(jax.random.PRNGKey(123), cfg)
    opt = make_optimizer("adam", 1e-3)
    opt_state = opt.init(params)
    program = TrainProgram(apply_fn, cfg, "joint", opt)
    rng = np.random.default_rng(0)
    Xb = jnp.asarray(rng.normal(
        size=(nb, T, batch, cfg.d_total)).astype(np.float32))
    yb = jnp.asarray(rng.normal(size=(nb, batch)).astype(np.float32))
    lr = jnp.asarray(1e-3, jnp.float32)

    # warm up (compile) outside the trace
    params, opt_state, acc = program.epoch(params, opt_state, Xb, yb,
                                           jax.random.PRNGKey(2), lr)
    float(acc)

    tmpdir = tempfile.mkdtemp(prefix="epoch_trace_")
    with jax.profiler.trace(tmpdir):
        for i in range(args.epochs):
            params, opt_state, acc = program.epoch(
                params, opt_state, Xb, yb,
                jax.random.fold_in(jax.random.PRNGKey(3), i), lr)
        float(acc)

    paths = glob.glob(os.path.join(
        tmpdir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        raise SystemExit(f"no trace written under {tmpdir}")
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)

    # device-track pids: process names like "/device:TPU:0" or "TPU:x"
    events = trace.get("traceEvents", [])
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n and "XLA" not in n}
    if not dev_pids:  # fall back: any pid whose name mentions TPU
        dev_pids = {p for p, n in pid_names.items() if "TPU" in n}

    by_class = collections.Counter()
    calls = collections.Counter()
    by_raw = collections.Counter()
    raw_calls = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        cls = classify(name)
        by_class[cls] += dur
        calls[cls] += 1
        by_raw[name] += dur
        raw_calls[name] += 1
        total += dur
    print(f"trace: {paths[0]}", file=sys.stderr)
    print(f"device pids: {sorted(dev_pids)} "
          f"({[pid_names[p] for p in sorted(dev_pids)]})", file=sys.stderr)
    E = args.epochs
    print(f"{'ms/epoch':>9} {'calls/epoch':>12}  class")
    for cls, ms in by_class.most_common(args.top):
        print(f"{ms / E:>9.3f} {calls[cls] // E:>12}  {cls}")
    print(f"{total / E:>9.3f} {sum(calls.values()) // E:>12}  TOTAL")
    if args.raw:
        print("\ntop raw event names:")
        for name, ms in by_raw.most_common(args.top):
            print(f"{ms / E:>9.3f} {raw_calls[name] // E:>12}  {name!r}")


if __name__ == "__main__":
    main()
