"""True multi-process distributed execution (multi-host-style).

The reference is strictly single-GPU (SURVEY.md §2: "Parallelism:
none"); this module implements the blueprint's §5.8 north-star — a
GLOBAL device mesh spanning OS processes via
``jax.distributed.initialize`` — and proves the production DP training
path is multi-process-correct end-to-end, not just mock-tested:

- Each process owns ``local_devices`` devices (on CPU:
  ``--xla_force_host_platform_device_count``; on real hardware: its
  local TPU chips). ``jax.devices()`` spans all processes.
- The training code is UNCHANGED: ``DataParallel.epoch_batches`` /
  ``.params`` already place arrays with ``NamedSharding`` over the
  global mesh — under multi-process, ``jax.device_put`` transfers only
  each process's addressable shards, and the jitted epoch's gradient
  ``psum`` rides the cross-process collective transport (Gloo on CPU,
  ICI/DCN on TPU pods). That "nothing changes" is the point of the
  global-mesh design (docs/scaling.md "Multi-host").
- :func:`verify_multiprocess` is the self-contained integration gate:
  it launches N worker processes plus ONE single-process reference
  (same payload, same global device count), and asserts every worker's
  trained parameters agree with the reference to float32
  reduction-order tolerance. Used by the slow test
  (tests/test_multiprocess.py) and by ``__graft_entry__.
  dryrun_multichip`` so the driver artifact records a real
  multi-process run.

Worker entry (what ``launch`` spawns)::

    python -m factorized_tpu.parallel.multiprocess \
        --process-id 0 --num-processes 2 --local-devices 4 \
        --coordinator localhost:PORT --out /tmp/w0.npz [--epochs 2]

``--num-processes 1`` skips ``jax.distributed`` entirely and serves as
the single-process reference run.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
from typing import Optional

_REPO_ROOT = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))


# --------------------------------------------------------------------
# payload: a small but real DP training run (same family of shapes as
# tests/test_sharding.py so failures triangulate against the
# single-process suite)
# --------------------------------------------------------------------

def demo_config():
    """Tiny MFM config for the integration payload. Small on purpose:
    the gate validates cross-process placement + collectives + program
    identity, not model capacity; CPU compile time dominates wall."""
    from factorized_tpu.config import MFMConfig

    return MFMConfig(
        input_dims=[8, 4, 5], h_dims=[6, 5, 4], memsize=6,
        zy_size=5, zl_size=6, za_size=4, zv_size=5,
        fy_size=4, fl_size=5, fa_size=4, fv_size=3,
        att1_shape=8, att2_shape=8, gamma1_shape=8, gamma2_shape=8,
        seqlength=5, batchsize=16,
    )


def _host_leaf(leaf):
    """Materialize one (replicated) global-array leaf on the host.

    ``np.asarray`` on a non-fully-addressable array is only legal when
    fully replicated; going through the first addressable shard works
    for every placement this payload produces."""
    import numpy as np

    if hasattr(leaf, "addressable_shards"):
        return np.asarray(leaf.addressable_shards[0].data)
    return np.asarray(leaf)


def run_payload(epochs: int = 2, seed: int = 0):
    """Run the DP payload on a global mesh over ALL visible devices.

    Deterministic in (epochs, seed) regardless of process topology:
    every process builds the same host data (same rng), placement
    shards it over the same global mesh, and the epoch program is the
    same XLA program. Returns ``(flat_params, accs)`` — the trained
    parameters flattened to one host vector and the per-epoch mean
    tracked losses."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from factorized_tpu.models import get_model
    from factorized_tpu.parallel import DataParallel, make_mesh
    from factorized_tpu.train import TrainProgram, make_optimizer

    cfg = demo_config()
    mesh = make_mesh()
    dp = DataParallel(mesh)
    init, apply_fn = get_model("mfm")
    params = dp.params(init(jax.random.PRNGKey(seed), cfg))
    opt = make_optimizer("adam")
    opt_state = dp.params(opt.init(params))
    program = TrainProgram(apply_fn, cfg, "joint", opt)

    rng = np.random.default_rng(seed)
    Xb = rng.normal(size=(3, cfg.seqlength, cfg.batchsize,
                          cfg.d_total)).astype(np.float32)
    yb = rng.normal(size=(3, cfg.batchsize)).astype(np.float32)
    Xs, ys = dp.epoch_batches(Xb, yb)

    lr = jnp.asarray(1e-3, jnp.float32)
    accs = []
    with mesh:
        for e in range(epochs):
            params, opt_state, acc = program.epoch(
                params, opt_state, Xs, ys,
                jax.random.fold_in(jax.random.PRNGKey(seed + 1), e), lr)
            accs.append(float(acc))
    flat = np.concatenate([_host_leaf(l).ravel()
                           for l in jax.tree.leaves(params)])
    return flat, accs


# --------------------------------------------------------------------
# worker entry
# --------------------------------------------------------------------

def worker_main(argv=None) -> None:
    """Subprocess entry: bootstrap the backend, join the distributed
    runtime (unless num_processes == 1), run the payload, write results.

    The platform override MUST be programmatic (the axon TPU plugin
    preloads at interpreter start and beats JAX_PLATFORMS — see
    tests/conftest.py); XLA_FLAGS is read lazily so the env var set by
    the launcher is honored."""
    import argparse

    ap = argparse.ArgumentParser(prog="factorized_tpu.parallel.multiprocess")
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--local-devices", type=int, required=True)
    ap.add_argument("--coordinator", default=None,
                    help="host:port (required when --num-processes > 1)")
    ap.add_argument("--out", required=True, help="npz result path")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args(argv)

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count="
            f"{args.local_devices}").strip()

    import jax

    jax.config.update("jax_platforms", args.platform)

    from factorized_tpu.parallel.sharding import init_distributed

    if args.num_processes > 1:
        if not args.coordinator:
            ap.error("--coordinator is required for --num-processes > 1")
        init_distributed(coordinator_address=args.coordinator,
                         num_processes=args.num_processes,
                         process_id=args.process_id)
    n_global = args.num_processes * args.local_devices
    assert len(jax.devices()) == n_global, (
        f"process {args.process_id}: global device count "
        f"{len(jax.devices())} != {n_global}")
    assert jax.local_device_count() == args.local_devices
    assert jax.process_index() == args.process_id

    flat, accs = run_payload(epochs=args.epochs)

    import numpy as np

    np.savez(args.out, flat=flat, accs=np.asarray(accs, np.float64),
             process_id=args.process_id, num_processes=args.num_processes,
             local_devices=args.local_devices)
    print(f"[mp worker {args.process_id}/{args.num_processes}] OK "
          f"devices={n_global} accs={[round(a, 6) for a in accs]}",
          flush=True)


# --------------------------------------------------------------------
# launcher + verifier (host side; safe to call from any process — all
# jax work happens in fresh subprocesses)
# --------------------------------------------------------------------

def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn(args_list, env, timeout):
    procs = [subprocess.Popen(
        [sys.executable, "-m", "factorized_tpu.parallel.multiprocess",
         *map(str, a)], cwd=_REPO_ROOT, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for a in args_list]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append((p.returncode, out))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return outs


def launch(n_processes: int = 2, local_devices: int = 4,
           epochs: int = 2, out_dir: Optional[str] = None,
           timeout: float = 900.0):
    """Spawn ``n_processes`` workers forming one global mesh of
    ``n_processes * local_devices`` CPU devices; return their results.

    Raises on any worker failure (with its captured output) — loud by
    convention."""
    import tempfile

    import numpy as np

    out_dir = out_dir or tempfile.mkdtemp(prefix="factorized_mp_")
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)       # workers size their own device count
    env["JAX_PLATFORMS"] = "cpu"     # belt; workers also force it in-code
    paths = [os.path.join(out_dir, f"worker{i}.npz")
             for i in range(n_processes)]
    args_list = [["--process-id", i, "--num-processes", n_processes,
                  "--local-devices", local_devices,
                  "--coordinator", f"localhost:{port}",
                  "--out", paths[i], "--epochs", epochs]
                 for i in range(n_processes)]
    outs = _spawn(args_list, env, timeout)
    for i, (rc, out) in enumerate(outs):
        if rc != 0:
            raise RuntimeError(
                f"multiprocess worker {i}/{n_processes} failed "
                f"(rc={rc}):\n{out[-6000:]}")
    return [dict(np.load(p)) for p in paths]


def verify_multiprocess(n_processes: int = 2, local_devices: int = 4,
                        epochs: int = 2, timeout: float = 900.0,
                        atol: float = 1e-5) -> dict:
    """The end-to-end multi-process gate (VERDICT r3 item 1).

    1. ``n_processes`` workers × ``local_devices`` devices train the DP
       payload over ONE global mesh (cross-process Gloo collectives).
    2. A single-process reference run with the SAME global device count
       trains the identical payload.
    3. Every worker's trained parameters and per-epoch losses must
       match the reference to ``atol`` (float32 reduction-order noise;
       measured 3e-8 on this payload).

    Returns a small report dict for artifacts/logging."""
    import tempfile

    import numpy as np

    out_dir = tempfile.mkdtemp(prefix="factorized_mp_")
    results = launch(n_processes, local_devices, epochs, out_dir, timeout)

    ref_path = os.path.join(out_dir, "single.npz")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    (rc, out), = _spawn([["--process-id", 0, "--num-processes", 1,
                          "--local-devices", n_processes * local_devices,
                          "--out", ref_path, "--epochs", epochs]],
                        env, timeout)
    if rc != 0:
        raise RuntimeError(
            f"single-process reference run failed (rc={rc}):\n{out[-6000:]}")
    ref = dict(np.load(ref_path))

    max_diff = 0.0
    for r in results:
        max_diff = max(max_diff, float(np.abs(r["flat"] - ref["flat"]).max()),
                       float(np.abs(r["accs"] - ref["accs"]).max()))
    if not (max_diff < atol):
        raise AssertionError(
            f"multi-process params/losses diverged from single-process: "
            f"max abs diff {max_diff:.3e} >= atol {atol:.1e}")
    return {
        "n_processes": n_processes,
        "local_devices": local_devices,
        "global_devices": n_processes * local_devices,
        "epochs": epochs,
        "max_abs_diff_vs_single_process": max_diff,
        "accs": [round(float(a), 6) for a in ref["accs"]],
        "ok": True,
    }


if __name__ == "__main__":
    worker_main()
