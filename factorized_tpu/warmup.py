"""``python -m factorized_tpu warmup`` — the cold-start story.

TPU compiles of the production programs cost minutes through the
bench host's tunnel (r4 measured 579s for the dispatched-epoch program
process-cold after a kernel change). The persistent compile cache
(utils/compilation_cache.py) makes every LATER process start fast — but
only for programs something already compiled. This command compiles
the full production set once so every subsequent process-cold run
(bench.py, the CLI trainers, serving) starts in seconds:

1. bench epoch program (dispatched mode) — factorized_tpu/benchprog.py
2. bench 20-epoch chunk program (the bench headline)
3. bench compute-bound scale chunk program (benchprog.scale_cfg)
4. the single-model chunked trainer loop at the MOSI shapes
   (train._compile_chunked_loop via trainers.train_mfm, one
   DEFAULT_EPOCH_CHUNK program + eval/predict programs)
5. the K=8 multiseed chunk program (the search workload)
6. serving forwards for the released checkpoints (best/mfn_mae,
   best/mfn_acc at the default serving batch)

Programs are built by the SAME builders the production paths use, so
the cache keys match exactly. Prints one compile+first-call timing row
per program (the cold/warm matrix in docs/performance.md §Cold-start
comes from running this twice).
"""

from __future__ import annotations

import os
import time


def _leg(name, fn, results):
    t0 = time.perf_counter()
    err = ""
    try:
        fn()
    except Exception as e:  # keep warming the rest; report at the end
        err = f"{type(e).__name__}: {e}"
    dt = time.perf_counter() - t0
    results.append((name, dt, err))
    status = "FAILED " + err if err else "ok"
    print(f"warmup {name:<28s} {dt:8.2f}s  {status}", flush=True)


def run_warmup(args):
    from factorized_tpu.utils.compilation_cache import enable

    enable()
    import jax
    import jax.numpy as jnp

    from factorized_tpu.benchprog import (build_cfg, build_train_state,
                                          epoch_inputs, make_chunk)

    results = []
    cfg = build_cfg()
    program, params, opt_state = build_train_state(cfg)
    Xb, yb = epoch_inputs(cfg)
    lr = jnp.asarray(1e-3, jnp.float32)

    def bench_epoch():
        p, o, acc = program.epoch(params, opt_state, Xb, yb,
                                  jax.random.PRNGKey(2), lr)
        float(acc)

    _leg("bench_epoch_dispatched", bench_epoch, results)

    def bench_chunk():
        # fresh state: the epoch leg donated nothing (params/opt_state
        # here are the originals — epoch's donation consumed copies the
        # jit made from the same buffers), but rebuild to be safe
        _, p, o = build_train_state(cfg)
        cj = jax.jit(make_chunk(program), donate_argnums=(0, 1))
        p, o, trs = cj(p, o, Xb, yb, jax.random.PRNGKey(5), lr)
        float(trs[-1])

    _leg("bench_chunk_e20", bench_chunk, results)

    def bench_scale():
        from factorized_tpu.benchprog import (SCALE_E, SCALE_NB,
                                              scale_cfg)

        scfg = scale_cfg()
        sprog, sp, so = build_train_state(scfg)
        t, B, d = scfg.seqlength, scfg.batchsize, scfg.d_total
        gen = jax.jit(lambda k: (
            jax.random.normal(jax.random.fold_in(k, 0),
                              (SCALE_NB, t, B, d), jnp.float32),
            jax.random.normal(jax.random.fold_in(k, 1), (SCALE_NB, B),
                              jnp.float32)))
        sX, sy = gen(jax.random.PRNGKey(7))
        scj = jax.jit(make_chunk(sprog, e=SCALE_E), donate_argnums=(0, 1))
        sp, so, strs = scj(sp, so, sX, sy, jax.random.PRNGKey(5), lr)
        float(strs[-1])

    _leg("bench_scale_chunk", bench_scale, results)

    def trainer_loop():
        from factorized_tpu import trainers
        from factorized_tpu.cli import load_dataset
        from factorized_tpu.train import DEFAULT_EPOCH_CHUNK
        from factorized_tpu.utils.logging import RunLogger

        data = load_dataset("mosi", cfg.seqlength, None)
        tcfg = cfg.replace(num_epochs=DEFAULT_EPOCH_CHUNK)
        trainers.train_mfm(*data, tcfg, logger=RunLogger(echo=False),
                           lr=1e-3)

    _leg("trainer_chunked_loop_mosi", trainer_loop, results)

    def multiseed_chunk():
        from factorized_tpu.cli import load_dataset
        from factorized_tpu.parallel.multiseed import train_mfm_multiseed
        from factorized_tpu.train import DEFAULT_EPOCH_CHUNK
        from factorized_tpu.utils.logging import RunLogger

        data = load_dataset("mosi", cfg.seqlength, None)
        tcfg = cfg.replace(num_epochs=DEFAULT_EPOCH_CHUNK)
        train_mfm_multiseed(*data, tcfg, n_seeds=8,
                            logger=RunLogger(echo=False), lr=1e-3)

    _leg("multiseed_chunk_k8", multiseed_chunk, results)

    import numpy as np

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in ("mfn_mae", "mfn_acc"):
        ckpt = os.path.join(repo, "best", name)
        if not os.path.isdir(ckpt):
            print(f"warmup serve_{name}: checkpoint missing, skipped")
            continue

        def serve_leg(ckpt=ckpt):
            from factorized_tpu.serve import Predictor

            p = Predictor.from_checkpoint(ckpt)
            X = np.zeros((p.batch_size, p.cfg.seqlength,
                          sum(p.cfg.input_dims)), np.float32)
            p.predict(X)

        _leg(f"serve_{name}", serve_leg, results)

    total = sum(dt for _, dt, _ in results)
    failed = [n for n, _, e in results if e]
    print(f"warmup total {total:.1f}s — compile cache at "
          f"{jax.config.jax_compilation_cache_dir}"
          + (f"; FAILED: {failed}" if failed else ""))
    return 1 if failed else 0
