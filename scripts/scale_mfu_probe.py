"""Find a COMPUTE-BOUND bench configuration and measure its MFU.

The parity config (batch 32, h=[88,64,48]) is latency-bound by design
(CLAUDE.md: compute is ~2% of MXU speed-of-light there). This probe
scales batch/hidden dims MOSEI-ward until the epoch program is
MXU-dominated, reporting for each candidate:

- steps/s (epoch-chunk program, the production path)
- ANALYTIC model FLOPs/step (utils/flops.py — XLA's cost_analysis
  undercounts scan programs ~100x) -> achieved FLOP/s -> MFU vs the
  v5e bf16 peak (197 TFLOP/s); plus executed-GEMM FLOPs when the
  block-diag fused path runs (--modular A/Bs the unfused path)
- which encode/decoder path is ACTIVE (encode_fits/decoder_fits at the
  config, train mode) — per the CLAUDE.md rule: never attribute perf
  to a kernel without attesting it actually ran.

Run on the TPU host:  python scripts/scale_mfu_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

V5E_BF16_PEAK = 197e12
# NOTE: an earlier "f32 peak = bf16/4" estimate was DISPROVEN by these
# probes (executed-GEMM rates exceeded it): JAX's default TPU matmul
# precision multiplies in bf16 with f32 accumulation, so bf16 peak is
# the speed-of-light for f32-operand programs too.


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def candidate_configs():
    from factorized_tpu.config import best_acc_mosi_config

    # MOSEI-like input dims (glove 300 / covarep 74 / facet 35); value
    # fields (dropouts, lambdas) stay at the best-acc settings
    base = dict(input_dims=[300, 74, 35])
    cands = {
        "A_b256_h256": dict(base, batchsize=256, h_dims=[128, 64, 64],
                            zy_size=128, zl_size=128, za_size=64,
                            zv_size=64, fy_size=128, fl_size=128,
                            fa_size=64, fv_size=64, memsize=128,
                            att1_shape=256, att2_shape=256,
                            gamma1_shape=256, gamma2_shape=256),
        "B_b512_h512": dict(base, batchsize=512, h_dims=[256, 128, 128],
                            zy_size=256, zl_size=256, za_size=128,
                            zv_size=128, fy_size=256, fl_size=256,
                            fa_size=128, fv_size=128, memsize=256,
                            att1_shape=512, att2_shape=512,
                            gamma1_shape=512, gamma2_shape=512),
        "C_b1024_h1024": dict(base, batchsize=1024,
                              h_dims=[512, 256, 256], zy_size=512,
                              zl_size=512, za_size=256, zv_size=256,
                              fy_size=512, fl_size=512, fa_size=256,
                              fv_size=256, memsize=512, att1_shape=1024,
                              att2_shape=1024, gamma1_shape=1024,
                              gamma2_shape=1024),
        # D: launch overhead amortized by batch, intensity raised by h,
        # dropout 0 (no mask PRNG/traffic — the big-data regime choice)
        "D_b2048_h1024_nodrop": dict(
            base, batchsize=2048, h_dims=[512, 256, 256], zy_size=512,
            zl_size=512, za_size=256, zv_size=256, fy_size=512,
            fl_size=512, fa_size=256, fv_size=256, memsize=512,
            att1_shape=1024, att2_shape=1024, gamma1_shape=1024,
            gamma2_shape=1024, **_no_drop()),
        "E_b4096_h1024_nodrop": dict(
            base, batchsize=4096, h_dims=[512, 256, 256], zy_size=512,
            zl_size=512, za_size=256, zv_size=256, fy_size=512,
            fl_size=512, fa_size=256, fv_size=256, memsize=512,
            att1_shape=1024, att2_shape=1024, gamma1_shape=1024,
            gamma2_shape=1024, **_no_drop()),
    }
    return {k: best_acc_mosi_config(**v) for k, v in cands.items()}


def _no_drop():
    return dict(zy_to_fy_dropout=0.0, zl_to_fl_dropout=0.0,
                za_to_fa_dropout=0.0, zv_to_fv_dropout=0.0,
                fy_to_y_dropout=0.0, att1_drop=0.0, att2_drop=0.0,
                gamma1_drop=0.0, gamma2_drop=0.0, out_drop=0.0)


def active_paths(cfg):
    """Which compute path runs in TRAIN mode at this config (the
    mega-kernel gates on a VMEM-fit ledger; attest, don't assume).
    Single source of truth: benchprog.active_paths mirrors the
    production gate in ops/fused.py (incl. mask_words=0 when all four
    att/gamma dropout rates are zero)."""
    from factorized_tpu.benchprog import active_paths as _ap

    return _ap(cfg)


def measure(name, cfg, NB=4, E=3, groups=3, fused=True):
    import jax
    import jax.numpy as jnp

    from factorized_tpu.models import get_model, mfm
    from factorized_tpu.train import TrainProgram, make_optimizer
    from factorized_tpu.utils.flops import model_train_flops_per_step

    mfm.FUSED = fused
    t, B, d = cfg.seqlength, cfg.batchsize, cfg.d_total
    log(f"--- {name}{'' if fused else ' MODULAR'}: t={t} B={B} d={d} "
        f"h={cfg.h_dims} mem={cfg.memsize}")
    init, apply_fn = get_model("mfm")
    params = init(jax.random.PRNGKey(0), cfg)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    opt = make_optimizer("adam", 1e-3)
    opt_state = opt.init(params)
    program = TrainProgram(apply_fn, cfg, "joint", opt)
    epoch_raw = program._raw[0]

    def chunk(params, opt_state, Xb, yb, key, lr):
        def body(carry, _):
            params, opt_state, key = carry
            key, ek = jax.random.split(key)
            params, opt_state, tr = epoch_raw(params, opt_state, Xb, yb,
                                              ek, lr)
            return (params, opt_state, key), tr

        (params, opt_state, key), trs = jax.lax.scan(
            body, (params, opt_state, key), None, length=E)
        return params, opt_state, trs

    # data generated ON DEVICE: a (NB,t,B,d) f32 batch at C-scale is
    # ~0.5GB — generating beats pushing it through the tunnel
    gen = jax.jit(lambda k: (
        jax.random.normal(jax.random.fold_in(k, 0), (NB, t, B, d),
                          jnp.float32),
        jax.random.normal(jax.random.fold_in(k, 1), (NB, B),
                          jnp.float32)))
    Xb, yb = gen(jax.random.PRNGKey(7))
    jax.block_until_ready(Xb)
    lr = jnp.float32(1e-3)

    cj = jax.jit(chunk, donate_argnums=(0, 1))
    t0 = time.perf_counter()
    lowered = cj.lower(params, opt_state, Xb, yb, jax.random.PRNGKey(5),
                       lr)
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t0
    # analytic FLOPs (utils/flops.py) — XLA's cost_analysis does NOT
    # multiply while-body flops by trip count (measured: same "flops"
    # at different NB*E), so it undercounts scan programs ~100x here
    model_fps = model_train_flops_per_step(cfg)
    exec_fps = (model_train_flops_per_step(cfg, fused=True) if fused
                else model_fps)
    t0 = time.perf_counter()
    params, opt_state, trs = compiled(params, opt_state, Xb, yb,
                                      jax.random.PRNGKey(5), lr)
    float(trs[-1])
    first_s = time.perf_counter() - t0
    log(f"  compile {compile_s:.1f}s first {first_s:.1f}s "
        f"params {n_params/1e6:.2f}M model flops/step {model_fps:.3e} "
        f"executed {exec_fps:.3e}")
    best = np.inf
    for g in range(groups):
        t0 = time.perf_counter()
        params, opt_state, trs = compiled(
            params, opt_state, Xb, yb,
            jax.random.fold_in(jax.random.PRNGKey(6), g), lr)
        float(trs[-1])
        best = min(best, time.perf_counter() - t0)
    steps = NB * E
    sps = steps / best
    achieved = model_fps * sps
    res = {
        "name": name, "batch": B, "fused": fused,
        "steps_per_sec": round(sps, 2),
        "model_flops_per_step": model_fps,
        "executed_gemm_flops_per_step": exec_fps,
        "achieved_model_flops_per_sec": achieved,
        "executed_flops_per_sec": exec_fps * sps,
        "mfu_bf16": round(achieved / V5E_BF16_PEAK, 4),
        
        "samples_per_sec": round(sps * B, 1),
        "params_m": round(n_params / 1e6, 2),
        "paths": active_paths(cfg),
        "compile_s": round(compile_s, 1),
    }
    log(f"  {json.dumps(res)}")
    return res


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="comma-separated candidate names")
    ap.add_argument("--nb", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--modular", action="store_true",
                    help="run the MODULAR (unfused) model path — at "
                         "scale the block-diag fusion executes ~2.2x "
                         "the model FLOPs (utils/flops.py)")
    args = ap.parse_args()
    from factorized_tpu.utils.compilation_cache import enable

    enable()
    import jax

    log(f"device: {jax.devices()[0].device_kind}")
    cands = candidate_configs()
    if args.only:
        names = args.only.split(",")
        cands = {k: cands[k] for k in names}
    out = [measure(k, cfg, NB=args.nb, E=args.epochs,
                   fused=not args.modular)
           for k, cfg in cands.items()]
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
