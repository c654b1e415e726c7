"""Probe the two remaining single-model perf levers (VERDICT r1 item 9):

1. 128-aligned fused encode width: the best-acc fused carry is
   h_tot=320 (2.5 x 128 lanes). Does padding to 384 via a dummy-width
   cell make the sequential Pallas loop faster per step? Timed by
   running the REAL fused_mfm_encode fwd+grad at zv=80 (h_tot=320) vs
   zv=144 (h_tot=384) chained inside one XLA program.
2. Folding the zf MLPs + y-head into the decode Pallas kernel: upper
   bound = the isolated fwd+grad cost of those ops today (they cannot
   save more than they currently cost, and a fold adds kernel time).

Both chained loops subtract the empty fori_loop dispatch floor
(see assembly_cost_probe.py: raw micro-numbers through chained loops
are ~80% loop latency).

Measured 2026-08-16 on v5e (batch 32, t=20, train mode), best of 3
groups of 100 chained iters, floor-subtracted:
  empty-loop floor        0.306 ms/iter
  encode 320 fwd+grad     0.389 ms/iter
  encode 384 fwd+grad     0.408 ms/iter  (+5% — alignment padding LOSES)
  zf+yhead fwd+grad      -0.006 ms/iter  (below the noise floor)
CONCLUSION: both levers are dead. Mosaic already pads the 320-lane
carry internally — explicit dummy-width padding just adds real FLOPs
(+5%). The decode-fold upper bound (zf+yhead cost today) is not even
measurable above the dispatch floor, so folding it into the kernel
cannot win. The single-model floor remains the sequential-loop
latency; further perf effort belongs to the multiseed path
(155x/chip).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from factorized_tpu.config import best_acc_mosi_config
from factorized_tpu.models import get_model
from factorized_tpu.models.mfm import _zf_all
from factorized_tpu.models.common import yhead_apply
from factorized_tpu.ops.fused import fused_mfm_encode
from factorized_tpu.utils.compilation_cache import enable

enable()

ITERS = 100
GROUPS = 3


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    float(np.asarray(out).ravel()[0])  # honest materialization
    best = float("inf")
    for _ in range(GROUPS):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(out).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best * 1e3  # ms/iter


def chained(body):
    @jax.jit
    def run(x0):
        def step(i, acc):
            return acc + body(acc) * 1e-30
        return jax.lax.fori_loop(0, ITERS, step, x0)
    return run


def encode_probe(zv_size):
    cfg = best_acc_mosi_config(zv_size=zv_size)
    init, _ = get_model("mfm")
    params = init(jax.random.PRNGKey(0), cfg)
    enc = [params["enc"][f"encoder_{m}"]["lstm"] for m in "lav"]
    mfn = params["mfn_enc"]["mfn"]
    t, n = cfg.seqlength, cfg.batchsize
    d_l, d_a, d_v = cfg.input_dims
    rng = np.random.default_rng(0)
    x_l = jnp.asarray(rng.normal(size=(t, n, d_l)), jnp.float32)
    x_a = jnp.asarray(rng.normal(size=(t, n, d_a)), jnp.float32)
    x_v = jnp.asarray(rng.normal(size=(t, n, d_v)), jnp.float32)
    drops = (cfg.att1_drop, cfg.att2_drop, cfg.gamma1_drop, cfg.gamma2_drop)
    key = jax.random.PRNGKey(1)

    def loss(bump):
        xl = x_l + bump
        enc_hs, mfn_last = fused_mfm_encode(
            enc, mfn, xl, x_a, x_v, mem_dim=cfg.memsize, drops=drops,
            key=key, train=True)
        return sum(h.sum() for h in enc_hs) + mfn_last.sum()

    g = jax.grad(loss)
    h_tot = sum(c["wh"].shape[0] for c in enc) + sum(
        mfn[f"lstm_{m}"]["wh"].shape[0] for m in "lav")
    return h_tot, timeit(chained(lambda acc: g(acc)), jnp.float32(0))


def zf_yhead_probe():
    cfg = best_acc_mosi_config()
    init, _ = get_model("mfm")
    params = init(jax.random.PRNGKey(0), cfg)
    n = cfg.batchsize
    rng = np.random.default_rng(1)
    zy = jnp.asarray(rng.normal(size=(n, cfg.zy_size)), jnp.float32)
    zl = jnp.asarray(rng.normal(size=(n, cfg.zl_size)), jnp.float32)
    za = jnp.asarray(rng.normal(size=(n, cfg.za_size)), jnp.float32)
    zv = jnp.asarray(rng.normal(size=(n, cfg.zv_size)), jnp.float32)
    key = jax.random.PRNGKey(2)

    def loss(bump):
        fy, fl, fa, fv = _zf_all(params, zy + bump, zl, za, zv, cfg, key,
                                 True)
        y = yhead_apply(params["fy_to_y"], fy, cfg.fy_to_y_dropout, key,
                        True)
        return fy.sum() + fl.sum() + fa.sum() + fv.sum() + y.sum()

    g = jax.grad(loss)
    return timeit(chained(lambda acc: g(acc)), jnp.float32(0))


def main():
    floor = timeit(chained(lambda acc: acc * 1.0000001), jnp.float32(1))
    print(f"empty-loop floor: {floor:.3f} ms/iter", file=sys.stderr)
    h0, t320 = encode_probe(zv_size=80)
    h1, t384 = encode_probe(zv_size=144)
    tzf = zf_yhead_probe()
    print(f"encode h_tot={h0}: {t320:.3f} ms raw, "
          f"{t320 - floor:.3f} floor-subtracted", file=sys.stderr)
    print(f"encode h_tot={h1}: {t384:.3f} ms raw, "
          f"{t384 - floor:.3f} floor-subtracted", file=sys.stderr)
    print(f"zf+yhead: {tzf:.3f} ms raw, {tzf - floor:.3f} "
          "floor-subtracted", file=sys.stderr)
    import json
    print(json.dumps({
        "floor_ms": round(floor, 4),
        "encode_320_ms": round(t320 - floor, 4),
        "encode_384_ms": round(t384 - floor, 4),
        "zf_yhead_ms": round(tzf - floor, 4),
    }))


if __name__ == "__main__":
    main()
