"""Probe: two reverse timesteps per grid iteration in the encode
backward kernel.

The streamed kernels pay per-grid-iteration bookkeeping (semaphore
waits, DMA issue) on top of the step math. If that overhead is a
meaningful slice of the ~22us/iteration, halving the iteration count
by processing steps (i, i-1) per iteration — with doubled per-step
input refs and the same total bytes — should show up at the epoch
level. Same math, same stored residuals, carries cross the two inner
steps in-register.

Monkeypatches pallas_mfn._bwd_call (resolved at call time by
_encode_bwd) and times the production whole-epoch program either way.

MEASURED (v5e, 2026-08-17, bench config): one-step 747.0 steps/s,
two-step 723.0 — REJECTED. Identical tracked losses, ~3% slower:
per-grid-iteration bookkeeping is not a meaningful cost at these
shapes, and doubling the streamed refs (11 vs 6 per iteration) adds
more DMA-issue overhead than the halved iteration count saves. The
remaining encode floor is the step math's serial dependency chain
itself.

Run on the TPU host: python scripts/twostep_bwd_probe.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from factorized_tpu.ops import pallas_mfn
from factorized_tpu.ops.pallas_lstm import _interpret, _mxu, _sig
from factorized_tpu.ops.pallas_mfn import _W_NAMES, _res_layout

BATCH, T, NB = 32, 20, 39


def _bwd_step(w, dw, z_tot, offs, loads, dh, dc, dmem, not_first):
    """One reverse step given loaded per-step operands; returns
    (dgates, dh_prev, dc_prev, dmem_prev). Mirrors pallas_mfn._bwd_kernel."""
    xp_i, hp, cp, memp, c_i, res_i = loads
    hp = hp * not_first
    cp = cp * not_first
    memp = memp * not_first
    M2 = w["a1w1"].shape[0]
    s3 = w["g1w2"].shape[0]
    n = c_i.shape[0]

    def get(nm):
        o, wd = offs[nm]
        return res_i[:, o:o + wd]

    gates = xp_i + _mxu(hp, w["wh"])
    ig, fg, gg, og = jnp.split(gates, 4, axis=-1)
    si, sf, so = _sig(ig), _sig(fg), _sig(og)
    tg = jnp.tanh(gg)
    tc = jnp.tanh(c_i)

    cstar = jnp.concatenate([cp[:, z_tot:], c_i[:, z_tot:]], axis=1)
    att = get("att")
    attended = att * cstar
    r1, r2, r3 = get("r1"), get("r2"), get("r3")
    chat, g1, g2 = get("chat"), get("g1"), get("g2")
    both = jnp.concatenate([attended, memp], axis=1)

    def mm_at_b(a, b):
        return _mxu(a, b, ((0,), (0,)))

    def mm_abt(a, b):
        return _mxu(a, b, ((1,), (1,)))

    dg1 = dmem * memp
    dg2 = dmem * chat
    dchat = dmem * g2
    dmem_prev = dmem * g1

    dq1 = dg1 * g1 * (1.0 - g1)
    dq2 = dg2 * g2 * (1.0 - g2)
    dw["g1w2"][:] += mm_at_b(r3[:, :s3], dq1)
    dw["g1b2"][:] += jnp.sum(dq1, axis=0, keepdims=True)
    dw["g2w2"][:] += mm_at_b(r3[:, s3:], dq2)
    dw["g2b2"][:] += jnp.sum(dq2, axis=0, keepdims=True)
    dr3 = jnp.concatenate(
        [mm_abt(dq1, w["g1w2"]), mm_abt(dq2, w["g2w2"])], axis=1)
    du3 = dr3 * get("kg3")
    dw["gw1"][:] += mm_at_b(both, du3)
    dw["gb1"][:] += jnp.sum(du3, axis=0, keepdims=True)
    dboth = mm_abt(du3, w["gw1"])
    dattended = dboth[:, :M2]
    dmem_prev = dmem_prev + dboth[:, M2:]

    dch = dchat * (1.0 - chat * chat)
    dw["a2w2"][:] += mm_at_b(r2, dch)
    dw["a2b2"][:] += jnp.sum(dch, axis=0, keepdims=True)
    du2 = mm_abt(dch, w["a2w2"]) * get("kg2")
    dw["a2w1"][:] += mm_at_b(attended, du2)
    dw["a2b1"][:] += jnp.sum(du2, axis=0, keepdims=True)
    dattended = dattended + mm_abt(du2, w["a2w1"])

    datt = dattended * cstar
    dcstar = dattended * att
    dlogits = att * (datt - jnp.sum(datt * att, axis=1, keepdims=True))
    dw["a1w2"][:] += mm_at_b(r1, dlogits)
    dw["a1b2"][:] += jnp.sum(dlogits, axis=0, keepdims=True)
    du1 = mm_abt(dlogits, w["a1w2"]) * get("kg1")
    dw["a1w1"][:] += mm_at_b(cstar, du1)
    dw["a1b1"][:] += jnp.sum(du1, axis=0, keepdims=True)
    dcstar = dcstar + mm_abt(du1, w["a1w1"])

    M = M2 // 2
    pad = jnp.zeros((n, z_tot), jnp.float32)
    dc_i = dc + jnp.concatenate([pad, dcstar[:, M:]], axis=1)
    dc_prev_att = jnp.concatenate([pad, dcstar[:, :M]], axis=1)

    do = dh * tc
    dc_full = dc_i + dh * so * (1.0 - tc * tc)
    dgates = jnp.concatenate([
        dc_full * tg * si * (1.0 - si),
        dc_full * cp * sf * (1.0 - sf),
        dc_full * si * (1.0 - tg * tg),
        do * so * (1.0 - so),
    ], axis=-1)
    dh_prev = mm_abt(dgates, w["wh"])
    dc_prev = dc_full * sf + dc_prev_att
    return dgates, dh_prev, dc_prev, dmem_prev


def _bwd2_kernel(z_tot, t, *refs):
    """Steps (i, i-1) per grid iteration, i = t-1-2k (t even)."""
    # per-step streamed refs, doubled: *_a at step i, *_b at step i-1
    (xp_a, xp_b, allh_pa, allh_pb, allc_a, allc_b, allc_c,
     allmem_pa, allmem_pb, res_a, res_b) = refs[:11]
    w = {name: refs[11 + k][:] for k, name in enumerate(_W_NAMES)}
    nw = len(_W_NAMES)
    dhlast_ref, dmemlast_ref = refs[11 + nw:13 + nw]
    dxp_a, dxp_b = refs[13 + nw:15 + nw]
    dw_names = [nm for nm in _W_NAMES if nm != "wh"]
    dw = {name: refs[15 + nw + k] for k, name in enumerate(dw_names)}
    dh_scr, dc_scr, dmem_scr = refs[15 + nw + len(dw_names):]

    k = pl.program_id(0)
    i = t - 1 - 2 * k
    offs, _ = _res_layout(w)

    @pl.when(k == 0)
    def _init():
        dh_scr[:] = dhlast_ref[:]
        dc_scr[:] = jnp.zeros(dc_scr.shape, jnp.float32)
        dmem_scr[:] = dmemlast_ref[:]
        for nm in dw_names:
            dw[nm][:] = jnp.zeros(dw[nm].shape, jnp.float32)

    dh, dc, dmem = dh_scr[:], dc_scr[:], dmem_scr[:]

    # inner step 1: index i (i >= 1 always since t even, i odd)
    loads = (xp_a[0], allh_pa[0], allc_b[0], allmem_pa[0], allc_a[0],
             res_a[0])
    dgates, dh, dc, dmem = _bwd_step(
        w, dw, z_tot, offs, loads, dh, dc, dmem,
        jnp.float32(1.0))
    dxp_a[0] = dgates

    # inner step 2: index i-1 (can be 0 -> zero the *_prev operands)
    not_first = (i - 1 > 0).astype(jnp.float32)
    loads = (xp_b[0], allh_pb[0], allc_c[0], allmem_pb[0], allc_b[0],
             res_b[0])
    dgates, dh, dc, dmem = _bwd_step(
        w, dw, z_tot, offs, loads, dh, dc, dmem, not_first)
    dxp_b[0] = dgates

    dh_scr[:] = dh
    dc_scr[:] = dc
    dmem_scr[:] = dmem


def _bwd2_call(xp, weights, allh, allc, allmem, rescat, dhlast,
               dmemlast, z_tot):
    t, n, H4 = xp.shape
    assert t % 2 == 0
    H = H4 // 4
    mem_dim = weights["a2w2"].shape[1]
    R = rescat.shape[2]
    dw_names = [nm for nm in _W_NAMES if nm != "wh"]

    def at_a(k):        # step i = t-1-2k
        return (t - 1 - 2 * k, 0, 0)

    def at_b(k):        # step i-1
        return (t - 2 - 2 * k, 0, 0)

    def at_pa(k):       # step i's prev (i-1)
        return (t - 2 - 2 * k, 0, 0)

    def at_pb(k):       # step (i-1)'s prev, clamped at 0
        return (jnp.maximum(t - 3 - 2 * k, 0), 0, 0)

    def const2(k):
        return (0, 0)

    def s3p(width, imap):
        return pl.BlockSpec((1, n, width), imap, memory_space=pltpu.VMEM)

    in_specs = [
        s3p(H4, at_a), s3p(H4, at_b),            # xp
        s3p(H, at_pa), s3p(H, at_pb),            # allh prev
        s3p(H, at_a), s3p(H, at_b), s3p(H, at_pb),  # allc i / i-1 / i-2
        s3p(mem_dim, at_pa), s3p(mem_dim, at_pb),   # allmem prev
        s3p(R, at_a), s3p(R, at_b),              # residuals
    ] + [
        pl.BlockSpec(weights[nm].shape, const2, memory_space=pltpu.VMEM)
        for nm in _W_NAMES
    ] + [
        pl.BlockSpec((n, H), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((n, mem_dim), const2, memory_space=pltpu.VMEM),
    ]
    out_specs = tuple(
        [s3p(H4, at_a), s3p(H4, at_b)] + [
            pl.BlockSpec(weights[nm].shape, const2,
                         memory_space=pltpu.VMEM) for nm in dw_names
        ]
    )
    out_shape = tuple(
        [jax.ShapeDtypeStruct(xp.shape, jnp.float32)] * 2 + [
            jax.ShapeDtypeStruct(weights[nm].shape, jnp.float32)
            for nm in dw_names
        ]
    )
    kw = {}
    if hasattr(pltpu, "CompilerParams"):
        kw["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",))
    outs = pl.pallas_call(
        functools.partial(_bwd2_kernel, z_tot, t),
        grid=(t // 2,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((n, H), jnp.float32),
            pltpu.VMEM((n, H), jnp.float32),
            pltpu.VMEM((n, mem_dim), jnp.float32),
        ],
        interpret=_interpret(),
        **kw,
    )(xp, xp, allh, allh, allc, allc, allc, allmem, allmem, rescat,
      rescat, *[weights[nm] for nm in _W_NAMES], dhlast, dmemlast)
    # dxp written into two interleaved buffers; merge the odd/even slots
    dxp_a, dxp_b = outs[0], outs[1]
    idx = jnp.arange(t)
    dxp = jnp.where((idx % 2 == 1)[:, None, None], dxp_a, dxp_b)
    dweights = {nm: g for nm, g in zip(dw_names, outs[2:])}
    if t > 1:
        A = allh[0:t - 1].reshape((t - 1) * n, H)
        B = dxp[1:t].reshape((t - 1) * n, H4)
        dweights["wh"] = jnp.dot(A.T, B,
                                 preferred_element_type=jnp.float32)
    else:
        dweights["wh"] = jnp.zeros_like(weights["wh"])
    return dxp, dweights


def measure(label):
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
    first = float(acc)
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
    print(f"{label}: best {dt*1e3:.1f} ms/epoch = {NB/dt:.1f} steps/s "
          f"(first tracked {first:.5f})", file=sys.stderr)
    return NB / dt, first


def main():
    from factorized_tpu.utils.compilation_cache import enable

    enable()
    results = {}
    results["onestep"], l1 = measure("onestep (production)")
    orig = pallas_mfn._bwd_call
    pallas_mfn._bwd_call = _bwd2_call
    try:
        results["twostep"], l2 = measure("twostep")
    finally:
        pallas_mfn._bwd_call = orig
    results["tracked_loss_match"] = bool(abs(l1 - l2) < 1e-4)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
