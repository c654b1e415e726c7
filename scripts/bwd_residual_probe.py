"""Probe: stored-residual backward for the MFM encode mega-kernel.

Hypothesis. The production backward kernel (ops/pallas_mfn.py)
REMATERIALIZES the step's forward internals at the head of every
reverse iteration — a serial chain of ~7 small matmuls (att1 -> softmax
-> att2 -> gammas) that the backward chain then depends on. At MOSI
size the kernel is latency-bound (n=32 rows on a 128x128 MXU; compute
is ~2% of speed-of-light), so per-iteration time ~ length of the
dependency chain. Storing those internals as forward residuals should
cut the chain roughly in half.

Earlier probes showed hoisting the dw accumulations was NEUTRAL — they
branch OFF the critical path, so Mosaic already overlaps them. The
recompute block is different: it sits ON the path. This probe measures
that difference.

Variants (all bitwise-identical math — stored values ARE the recompute
values):
  A: production kernel (recompute; baseline)
  B: store r1/r2/r3 (post-mask) + fused relu/dropout grad-gates kg*,
     chat, g1, g2; recompute gates (off-path) and att (softmax of one
     stored-operand matmul)
  C: B + store att (drops the last on-path matmul + softmax)
Both B/C move the big dWh GEMM out of the kernel into XLA (operands
allh/dxp are already XLA-visible; frees 1.6MB VMEM and the kernel's
tail GEMM).

MEASURED (v5e, MOSI best-acc config, train mode with the real dropout
sites): A does NOT COMPILE at this size — the recompute bwd kernel
needs 16.19MB scoped VMEM vs the 16.00MB hardware limit, which is WHY
encode_fits correctly rejects it and production trains on the XLA scan
path. Hence variant D:
  D: fwd grid=1 storing residuals as ONE concatenated (t, n, R) buffer;
     bwd as a GRID-OVER-TIME (reverse) kernel — weights + dw
     accumulators VMEM-resident across the whole grid, per-step
     residual blocks STREAMED from HBM with double-buffered DMA.
     VMEM footprint ~4.5MB independent of t, so the Pallas encode can
     finally run in train mode at production size.

Run on the TPU host:  python scripts/bwd_residual_probe.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from factorized_tpu.config import best_acc_mosi_config
from factorized_tpu.ops import pallas_mfn
from factorized_tpu.ops.pallas_lstm import _interpret, _mxu, _sig
from factorized_tpu.ops.pallas_mfn import (_W_NAMES, _mask_slices, _sizes,
                                           _step_fwd, make_dropout_masks)

# residual layout appended by the variant forward:
#   att (M2) | r1 (s1) | kg1 (s1) | r2 (s2) | kg2 (s2) | r3 (s3+s4)
#   | kg3 (s3+s4) | chat (mem) | g1 (mem) | g2 (mem)


def _res_dims(w):
    s1, s2, s3, s4 = _sizes(w)
    m2 = w["a1w1"].shape[0]
    mem = w["a2w2"].shape[1]
    return dict(att=m2, r1=s1, kg1=s1, r2=s2, kg2=s2, r3=s3 + s4,
                kg3=s3 + s4, chat=mem, g1=mem, g2=mem)


_RES_NAMES = ("att", "r1", "kg1", "r2", "kg2", "r3", "kg3", "chat",
              "g1", "g2")


def _fwd_res_kernel(z_tot, train, xp_ref, masks_ref, *refs):
    w = {name: refs[k][:] for k, name in enumerate(_W_NAMES)}
    outs = refs[len(_W_NAMES):]
    (hlast_ref, memlast_ref, allh_ref, allc_ref, allmem_ref) = outs[:5]
    res = {name: outs[5 + k] for k, name in enumerate(_RES_NAMES)}
    t, n, _ = xp_ref.shape
    H = w["wh"].shape[0]
    mem_dim = w["a2w2"].shape[1]
    sizes = _sizes(w)
    s3 = w["g1w2"].shape[0]

    def body(i, carry):
        h, c, mem = carry
        gates = xp_ref[i] + _mxu(h, w["wh"])
        ig, fg, gg, og = jnp.split(gates, 4, axis=-1)
        new_c = _sig(fg) * c + _sig(ig) * jnp.tanh(gg)
        new_h = _sig(og) * jnp.tanh(new_c)

        if train:
            m1, m2, m3, m4 = _mask_slices(masks_ref[i], sizes)
        else:
            ones = jnp.ones((n, 1), jnp.float32)
            m1 = jnp.ones((n, sizes[0]), jnp.float32)
            m2 = jnp.ones((n, sizes[1]), jnp.float32)
            m3 = jnp.ones((n, sizes[2]), jnp.float32)
            m4 = jnp.ones((n, sizes[3]), jnp.float32)
            del ones

        cstar = jnp.concatenate([c[:, z_tot:], new_c[:, z_tot:]], axis=1)
        u1 = _mxu(cstar, w["a1w1"]) + w["a1b1"]
        kg1 = jnp.where(u1 > 0.0, m1, 0.0)
        r1 = jax.nn.relu(u1) * m1
        logits = _mxu(r1, w["a1w2"]) + w["a1b2"]
        att = jax.nn.softmax(logits, axis=1)
        attended = att * cstar
        u2 = _mxu(attended, w["a2w1"]) + w["a2b1"]
        kg2 = jnp.where(u2 > 0.0, m2, 0.0)
        r2 = jax.nn.relu(u2) * m2
        chat = jnp.tanh(_mxu(r2, w["a2w2"]) + w["a2b2"])
        both = jnp.concatenate([attended, mem], axis=1)
        u3 = _mxu(both, w["gw1"]) + w["gb1"]
        m34 = jnp.concatenate([m3, m4], axis=1)
        kg3 = jnp.where(u3 > 0.0, m34, 0.0)
        r3 = jax.nn.relu(u3) * m34
        g1 = _sig(_mxu(r3[:, :s3], w["g1w2"]) + w["g1b2"])
        g2 = _sig(_mxu(r3[:, s3:], w["g2w2"]) + w["g2b2"])
        new_mem = g1 * mem + g2 * chat

        allh_ref[i] = new_h
        allc_ref[i] = new_c
        allmem_ref[i] = new_mem
        res["att"][i] = att
        res["r1"][i] = r1
        res["kg1"][i] = kg1
        res["r2"][i] = r2
        res["kg2"][i] = kg2
        res["r3"][i] = r3
        res["kg3"][i] = kg3
        res["chat"][i] = chat
        res["g1"][i] = g1
        res["g2"][i] = g2
        return new_h, new_c, new_mem

    zeros_h = jnp.zeros((n, H), jnp.float32)
    h, c, mem = jax.lax.fori_loop(
        0, t, body, (zeros_h, zeros_h, jnp.zeros((n, mem_dim), jnp.float32)))
    hlast_ref[:] = h
    memlast_ref[:] = mem


def _bwd_res_kernel(z_tot, store_att, xp_ref, *refs):
    w = {name: refs[k][:] for k, name in enumerate(_W_NAMES)}
    nw = len(_W_NAMES)
    allh_ref, allc_ref, allmem_ref = refs[nw:nw + 3]
    res = {name: refs[nw + 3 + k] for k, name in enumerate(_RES_NAMES)}
    nres = len(_RES_NAMES)
    dhlast_ref, dmemlast_ref = refs[nw + 3 + nres:nw + 5 + nres]
    out_refs = refs[nw + 5 + nres:]
    dxp_ref = out_refs[0]
    # no dwh output — the dWh GEMM runs in XLA over (allh, dxp)
    dw_names = [nm for nm in _W_NAMES if nm != "wh"]
    dw = {name: out_refs[1 + k] for k, name in enumerate(dw_names)}

    t, n, _ = xp_ref.shape
    H = w["wh"].shape[0]
    M2 = w["a1w1"].shape[0]
    s3 = w["g1w2"].shape[0]

    for name in dw_names:
        dw[name][:] = jnp.zeros(dw[name].shape, jnp.float32)

    def outer(k, carry):
        dh, dc, dmem = carry
        i = t - 1 - k
        not_first = (i > 0).astype(jnp.float32)
        hp = allh_ref[jnp.maximum(i - 1, 0)] * not_first
        cp = allc_ref[jnp.maximum(i - 1, 0)] * not_first
        memp = allmem_ref[jnp.maximum(i - 1, 0)] * not_first
        c_i = allc_ref[i]

        # gate activations: recompute (hp@wh is OFF the bwd critical
        # path — its consumers sit at the chain tail, Mosaic overlaps it)
        gates = xp_ref[i] + _mxu(hp, w["wh"])
        ig, fg, gg, og = jnp.split(gates, 4, axis=-1)
        si, sf, so = _sig(ig), _sig(fg), _sig(og)
        tg = jnp.tanh(gg)
        tc = jnp.tanh(c_i)

        cstar = jnp.concatenate([cp[:, z_tot:], c_i[:, z_tot:]], axis=1)
        r1 = res["r1"][i]
        if store_att:
            att = res["att"][i]
        else:
            att = jax.nn.softmax(_mxu(r1, w["a1w2"]) + w["a1b2"], axis=1)
        attended = att * cstar
        r2, chat = res["r2"][i], res["chat"][i]
        r3 = res["r3"][i]
        g1, g2 = res["g1"][i], res["g2"][i]
        both = jnp.concatenate([attended, memp], axis=1)

        def mm_at_b(a, b):
            return _mxu(a, b, ((0,), (0,)))

        def mm_abt(a, b):
            return _mxu(a, b, ((1,), (1,)))

        # ---- memory update bwd
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
        du3 = dr3 * res["kg3"][i]
        dw["gw1"][:] += mm_at_b(both, du3)
        dw["gb1"][:] += jnp.sum(du3, axis=0, keepdims=True)
        dboth = mm_abt(du3, w["gw1"])
        dattended = dboth[:, :M2]
        dmem_prev = dmem_prev + dboth[:, M2:]

        # ---- att2 / chat bwd
        dch = dchat * (1.0 - chat * chat)
        dw["a2w2"][:] += mm_at_b(r2, dch)
        dw["a2b2"][:] += jnp.sum(dch, axis=0, keepdims=True)
        du2 = mm_abt(dch, w["a2w2"]) * res["kg2"][i]
        dw["a2w1"][:] += mm_at_b(attended, du2)
        dw["a2b1"][:] += jnp.sum(du2, axis=0, keepdims=True)
        dattended = dattended + mm_abt(du2, w["a2w1"])

        # ---- attention/softmax bwd
        datt = dattended * cstar
        dcstar = dattended * att
        dlogits = att * (datt - jnp.sum(datt * att, axis=1, keepdims=True))
        dw["a1w2"][:] += mm_at_b(r1, dlogits)
        dw["a1b2"][:] += jnp.sum(dlogits, axis=0, keepdims=True)
        du1 = mm_abt(dlogits, w["a1w2"]) * res["kg1"][i]
        dw["a1w1"][:] += mm_at_b(cstar, du1)
        dw["a1b1"][:] += jnp.sum(du1, axis=0, keepdims=True)
        dcstar = dcstar + mm_abt(du1, w["a1w1"])

        # ---- into the cell-state grads
        M = M2 // 2
        pad = jnp.zeros((n, z_tot), jnp.float32)
        dc_i = dc + jnp.concatenate([pad, dcstar[:, M:]], axis=1)
        dc_prev_att = jnp.concatenate([pad, dcstar[:, :M]], axis=1)

        # ---- LSTM bwd
        do = dh * tc
        dc_full = dc_i + dh * so * (1.0 - tc * tc)
        dgates = jnp.concatenate([
            dc_full * tg * si * (1.0 - si),
            dc_full * cp * sf * (1.0 - sf),
            dc_full * si * (1.0 - tg * tg),
            do * so * (1.0 - so),
        ], axis=-1)
        dxp_ref[i] = dgates
        dh_prev = mm_abt(dgates, w["wh"])
        dc_prev = dc_full * sf + dc_prev_att
        return dh_prev, dc_prev, dmem_prev

    zeros_h = jnp.zeros((n, H), jnp.float32)
    jax.lax.fori_loop(0, t, outer, (dhlast_ref[:], zeros_h,
                                    dmemlast_ref[:]))


def _specs(k):
    return [pl.BlockSpec(memory_space=pltpu.VMEM)] * k


_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024) \
    if hasattr(pltpu, "CompilerParams") else None


def _fwd_res_call(xp, masks, weights, z_tot, train):
    t, n, H4 = xp.shape
    H = H4 // 4
    mem_dim = weights["a2w2"].shape[1]
    rd = _res_dims(weights)
    out_shape = [
        jax.ShapeDtypeStruct((n, H), jnp.float32),
        jax.ShapeDtypeStruct((n, mem_dim), jnp.float32),
        jax.ShapeDtypeStruct((t, n, H), jnp.float32),
        jax.ShapeDtypeStruct((t, n, H), jnp.float32),
        jax.ShapeDtypeStruct((t, n, mem_dim), jnp.float32),
    ] + [jax.ShapeDtypeStruct((t, n, rd[nm]), jnp.float32)
         for nm in _RES_NAMES]
    kw = dict(compiler_params=_PARAMS) if _PARAMS else {}
    return pl.pallas_call(
        functools.partial(_fwd_res_kernel, z_tot, train),
        out_shape=tuple(out_shape),
        in_specs=_specs(2 + len(_W_NAMES)),
        out_specs=tuple(_specs(len(out_shape))),
        interpret=_interpret(),
        **kw,
    )(xp, masks, *[weights[nm] for nm in _W_NAMES])


def _bwd_res_call(xp, weights, allh, allc, allmem, res_list, dhlast,
                  dmemlast, z_tot, store_att):
    dw_names = [nm for nm in _W_NAMES if nm != "wh"]
    out_shape = [jax.ShapeDtypeStruct(xp.shape, jnp.float32)] + [
        jax.ShapeDtypeStruct(weights[nm].shape, jnp.float32)
        for nm in dw_names
    ]
    kw = dict(compiler_params=_PARAMS) if _PARAMS else {}
    outs = pl.pallas_call(
        functools.partial(_bwd_res_kernel, z_tot, store_att),
        out_shape=tuple(out_shape),
        in_specs=_specs(1 + len(_W_NAMES) + 3 + len(_RES_NAMES) + 2),
        out_specs=tuple(_specs(len(out_shape))),
        interpret=_interpret(),
        **kw,
    )(xp, *[weights[nm] for nm in _W_NAMES], allh, allc, allmem,
      *res_list, dhlast, dmemlast)
    dxp = outs[0]
    dweights = {nm: g for nm, g in zip(dw_names, outs[1:])}
    t, n, H4 = xp.shape
    H = H4 // 4
    # dWh in XLA: one large MXU GEMM, off the sequential path
    if t > 1:
        A = allh[0:t - 1].reshape((t - 1) * n, H)
        B = dxp[1:t].reshape((t - 1) * n, H4)
        dweights["wh"] = A.T @ B
    else:
        dweights["wh"] = jnp.zeros_like(weights["wh"])
    return dxp, dweights


def make_variant(store_att):
    @functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
    def encode(xp, masks, weights, z_tot, train):
        h, m = pallas_mfn._fwd_call(xp, masks, weights, z_tot, train,
                                    with_res=False)
        return h, m

    def fwd(xp, masks, weights, z_tot, train):
        outs = _fwd_res_call(xp, masks, weights, z_tot, train)
        h_last, mem_last = outs[0], outs[1]
        return (h_last, mem_last), (xp, weights, outs[2], outs[3],
                                    outs[4], outs[5:], masks)

    def bwd(z_tot, train, resids, grads):
        xp, weights, allh, allc, allmem, res_list, masks = resids
        dhlast, dmemlast = grads
        dxp, dweights = _bwd_res_call(
            xp, weights, allh, allc, allmem, res_list, dhlast, dmemlast,
            z_tot, store_att)
        return dxp, jnp.zeros_like(masks), dweights

    encode.defvjp(fwd, bwd)
    return encode


# ------------------------------------------------- variant D: streamed bwd

def _res_layout(w):
    rd = _res_dims(w)
    offs = {}
    o = 0
    for nm in _RES_NAMES:
        offs[nm] = (o, rd[nm])
        o += rd[nm]
    return offs, o


def _fwd_cat_kernel(z_tot, train, xp_ref, masks_ref, *refs):
    """grid=1 forward; residuals written as ONE (t, n, R) buffer."""
    w = {name: refs[k][:] for k, name in enumerate(_W_NAMES)}
    (hlast_ref, memlast_ref, allh_ref, allc_ref, allmem_ref,
     res_ref) = refs[len(_W_NAMES):]
    t, n, _ = xp_ref.shape
    H = w["wh"].shape[0]
    mem_dim = w["a2w2"].shape[1]
    sizes = _sizes(w)
    s3 = w["g1w2"].shape[0]
    offs, _ = _res_layout(w)

    def put(i, nm, val):
        o, wd = offs[nm]
        res_ref[i, :, o:o + wd] = val

    def body(i, carry):
        h, c, mem = carry
        gates = xp_ref[i] + _mxu(h, w["wh"])
        ig, fg, gg, og = jnp.split(gates, 4, axis=-1)
        new_c = _sig(fg) * c + _sig(ig) * jnp.tanh(gg)
        new_h = _sig(og) * jnp.tanh(new_c)

        if train:
            m1, m2, m3, m4 = _mask_slices(masks_ref[i], sizes)
            m34 = jnp.concatenate([m3, m4], axis=1)
        else:
            m1 = jnp.ones((n, sizes[0]), jnp.float32)
            m2 = jnp.ones((n, sizes[1]), jnp.float32)
            m34 = jnp.ones((n, sizes[2] + sizes[3]), jnp.float32)

        cstar = jnp.concatenate([c[:, z_tot:], new_c[:, z_tot:]], axis=1)
        u1 = _mxu(cstar, w["a1w1"]) + w["a1b1"]
        kg1 = jnp.where(u1 > 0.0, m1, 0.0)
        r1 = jax.nn.relu(u1) * m1
        logits = _mxu(r1, w["a1w2"]) + w["a1b2"]
        att = jax.nn.softmax(logits, axis=1)
        attended = att * cstar
        u2 = _mxu(attended, w["a2w1"]) + w["a2b1"]
        kg2 = jnp.where(u2 > 0.0, m2, 0.0)
        r2 = jax.nn.relu(u2) * m2
        chat = jnp.tanh(_mxu(r2, w["a2w2"]) + w["a2b2"])
        both = jnp.concatenate([attended, mem], axis=1)
        u3 = _mxu(both, w["gw1"]) + w["gb1"]
        kg3 = jnp.where(u3 > 0.0, m34, 0.0)
        r3 = jax.nn.relu(u3) * m34
        g1 = _sig(_mxu(r3[:, :s3], w["g1w2"]) + w["g1b2"])
        g2 = _sig(_mxu(r3[:, s3:], w["g2w2"]) + w["g2b2"])
        new_mem = g1 * mem + g2 * chat

        allh_ref[i] = new_h
        allc_ref[i] = new_c
        allmem_ref[i] = new_mem
        put(i, "att", att)
        put(i, "r1", r1)
        put(i, "kg1", kg1)
        put(i, "r2", r2)
        put(i, "kg2", kg2)
        put(i, "r3", r3)
        put(i, "kg3", kg3)
        put(i, "chat", chat)
        put(i, "g1", g1)
        put(i, "g2", g2)
        return new_h, new_c, new_mem

    zeros_h = jnp.zeros((n, H), jnp.float32)
    h, c, mem = jax.lax.fori_loop(
        0, t, body, (zeros_h, zeros_h, jnp.zeros((n, mem_dim), jnp.float32)))
    hlast_ref[:] = h
    memlast_ref[:] = mem


def _fwd_cat_call(xp, masks, weights, z_tot, train):
    t, n, H4 = xp.shape
    H = H4 // 4
    mem_dim = weights["a2w2"].shape[1]
    _, R = _res_layout(weights)
    out_shape = [
        jax.ShapeDtypeStruct((n, H), jnp.float32),
        jax.ShapeDtypeStruct((n, mem_dim), jnp.float32),
        jax.ShapeDtypeStruct((t, n, H), jnp.float32),
        jax.ShapeDtypeStruct((t, n, H), jnp.float32),
        jax.ShapeDtypeStruct((t, n, mem_dim), jnp.float32),
        jax.ShapeDtypeStruct((t, n, R), jnp.float32),
    ]
    return pl.pallas_call(
        functools.partial(_fwd_cat_kernel, z_tot, train),
        out_shape=tuple(out_shape),
        in_specs=_specs(2 + len(_W_NAMES)),
        out_specs=tuple(_specs(len(out_shape))),
        interpret=_interpret(),
    )(xp, masks, *[weights[nm] for nm in _W_NAMES])


def _bwd_stream_kernel(z_tot, t, xp_ref, allhp_ref, allci_ref, allcp_ref,
                       allmemp_ref, res_ref, *refs):
    """One reverse timestep per grid iteration; weights + dw accumulators
    VMEM-resident (constant index_map -> revisited blocks), carries in
    scratch, per-step blocks streamed."""
    w = {name: refs[k][:] for k, name in enumerate(_W_NAMES)}
    nw = len(_W_NAMES)
    dhlast_ref, dmemlast_ref = refs[nw:nw + 2]
    dxp_ref = refs[nw + 2]
    dw_names = [nm for nm in _W_NAMES if nm != "wh"]
    dw = {name: refs[nw + 3 + k] for k, name in enumerate(dw_names)}
    dh_scr, dc_scr, dmem_scr = refs[nw + 3 + len(dw_names):]

    k = pl.program_id(0)
    i = t - 1 - k
    M2 = w["a1w1"].shape[0]
    s3 = w["g1w2"].shape[0]
    offs, _ = _res_layout(w)

    @pl.when(k == 0)
    def _init():
        dh_scr[:] = dhlast_ref[:]
        dc_scr[:] = jnp.zeros(dc_scr.shape, jnp.float32)
        dmem_scr[:] = dmemlast_ref[:]
        for nm in dw_names:
            dw[nm][:] = jnp.zeros(dw[nm].shape, jnp.float32)

    def get(nm):
        o, wd = offs[nm]
        return res_ref[0, :, o:o + wd]

    dh, dc, dmem = dh_scr[:], dc_scr[:], dmem_scr[:]
    not_first = (i > 0).astype(jnp.float32)
    hp = allhp_ref[0] * not_first
    cp = allcp_ref[0] * not_first
    memp = allmemp_ref[0] * not_first
    c_i = allci_ref[0]

    gates = xp_ref[0] + _mxu(hp, w["wh"])
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

    n = cstar.shape[0]
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
    dxp_ref[0] = dgates
    dh_scr[:] = mm_abt(dgates, w["wh"])
    dc_scr[:] = dc_full * sf + dc_prev_att
    dmem_scr[:] = dmem_prev


def _bwd_stream_call(xp, weights, allh, allc, allmem, rescat, dhlast,
                     dmemlast, z_tot):
    t, n, H4 = xp.shape
    H = H4 // 4
    mem_dim = weights["a2w2"].shape[1]
    R = rescat.shape[2]
    dw_names = [nm for nm in _W_NAMES if nm != "wh"]

    def at_i(k):
        return (t - 1 - k, 0, 0)

    def at_prev(k):
        return (jnp.maximum(t - 2 - k, 0), 0, 0)

    def const2(k):
        return (0, 0)

    def step_spec(width, imap):
        return pl.BlockSpec((1, n, width), imap, memory_space=pltpu.VMEM)

    in_specs = [
        step_spec(H4, at_i),          # xp[i]
        step_spec(H, at_prev),        # allh[i-1]
        step_spec(H, at_i),           # allc[i]
        step_spec(H, at_prev),        # allc[i-1]
        step_spec(mem_dim, at_prev),  # allmem[i-1]
        step_spec(R, at_i),           # residuals[i]
    ] + [
        pl.BlockSpec(weights[nm].shape, const2, memory_space=pltpu.VMEM)
        for nm in _W_NAMES
    ] + [
        pl.BlockSpec((n, H), const2, memory_space=pltpu.VMEM),      # dhlast
        pl.BlockSpec((n, mem_dim), const2, memory_space=pltpu.VMEM),
    ]
    out_specs = tuple(
        [step_spec(H4, at_i)] + [
            pl.BlockSpec(weights[nm].shape, const2,
                         memory_space=pltpu.VMEM) for nm in dw_names
        ]
    )
    out_shape = tuple(
        [jax.ShapeDtypeStruct(xp.shape, jnp.float32)] + [
            jax.ShapeDtypeStruct(weights[nm].shape, jnp.float32)
            for nm in dw_names
        ]
    )
    kw = {}
    if hasattr(pltpu, "CompilerParams"):
        kw["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",))
    outs = pl.pallas_call(
        functools.partial(_bwd_stream_kernel, z_tot, t),
        grid=(t,),
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
    )(xp, allh, allc, allc, allmem, rescat,
      *[weights[nm] for nm in _W_NAMES], dhlast, dmemlast)
    dxp = outs[0]
    dweights = {nm: g for nm, g in zip(dw_names, outs[1:])}
    if t > 1:
        A = allh[0:t - 1].reshape((t - 1) * n, H)
        B = dxp[1:t].reshape((t - 1) * n, H4)
        dweights["wh"] = A.T @ B
    else:
        dweights["wh"] = jnp.zeros_like(weights["wh"])
    return dxp, dweights


def make_variant_d():
    @functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
    def encode(xp, masks, weights, z_tot, train):
        h, m = pallas_mfn._fwd_call(xp, masks, weights, z_tot, train,
                                    with_res=False)
        return h, m

    def fwd(xp, masks, weights, z_tot, train):
        (h_last, mem_last, allh, allc, allmem,
         rescat) = _fwd_cat_call(xp, masks, weights, z_tot, train)
        return (h_last, mem_last), (xp, weights, allh, allc, allmem,
                                    rescat, masks)

    def bwd(z_tot, train, resids, grads):
        xp, weights, allh, allc, allmem, rescat, masks = resids
        dhlast, dmemlast = grads
        dxp, dweights = _bwd_stream_call(
            xp, weights, allh, allc, allmem, rescat, dhlast, dmemlast,
            z_tot)
        return dxp, jnp.zeros_like(masks), dweights

    encode.defvjp(fwd, bwd)
    return encode


def scan_encode(xp, masks, weights, z_tot, train):
    """XLA lax.scan reference over the SAME weights dict (production's
    non-Pallas fallback, with the dropout masks precomputed — a lower
    bound on the production scan's cost)."""
    t, n, H4 = xp.shape
    H = H4 // 4
    mem_dim = weights["a2w2"].shape[1]

    def step(carry, inp):
        h, c, mem = carry
        xp_t, m_t = inp
        h, c, mem = _step_fwd(h, c, mem, xp_t, m_t if train else None,
                              weights, z_tot, train)
        return (h, c, mem), None

    init = (jnp.zeros((n, H), jnp.float32),
            jnp.zeros((n, H), jnp.float32),
            jnp.zeros((n, mem_dim), jnp.float32))
    if train:
        xs = (xp, masks)
    else:
        xs = (xp, jnp.zeros((t, 1, 1), jnp.float32))
    (h, c, mem), _ = jax.lax.scan(step, init, xs)
    return h, mem


# ------------------------------------------------------------------ main

def build_inputs():
    cfg = best_acc_mosi_config()
    t, n = cfg.seqlength, cfg.batchsize
    dh = sum(cfg.h_dims)
    zs = (cfg.zl_size, cfg.za_size, cfg.zv_size)
    z_tot = sum(zs)
    H = z_tot + dh
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 32)
    rng = np.random.default_rng(0)

    def rnd(*shape):
        return jnp.asarray(rng.normal(size=shape) * 0.1, jnp.float32)

    m2 = 2 * dh
    weights = {
        "wh": rnd(H, 4 * H),
        "a1w1": rnd(m2, cfg.att1_shape), "a1b1": rnd(1, cfg.att1_shape),
        "a1w2": rnd(cfg.att1_shape, m2), "a1b2": rnd(1, m2),
        "a2w1": rnd(m2, cfg.att2_shape), "a2b1": rnd(1, cfg.att2_shape),
        "a2w2": rnd(cfg.att2_shape, cfg.memsize),
        "a2b2": rnd(1, cfg.memsize),
        "gw1": rnd(m2 + cfg.memsize, cfg.gamma1_shape + cfg.gamma2_shape),
        "gb1": rnd(1, cfg.gamma1_shape + cfg.gamma2_shape),
        "g1w2": rnd(cfg.gamma1_shape, cfg.memsize),
        "g1b2": rnd(1, cfg.memsize),
        "g2w2": rnd(cfg.gamma2_shape, cfg.memsize),
        "g2b2": rnd(1, cfg.memsize),
    }
    xp = rnd(t, n, 4 * H)
    drops = (0.3, 0.3, 0.3, 0.3)
    sizes = (cfg.att1_shape, cfg.att2_shape, cfg.gamma1_shape,
             cfg.gamma2_shape)
    masks = make_dropout_masks(ks[0], t, n, sizes, drops)
    return xp, masks, weights, z_tot


def chained_grad_prog(encode, masks, z_tot, iters, fwd_only=False):
    """One jitted program running `iters` grad (or fwd) evaluations
    CHAINED by data dependency — per-iteration time comes from the
    SLOPE between two loop lengths, which cancels dispatch + fixed
    overhead (the tunnel's per-program cost otherwise dominates;
    see scripts/assembly_cost_probe.py)."""

    def f(xp, weights):
        h, m = encode(xp, masks, weights, z_tot, True)
        return jnp.sum(h * h) + jnp.sum(m * m)

    def one(carry, _):
        xp, weights = carry
        if fwd_only:
            v = f(xp, weights)
            xp = xp + 1e-12 * v
        else:
            dxp, dws = jax.grad(f, argnums=(0, 1))(xp, weights)
            xp = xp + 1e-12 * dxp
            weights = jax.tree_util.tree_map(
                lambda w, g: w + 1e-12 * g, weights, dws)
        return (xp, weights), None

    @jax.jit
    def prog(xp, weights):
        (xp, weights), _ = jax.lax.scan(one, (xp, weights), None,
                                        length=iters)
        return xp

    return prog


def time_prog(prog, xp, weights, groups=4):
    out = prog(xp, weights)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(groups):
        t0 = time.perf_counter()
        out = prog(xp, weights)
        jax.block_until_ready(out)
        np.asarray(out[0, 0, :2])
        best = min(best, time.perf_counter() - t0)
    return best


N_LO, N_HI = 10, 60


def slope_time(encode, xp, masks, weights, z_tot, fwd_only=False):
    lo = chained_grad_prog(encode, masks, z_tot, N_LO, fwd_only)
    hi = chained_grad_prog(encode, masks, z_tot, N_HI, fwd_only)
    t_lo = time_prog(lo, xp, weights)
    t_hi = time_prog(hi, xp, weights)
    return (t_hi - t_lo) / (N_HI - N_LO)


def main():
    from factorized_tpu.utils.compilation_cache import enable

    enable()
    xp, masks, weights, z_tot = build_inputs()
    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    def loss_with(encode):
        def f(xp, weights):
            h, m = encode(xp, masks, weights, z_tot, True)
            return jnp.sum(h * h) + jnp.sum(m * m)
        return jax.jit(jax.grad(f, argnums=(0, 1)))

    results = {}
    outS = loss_with(scan_encode)(xp, weights)
    tS = slope_time(scan_encode, xp, masks, weights, z_tot)
    results["scan_fwd_bwd"] = tS
    print(f"scan (XLA, production fallback): {tS * 1e3:.3f} ms/iter",
          file=sys.stderr)

    variants = [
        ("B_store_noatt", make_variant(False)),
        ("C_store_att", make_variant(True)),
        ("D_streamed", make_variant_d()),
    ]
    for name, enc in variants:
        try:
            outV = loss_with(enc)(xp, weights)
            errs = jax.tree_util.tree_map(
                lambda a, b: float(jnp.max(jnp.abs(a - b))), outS, outV)
            maxerr = max(jax.tree_util.tree_leaves(errs))
            tV = slope_time(enc, xp, masks, weights, z_tot)
            results[name] = tV
            print(f"{name}: {tV * 1e3:.3f} ms/iter  max|grad diff| vs "
                  f"scan = {maxerr:.2e}", file=sys.stderr)
        except Exception as e:  # VMEM overflow etc.
            print(f"{name}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:300]})", file=sys.stderr)
            results[name] = None

    # fwd-only (the eval path / primal): scan vs the production fwd
    # kernel without residuals
    tFS = slope_time(scan_encode, xp, masks, weights, z_tot,
                     fwd_only=True)
    results["scan_fwd_only"] = tFS
    print(f"scan fwd-only: {tFS * 1e3:.3f} ms/iter", file=sys.stderr)
    try:
        tFP = slope_time(pallas_mfn.mfm_encode_pallas, xp, masks,
                         weights, z_tot, fwd_only=True)
        results["pallas_fwd_only"] = tFP
        print(f"pallas fwd-only: {tFP * 1e3:.3f} ms/iter", file=sys.stderr)
    except Exception as e:
        print(f"pallas fwd-only FAILED: {str(e)[:200]}", file=sys.stderr)
        results["pallas_fwd_only"] = None

    import json
    print(json.dumps(results))


if __name__ == "__main__":
    main()
