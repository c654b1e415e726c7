"""Pallas TPU mega-kernel for the fused MFM encode stage.

One kernel runs the ENTIRE sequential encode (reference semantics
``mfm_model.py:161-191`` + the 3 unimodal encoders of
``mfm_model.py:530-534``): the 6-cell block-diagonal LSTM GEMM, the
delta-memory attention (att1 softmax, att2 tanh proposal, merged
gamma1/gamma2 sigmoid gates) and the memory update — all VMEM-resident
across every timestep, with a hand-derived BPTT backward kernel
(``jax.custom_vjp``).

Dropout masks are PRECOMPUTED in XLA with the exact same threefry key
layout as the lax.scan path (one parallel bernoulli over all t x 4
sites), so the Pallas path is BITWISE-equivalent to the scan path in
train mode too — and the kernel stays pure MXU/VPU math (in-kernel
integer-hash mask generation measured ~230us/step-loop slower on v5e).

Backward design (v2, scripts/bwd_residual_probe.py): the forward
STORES the attention-block internals (att, post-dropout relu
activations, fused relu/dropout grad-gates kg*, chat, g1, g2) as one
concatenated (t, n, R) residual buffer, and the backward runs as a
GRID-OVER-TIME (reverse) kernel: weights and dw accumulators stay
VMEM-resident across the whole grid (constant index_map -> revisited
blocks), the per-step residual blocks are STREAMED from HBM with
double-buffered DMA, and the (dh, dc, dmem) carries live in scratch.
The dWh reduction runs OUTSIDE the kernel as one large XLA GEMM over
(allh, dxp).

Why not rematerialize (v1)? The recompute chain (~7 small serial
matmuls) sits ON the backward critical path — and, decisively, keeping
all residuals + weights + grads VMEM-resident needs ~16.2MB at the
MOSI production config, over the 16MB scoped-VMEM limit, so the v1
kernel could not even compile in train mode there (production silently
fell back to the XLA scan). The streamed backward's VMEM footprint is
~4MB INDEPENDENT of t, so the Pallas encode now runs at production
size in train mode.

Tried and REJECTED (scripts/encode_width_probe.py, v5e 2026-08-16):
- 128-aligned fused width via dummy cells (h_tot 320 -> 384): +5%
  SLOWER — Mosaic already pads the 320-lane carry internally, explicit
  padding only adds real FLOPs.
- Folding the zf MLPs + y-head into the decode kernel: their isolated
  fwd+grad cost measures BELOW the chained-loop dispatch floor
  (~0 ms/step), so a fold has no headroom.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from factorized_tpu.ops.pallas_lstm import (VMEM_BUDGET, _interpret,
                                             _mxu, _sig)

_W_NAMES = ("wh", "a1w1", "a1b1", "a1w2", "a1b2", "a2w1", "a2b1",
            "a2w2", "a2b2", "gw1", "gb1", "g1w2", "g1b2", "g2w2", "g2b2")


def make_dropout_masks(key, t, n, sizes, drops):
    """(t, n, sum(sizes)) scaled keep-masks matching the scan path's
    per-step threefry stream (ops/mfn.py key layout: split(key, t*4)
    reshaped (t, 4)); rate-0 sites get all-ones."""
    from factorized_tpu.ops.core import rate_is_static

    ks = jax.random.split(key, t * 4)
    ks = ks.reshape((t, 4) + ks.shape[1:])
    cols = []
    for site, (s, rate) in enumerate(zip(sizes, drops)):
        if rate_is_static(rate) and rate <= 0.0:
            cols.append(jnp.ones((t, n, s), jnp.float32))
        else:
            # rate may be traced (per-lane under the config-vmapped
            # search); a traced 0 still yields an exact all-ones mask
            if rate_is_static(rate):
                keep = 1.0 - rate
                scale = 0.0 if rate >= 1.0 else 1.0 / keep
            else:
                keep = jnp.maximum(1.0 - rate, 1e-6)
                # rate >= 1 zeroes survivors, matching core.dropout's
                # traced-path guard (bernoulli(1e-6) is not all-zero)
                scale = jnp.where(rate >= 1.0, 0.0, 1.0 / keep)
            bern = jax.vmap(
                lambda k: jax.random.bernoulli(k, keep, (n, s))
            )(ks[:, site])
            cols.append(jnp.where(bern, scale, 0.0).astype(jnp.float32))
    return jnp.concatenate(cols, axis=2)


def _mask_slices(masks_t, sizes):
    outs = []
    o = 0
    for s in sizes:
        outs.append(masks_t[:, o:o + s])
        o += s
    return outs


def _sizes(w):
    s3 = w["g1w2"].shape[0]
    return (w["a1w1"].shape[1], w["a2w1"].shape[1], s3,
            w["gw1"].shape[1] - s3)


# backward residual buffer layout: one concatenated (t, n, R) array.
# r1/r2/r3 are POST-dropout relu activations (the GEMM operands of the
# weight grads); kg* are the fused relu/dropout grad-gates
# m * (u > 0) so the backward never touches the masks again.
_RES_NAMES = ("att", "r1", "kg1", "r2", "kg2", "r3", "kg3", "chat",
              "g1", "g2")


def _res_dims(w):
    s1, s2, s3, s4 = _sizes(w)
    m2 = w["a1w1"].shape[0]
    mem = w["a2w2"].shape[1]
    return dict(att=m2, r1=s1, kg1=s1, r2=s2, kg2=s2, r3=s3 + s4,
                kg3=s3 + s4, chat=mem, g1=mem, g2=mem)


def _res_layout(w):
    rd = _res_dims(w)
    offs = {}
    o = 0
    for nm in _RES_NAMES:
        offs[nm] = (o, rd[nm])
        o += rd[nm]
    return offs, o


def _step_fwd(h, c, mem, xp_t, masks_t, w, z_tot, train):
    """One fused step -> (new_h, new_c, new_mem)."""
    gates = xp_t + _mxu(h, w["wh"])
    ig, fg, gg, og = jnp.split(gates, 4, axis=-1)
    new_c = _sig(fg) * c + _sig(ig) * jnp.tanh(gg)
    new_h = _sig(og) * jnp.tanh(new_c)

    sizes = _sizes(w)
    m1, m2, m3, m4 = (_mask_slices(masks_t, sizes) if train
                      else (None, None, None, None))

    def mask(x, m):
        return x if m is None else x * m

    cstar = jnp.concatenate([c[:, z_tot:], new_c[:, z_tot:]], axis=1)
    r1 = mask(jax.nn.relu(
        _mxu(cstar, w["a1w1"]) + w["a1b1"]), m1)
    logits = _mxu(r1, w["a1w2"]) + w["a1b2"]
    att = jax.nn.softmax(logits, axis=1)
    attended = att * cstar
    r2 = mask(jax.nn.relu(
        _mxu(attended, w["a2w1"]) + w["a2b1"]), m2)
    chat = jnp.tanh(_mxu(r2, w["a2w2"]) + w["a2b2"])
    both = jnp.concatenate([attended, mem], axis=1)
    u3 = _mxu(both, w["gw1"]) + w["gb1"]
    r3 = jax.nn.relu(u3)
    if train:
        r3 = r3 * jnp.concatenate([m3, m4], axis=1)
    s3 = w["g1w2"].shape[0]
    g1 = _sig(_mxu(r3[:, :s3], w["g1w2"]) + w["g1b2"])
    g2 = _sig(_mxu(r3[:, s3:], w["g2w2"]) + w["g2b2"])
    new_mem = g1 * mem + g2 * chat
    return new_h, new_c, new_mem


def _fwd_kernel(z_tot, train, with_res, xp_ref, masks_ref, *refs):
    """One forward timestep per grid iteration (streamed, like the
    backward): weights VMEM-resident, (h, c, mem) carries in scratch,
    per-step xp/mask blocks streamed in and residual blocks streamed
    out. A whole-sequence grid=1 variant was measured first — it is the
    same speed single-model but needs ~13.4MB VMEM, which DOUBLE-BUFFERS
    past the 16MB limit once vmap prepends the multiseed batch axis
    (K=16 OOM'd at 16.54MB). Streaming keeps the footprint ~4MB
    independent of t and K."""
    w = {name: refs[k][:] for k, name in enumerate(_W_NAMES)}
    nouts = 6 if with_res else 2
    outs = refs[len(_W_NAMES):len(_W_NAMES) + nouts]
    if with_res:
        (hlast_ref, memlast_ref, allh_ref, allc_ref, allmem_ref,
         res_ref) = outs
    else:
        # inference: no residual buffers - saves the VMEM writes + HBM
        # copy-out per encode
        hlast_ref, memlast_ref = outs
    h_scr, c_scr, mem_scr = refs[len(_W_NAMES) + nouts:]

    k = pl.program_id(0)
    n = h_scr.shape[0]
    sizes = _sizes(w)
    s3 = w["g1w2"].shape[0]
    offs, _ = _res_layout(w)

    @pl.when(k == 0)
    def _init():
        h_scr[:] = jnp.zeros(h_scr.shape, jnp.float32)
        c_scr[:] = jnp.zeros(c_scr.shape, jnp.float32)
        mem_scr[:] = jnp.zeros(mem_scr.shape, jnp.float32)

    h, c, mem = h_scr[:], c_scr[:], mem_scr[:]

    def put(nm, val):
        o, wd = offs[nm]
        res_ref[0, :, o:o + wd] = val

    if not with_res:
        masks_t = masks_ref[0] if train else None
        new_h, new_c, new_mem = _step_fwd(h, c, mem, xp_ref[0], masks_t,
                                          w, z_tot, train)
    else:
        # same math as _step_fwd, storing the attention-block internals
        # the backward needs
        gates = xp_ref[0] + _mxu(h, w["wh"])
        ig, fg, gg, og = jnp.split(gates, 4, axis=-1)
        new_c = _sig(fg) * c + _sig(ig) * jnp.tanh(gg)
        new_h = _sig(og) * jnp.tanh(new_c)

        if train:
            m1, m2, m3, m4 = _mask_slices(masks_ref[0], sizes)
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

        allh_ref[0] = new_h
        allc_ref[0] = new_c
        allmem_ref[0] = new_mem
        put("att", att)
        put("r1", r1)
        put("kg1", kg1)
        put("r2", r2)
        put("kg2", kg2)
        put("r3", r3)
        put("kg3", kg3)
        put("chat", chat)
        put("g1", g1)
        put("g2", g2)

    h_scr[:] = new_h
    c_scr[:] = new_c
    mem_scr[:] = new_mem
    # revisited blocks (constant index_map): copied out once at the end
    hlast_ref[:] = new_h
    memlast_ref[:] = new_mem


def _bwd_kernel(z_tot, t, xp_ref, allhp_ref, allci_ref, allcp_ref,
                allmemp_ref, res_ref, *refs):
    """One reverse timestep per grid iteration. Weights and dw
    accumulators are VMEM-resident across the whole grid (constant
    index_map -> revisited blocks); the per-step residual blocks stream
    in with double-buffered DMA; (dh, dc, dmem) carries live in scratch.
    All forward internals are LOADED (not recomputed) — the serial
    recompute chain was the backward's critical path. The dWh GEMM runs
    outside in XLA."""
    w = {name: refs[k][:] for k, name in enumerate(_W_NAMES)}
    nw = len(_W_NAMES)
    dhlast_ref, dmemlast_ref = refs[nw:nw + 2]
    dxp_ref = refs[nw + 2]
    dw_names = [nm for nm in _W_NAMES if nm != "wh"]
    dw = {name: refs[nw + 3 + k] for k, name in enumerate(dw_names)}
    dh_scr, dc_scr, dmem_scr = refs[nw + 3 + len(dw_names):]

    k = pl.program_id(0)
    i = t - 1 - k
    M2 = w["a1w1"].shape[0]  # 2 * dh_tot
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
    n = c_i.shape[0]

    # gate activations: recomputed — hp@wh is OFF the backward critical
    # path (its consumers sit at the chain tail, Mosaic overlaps it),
    # and storing the (n, 4H) gates would double the streamed bytes
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

    def mm_at_b(a, b):  # a^T @ b
        return _mxu(a, b, ((0,), (0,)))

    def mm_abt(a, b):  # a @ b^T
        return _mxu(a, b, ((1,), (1,)))

    # ---- backward through the memory update
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

    # ---- backward through att2 / chat
    dch = dchat * (1.0 - chat * chat)
    dw["a2w2"][:] += mm_at_b(r2, dch)
    dw["a2b2"][:] += jnp.sum(dch, axis=0, keepdims=True)
    du2 = mm_abt(dch, w["a2w2"]) * get("kg2")
    dw["a2w1"][:] += mm_at_b(attended, du2)
    dw["a2b1"][:] += jnp.sum(du2, axis=0, keepdims=True)
    dattended = dattended + mm_abt(du2, w["a2w1"])

    # ---- backward through attended = att * cstar and softmax
    datt = dattended * cstar
    dcstar = dattended * att
    dlogits = att * (datt - jnp.sum(datt * att, axis=1, keepdims=True))
    dw["a1w2"][:] += mm_at_b(r1, dlogits)
    dw["a1b2"][:] += jnp.sum(dlogits, axis=0, keepdims=True)
    du1 = mm_abt(dlogits, w["a1w2"]) * get("kg1")
    dw["a1w1"][:] += mm_at_b(cstar, du1)
    dw["a1b1"][:] += jnp.sum(du1, axis=0, keepdims=True)
    dcstar = dcstar + mm_abt(du1, w["a1w1"])

    # ---- cstar contributions into cell-state grads (mfn slice)
    M = M2 // 2
    pad = jnp.zeros((n, z_tot), jnp.float32)
    dc_i = dc + jnp.concatenate([pad, dcstar[:, M:]], axis=1)
    dc_prev_att = jnp.concatenate([pad, dcstar[:, :M]], axis=1)

    # ---- LSTM backward
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


def _specs(k):
    return [pl.BlockSpec(memory_space=pltpu.VMEM)] * k


def _fwd_call(xp, masks, weights, z_tot, train, with_res=True):
    t, n, H4 = xp.shape
    H = H4 // 4
    mem_dim = weights["a2w2"].shape[1]
    kern = functools.partial(_fwd_kernel, z_tot, train, with_res)

    def at_i(k):
        return (k, 0, 0)

    def const2(k):
        return (0, 0)

    def step_spec(width):
        return pl.BlockSpec((1, n, width), at_i, memory_space=pltpu.VMEM)

    if train:
        masks_spec = step_spec(masks.shape[2])
    else:
        masks_spec = pl.BlockSpec(masks.shape, lambda k: (0, 0, 0),
                                  memory_space=pltpu.VMEM)
    in_specs = [step_spec(H4), masks_spec] + [
        pl.BlockSpec(weights[nm].shape, const2, memory_space=pltpu.VMEM)
        for nm in _W_NAMES
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n, H), jnp.float32),
        jax.ShapeDtypeStruct((n, mem_dim), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((n, H), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((n, mem_dim), const2, memory_space=pltpu.VMEM),
    ]
    if with_res:
        _, R = _res_layout(weights)
        out_shape += [
            jax.ShapeDtypeStruct((t, n, H), jnp.float32),
            jax.ShapeDtypeStruct((t, n, H), jnp.float32),
            jax.ShapeDtypeStruct((t, n, mem_dim), jnp.float32),
            jax.ShapeDtypeStruct((t, n, R), jnp.float32),
        ]
        out_specs += [step_spec(H), step_spec(H), step_spec(mem_dim),
                      step_spec(R)]
    kw = {}
    if hasattr(pltpu, "CompilerParams"):
        kw["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",))
    return pl.pallas_call(
        kern,
        grid=(t,),
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((n, H), jnp.float32),
            pltpu.VMEM((n, H), jnp.float32),
            pltpu.VMEM((n, mem_dim), jnp.float32),
        ],
        interpret=_interpret(),
        **kw,
    )(xp, masks, *[weights[nm] for nm in _W_NAMES])


def _bwd_call(xp, weights, allh, allc, allmem, rescat, dhlast, dmemlast,
              z_tot):
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
        pl.BlockSpec((n, H), const2, memory_space=pltpu.VMEM),  # dhlast
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
        functools.partial(_bwd_kernel, z_tot, t),
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
    # dWh = sum_{i>=1} h_{i-1}^T dgates_i — one large MXU GEMM in XLA
    # over operands that are already XLA-visible, OFF the kernel's
    # sequential path
    if t > 1:
        A = allh[0:t - 1].reshape((t - 1) * n, H)
        B = dxp[1:t].reshape((t - 1) * n, H4)
        dweights["wh"] = jnp.dot(A.T, B,
                                 preferred_element_type=jnp.float32)
    else:
        dweights["wh"] = jnp.zeros_like(weights["wh"])
    return dxp, dweights


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def mfm_encode_pallas(xp, masks, weights, z_tot, train):
    """Fused encode stage. xp (t, n, 4H) gate-major projections for the
    6 fused cells; masks (t, n, s1+s2+s3+s4) scaled dropout keep-masks
    (see :func:`make_dropout_masks`; any (1,1,1) array when not
    training); weights dict (see _W_NAMES; biases shaped (1, d)).
    Returns (h_last, mem_last)."""
    h_last, mem_last = _fwd_call(xp, masks, weights, z_tot, train,
                                 with_res=False)
    return h_last, mem_last


def _encode_fwd(xp, masks, weights, z_tot, train):
    h_last, mem_last, allh, allc, allmem, rescat = _fwd_call(
        xp, masks, weights, z_tot, train)
    return (h_last, mem_last), (xp, masks, weights, allh, allc, allmem,
                                rescat)


def _encode_bwd(z_tot, train, res, grads):
    xp, masks, weights, allh, allc, allmem, rescat = res
    dhlast, dmemlast = grads
    dxp, dweights = _bwd_call(xp, weights, allh, allc, allmem, rescat,
                              dhlast, dmemlast, z_tot)
    return dxp, jnp.zeros_like(masks), dweights


mfm_encode_pallas.defvjp(_encode_fwd, _encode_bwd)


# Both kernels stream per-timestep blocks, so the footprint is
# per-STEP, independent of t: weights (possibly double-buffered under
# vmap, where each seed instance has its own weights) + 2x-buffered
# step blocks + carries/temporaries. Budget leaves slack of the 16MB
# scoped-VMEM limit for Mosaic temporaries.
ENCODE_VMEM_BUDGET = 12 * 1024 * 1024


def encode_fits(t, n, H, mem_dim, att_in, widths, mask_words=0) -> bool:
    """``mask_words``: t*n*sum(site sizes) when train-mode dropout masks
    ride along, 0 otherwise (eval or all-zero rates). ``widths`` are the
    attention/gate weight sizes (elements). Per-step ledger (both
    kernels stream the time axis)."""
    if not (isinstance(t, (int, np.integer))
            and isinstance(n, (int, np.integer))):
        # symbolic dims (jax.export symbolic batch): the VMEM ledger is
        # undecidable and the artifact must stay portable — scan path
        return False
    # R = att (att_in) + 2*(s1+s2+s3+s4) + 3*mem; recover sum(sites)
    # from the mask words when they ride along, else from the widths
    if mask_words:
        sum_sites = mask_words // (t * n)
    else:
        # widths = [att_in*s1, att_in*s2, (att_in+mem)*(s3+s4)]
        sum_sites = (widths[0] // att_in + widths[1] // att_in
                     + widths[2] // (att_in + mem_dim))
    R = att_in + 2 * sum_sites + 3 * mem_dim
    step_words = n * (
        2 * 4 * H                  # xp in + dxp out
        + 3 * H + mem_dim          # allh/allc x2 + allmem
        + R                        # residual block
        + sum_sites                # mask block
    )
    words = (
        2 * 2 * (4 * H * H + sum(widths))  # weights + dw, 2x-buffered
        + 2 * step_words           # double-buffered step blocks
        + 3 * n * H                # carries scratch
        + 8 * n * max(H, att_in)   # step temporaries
    )
    return words * 4 <= ENCODE_VMEM_BUDGET
