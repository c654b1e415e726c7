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

Residuals kept for backward: per-step (h, c, mem) only; attention
internals are recomputed in the reverse loop (rematerialization —
cheap VMEM-resident FLOPs instead of memory).

Tried and REJECTED (scripts/encode_width_probe.py, v5e 2026-08-16):
- 128-aligned fused width via dummy cells (h_tot 320 -> 384): +5%
  SLOWER — Mosaic already pads the 320-lane carry internally, explicit
  padding only adds real FLOPs.
- Folding the zf MLPs + y-head into the decode kernel: their isolated
  fwd+grad cost measures BELOW the chained-loop dispatch floor
  (~0 ms/step), so a fold has no headroom. The single-model floor is
  Mosaic sequential-loop latency; the multiseed vmapped path is where
  remaining perf effort pays.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
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
    ks = jax.random.split(key, t * 4)
    ks = ks.reshape((t, 4) + ks.shape[1:])
    cols = []
    for site, (s, rate) in enumerate(zip(sizes, drops)):
        if rate <= 0.0:
            cols.append(jnp.ones((t, n, s), jnp.float32))
        else:
            keep = 1.0 - rate
            bern = jax.vmap(
                lambda k: jax.random.bernoulli(k, keep, (n, s))
            )(ks[:, site])
            cols.append(jnp.where(bern, 1.0 / keep, 0.0).astype(jnp.float32))
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
    w = {name: refs[k][:] for k, name in enumerate(_W_NAMES)}
    outs = refs[len(_W_NAMES):]
    if with_res:
        hlast_ref, memlast_ref, allh_ref, allc_ref, allmem_ref = outs
    else:
        # inference: no residual buffers - saves ~2.6MB of VMEM writes
        # + HBM copy-out per encode at MOSI size
        hlast_ref, memlast_ref = outs
    t, n, _ = xp_ref.shape
    H = w["wh"].shape[0]
    mem_dim = w["a2w2"].shape[1]

    def body(i, carry):
        h, c, mem = carry
        masks_t = masks_ref[i] if train else None
        h, c, mem = _step_fwd(h, c, mem, xp_ref[i], masks_t, w, z_tot,
                              train)
        if with_res:
            allh_ref[i] = h
            allc_ref[i] = c
            allmem_ref[i] = mem
        return h, c, mem

    zeros_h = jnp.zeros((n, H), jnp.float32)
    h, c, mem = jax.lax.fori_loop(
        0, t, body, (zeros_h, zeros_h, jnp.zeros((n, mem_dim), jnp.float32)))
    hlast_ref[:] = h
    memlast_ref[:] = mem


def _bwd_kernel(z_tot, train, xp_ref, masks_ref, *refs):
    w = {name: refs[k][:] for k, name in enumerate(_W_NAMES)}
    nw = len(_W_NAMES)
    allh_ref, allc_ref, allmem_ref, dhlast_ref, dmemlast_ref = refs[nw:nw + 5]
    out_refs = refs[nw + 5:]
    dxp_ref = out_refs[0]
    dw = {name: out_refs[1 + k] for k, name in enumerate(_W_NAMES)}

    t, n, _ = xp_ref.shape
    H = w["wh"].shape[0]
    M2 = w["a1w1"].shape[0]  # 2 * dh_tot
    s3 = w["g1w2"].shape[0]
    sizes = _sizes(w)

    for name in _W_NAMES:
        dw[name][:] = jnp.zeros(dw[name].shape, jnp.float32)

    def outer(k, carry):
        dh, dc, dmem = carry
        i = t - 1 - k
        not_first = (i > 0).astype(jnp.float32)
        hp = allh_ref[jnp.maximum(i - 1, 0)] * not_first
        cp = allc_ref[jnp.maximum(i - 1, 0)] * not_first
        memp = allmem_ref[jnp.maximum(i - 1, 0)] * not_first
        c_i = allc_ref[i]

        if train:
            m1, m2, m3, m4 = _mask_slices(masks_ref[i], sizes)
        else:
            m1 = m2 = m3 = m4 = None

        def mask(x, m):
            return x if m is None else x * m

        # ---- recompute the step's forward internals
        gates = xp_ref[i] + _mxu(hp, w["wh"])
        ig, fg, gg, og = jnp.split(gates, 4, axis=-1)
        si, sf, so = _sig(ig), _sig(fg), _sig(og)
        tg = jnp.tanh(gg)
        tc = jnp.tanh(c_i)

        cstar = jnp.concatenate([cp[:, z_tot:], c_i[:, z_tot:]], axis=1)
        u1 = _mxu(cstar, w["a1w1"]) + w["a1b1"]
        r1 = mask(jax.nn.relu(u1), m1)
        logits = _mxu(r1, w["a1w2"]) + w["a1b2"]
        att = jax.nn.softmax(logits, axis=1)
        attended = att * cstar
        u2 = _mxu(attended, w["a2w1"]) + w["a2b1"]
        r2 = mask(jax.nn.relu(u2), m2)
        ch = _mxu(r2, w["a2w2"]) + w["a2b2"]
        chat = jnp.tanh(ch)
        both = jnp.concatenate([attended, memp], axis=1)
        u3 = _mxu(both, w["gw1"]) + w["gb1"]
        r3 = jax.nn.relu(u3)
        if train:
            r3 = r3 * jnp.concatenate([m3, m4], axis=1)
        g1 = _sig(_mxu(r3[:, :s3], w["g1w2"]) + w["g1b2"])
        g2 = _sig(_mxu(r3[:, s3:], w["g2w2"]) + w["g2b2"])

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
        if train:
            dr3 = dr3 * jnp.concatenate([m3, m4], axis=1)
        du3 = dr3 * (u3 > 0.0).astype(jnp.float32)
        dw["gw1"][:] += mm_at_b(both, du3)
        dw["gb1"][:] += jnp.sum(du3, axis=0, keepdims=True)
        dboth = mm_abt(du3, w["gw1"])
        dattended = dboth[:, :M2]
        dmem_prev = dmem_prev + dboth[:, M2:]

        # ---- backward through att2 / chat
        dch = dchat * (1.0 - chat * chat)
        dw["a2w2"][:] += mm_at_b(r2, dch)
        dw["a2b2"][:] += jnp.sum(dch, axis=0, keepdims=True)
        dr2 = mask(mm_abt(dch, w["a2w2"]), m2)
        du2 = dr2 * (u2 > 0.0).astype(jnp.float32)
        dw["a2w1"][:] += mm_at_b(attended, du2)
        dw["a2b1"][:] += jnp.sum(du2, axis=0, keepdims=True)
        dattended = dattended + mm_abt(du2, w["a2w1"])

        # ---- backward through attended = att * cstar and softmax
        datt = dattended * cstar
        dcstar = dattended * att
        dlogits = att * (datt - jnp.sum(datt * att, axis=1, keepdims=True))
        dw["a1w2"][:] += mm_at_b(r1, dlogits)
        dw["a1b2"][:] += jnp.sum(dlogits, axis=0, keepdims=True)
        dr1 = mask(mm_abt(dlogits, w["a1w2"]), m1)
        du1 = dr1 * (u1 > 0.0).astype(jnp.float32)
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
        dxp_ref[i] = dgates
        dh_prev = mm_abt(dgates, w["wh"])
        dc_prev = dc_full * sf + dc_prev_att
        return dh_prev, dc_prev, dmem_prev

    zeros_h = jnp.zeros((n, H), jnp.float32)
    jax.lax.fori_loop(
        0, t, outer, (dhlast_ref[:], zeros_h, dmemlast_ref[:]))

    # The recurrent weight grad sums over all transitions:
    # dWh = sum_{i>=1} h_{i-1}^T dgates_i — ONE big ((t-1)*n, H)^T x
    # ((t-1)*n, 4H) MXU GEMM over buffers already in VMEM, instead of
    # t small accumulations inside the sequential loop.
    if t > 1:
        A = allh_ref[0:t - 1].reshape((t - 1) * n, H)
        B = dxp_ref[1:t].reshape((t - 1) * n, 4 * H)
        dw["wh"][:] = _mxu(A, B, ((0,), (0,)))
    else:
        dw["wh"][:] = jnp.zeros(dw["wh"].shape, jnp.float32)


def _specs(k):
    return [pl.BlockSpec(memory_space=pltpu.VMEM)] * k


def _fwd_call(xp, masks, weights, z_tot, train, with_res=True):
    t, n, H4 = xp.shape
    H = H4 // 4
    mem_dim = weights["a2w2"].shape[1]
    kern = functools.partial(_fwd_kernel, z_tot, train, with_res)
    out_shape = [
        jax.ShapeDtypeStruct((n, H), jnp.float32),
        jax.ShapeDtypeStruct((n, mem_dim), jnp.float32),
    ]
    if with_res:
        out_shape += [
            jax.ShapeDtypeStruct((t, n, H), jnp.float32),
            jax.ShapeDtypeStruct((t, n, H), jnp.float32),
            jax.ShapeDtypeStruct((t, n, mem_dim), jnp.float32),
        ]
    return pl.pallas_call(
        kern,
        out_shape=tuple(out_shape),
        in_specs=_specs(2 + len(_W_NAMES)),
        out_specs=tuple(_specs(len(out_shape))),
        interpret=_interpret(),
    )(xp, masks, *[weights[nm] for nm in _W_NAMES])


def _bwd_call(xp, masks, weights, allh, allc, allmem, dhlast, dmemlast,
              z_tot, train):
    kern = functools.partial(_bwd_kernel, z_tot, train)
    out_shape = [jax.ShapeDtypeStruct(xp.shape, jnp.float32)] + [
        jax.ShapeDtypeStruct(weights[nm].shape, jnp.float32)
        for nm in _W_NAMES
    ]
    outs = pl.pallas_call(
        kern,
        out_shape=tuple(out_shape),
        in_specs=_specs(2 + len(_W_NAMES) + 5),
        out_specs=tuple(_specs(len(out_shape))),
        interpret=_interpret(),
    )(xp, masks, *[weights[nm] for nm in _W_NAMES],
      allh, allc, allmem, dhlast, dmemlast)
    dxp = outs[0]
    dweights = {nm: g for nm, g in zip(_W_NAMES, outs[1:])}
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
    h_last, mem_last, allh, allc, allmem = _fwd_call(
        xp, masks, weights, z_tot, train)
    return (h_last, mem_last), (xp, masks, weights, allh, allc, allmem)


def _encode_bwd(z_tot, train, res, grads):
    xp, masks, weights, allh, allc, allmem = res
    dhlast, dmemlast = grads
    dxp, dweights = _bwd_call(xp, masks, weights, allh, allc, allmem,
                              dhlast, dmemlast, z_tot, train)
    return dxp, jnp.zeros_like(masks), dweights


mfm_encode_pallas.defvjp(_encode_fwd, _encode_bwd)


def encode_fits(t, n, H, mem_dim, att_in, widths, mask_words=0) -> bool:
    """``mask_words``: t*n*sum(site sizes) when train-mode dropout masks
    ride along, 0 otherwise (eval or all-zero rates)."""
    words = (
        2 * t * n * 4 * H          # xp + dxp
        + 2 * t * n * H            # allh, allc
        + t * n * mem_dim
        + mask_words
        + 2 * (4 * H * H + sum(widths))  # weights + grads
        + 8 * n * max(H, att_in)   # step temporaries
    )
    return words * 4 <= VMEM_BUDGET
