"""Pallas TPU kernels for the fused LSTM recurrences.

The block-diagonally fused scans (ops/fused.py) still pay XLA while-loop
per-op overhead: each timestep is several HLO ops with HBM round-trips
between them. These kernels run the ENTIRE recurrence as one Pallas
program — weights and carries resident in VMEM across all timesteps,
per-step gate GEMM on the MXU, elementwise gate math on the VPU — with
hand-derived BPTT backward kernels wired up via ``jax.custom_vjp``.

Two kernels:
- :func:`multi_lstm` — k fused encoder cells (gate-major layout from
  ops/fused.py): input projections ``xp (t, n, 4H)`` are precomputed in
  XLA (one big MXU matmul), the kernel runs the sequential part.
- :func:`decoder_lstm` — the autoregressive decoder recurrence
  (reference semantics ``mfm_model.py:64-91``): step-i input is the
  step-(i-1) hidden state, so each step is one GEMM against
  ``W_x + W_h``.

Numerics match the lax.scan path (tests/test_pallas.py); used on TPU
when shapes fit the VMEM budget, falling back to the scan otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Lazy pallas import: keeps CPU-only environments working (kernels run
# in interpret mode there, selected by the wrappers below).
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# VMEM budget guard (bytes) — beyond this fall back to the XLA scan.
VMEM_BUDGET = 10 * 1024 * 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# Optionally cast matmul operands to bf16 (f32 accumulate) inside the
# kernels. Measured on v5e at MFM size: the per-step activation casts
# cost MORE than the MXU saves (74.9 vs 70.5 ms/epoch) — the matrices
# are too small to be MXU-bound — so this stays off by default.
MXU_BF16 = False


def _mxu(a, b, dims=None):
    if MXU_BF16 and not _interpret():
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    if dims is None:
        return jnp.dot(a, b, preferred_element_type=jnp.float32)
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _sig(x):
    return jax.nn.sigmoid(x)


# ===================================================== multi-cell encoder

def _enc_fwd_kernel(with_res, xp_ref, wh_ref, hlast_ref, *res_refs):
    t = xp_ref.shape[0]
    n = xp_ref.shape[1]
    H = wh_ref.shape[0]
    allh_ref, allc_ref = res_refs if with_res else (None, None)

    def body(i, carry):
        h, c = carry
        gates = xp_ref[i] + _mxu(h, wh_ref[:])
        ig, fg, gg, og = jnp.split(gates, 4, axis=-1)
        c = _sig(fg) * c + _sig(ig) * jnp.tanh(gg)
        h = _sig(og) * jnp.tanh(c)
        if with_res:
            allh_ref[i] = h
            allc_ref[i] = c
        return h, c

    zeros = jnp.zeros((n, H), jnp.float32)
    h, _ = jax.lax.fori_loop(0, t, body, (zeros, zeros))
    hlast_ref[:] = h


def _enc_bwd_kernel(xp_ref, wh_ref, allh_ref, allc_ref, dhlast_ref,
                    dxp_ref, dwh_ref):
    t = xp_ref.shape[0]
    n = xp_ref.shape[1]
    H = wh_ref.shape[0]
    zeros = jnp.zeros((n, H), jnp.float32)

    def body(k, carry):
        dh, dc = carry
        i = t - 1 - k
        not_first = (i > 0).astype(jnp.float32)
        hp = allh_ref[jnp.maximum(i - 1, 0)] * not_first
        cp = allc_ref[jnp.maximum(i - 1, 0)] * not_first

        gates = xp_ref[i] + _mxu(hp, wh_ref[:])
        ig, fg, gg, og = jnp.split(gates, 4, axis=-1)
        si, sf, so = _sig(ig), _sig(fg), _sig(og)
        tg = jnp.tanh(gg)
        tc = jnp.tanh(allc_ref[i])

        do = dh * tc
        dc = dc + dh * so * (1.0 - tc * tc)
        dgates = jnp.concatenate([
            dc * tg * si * (1.0 - si),
            dc * cp * sf * (1.0 - sf),
            dc * si * (1.0 - tg * tg),
            do * so * (1.0 - so),
        ], axis=-1)
        dxp_ref[i] = dgates
        dh = _mxu(dgates, wh_ref[:], ((1,), (1,)))
        dc = dc * sf
        return dh, dc

    jax.lax.fori_loop(0, t, body, (dhlast_ref[:], zeros))

    # dWh = sum_{i>=1} h_{i-1}^T dgates_i as one post-loop GEMM
    if t > 1:
        A = allh_ref[0:t - 1].reshape((t - 1) * n, H)
        B = dxp_ref[1:t].reshape((t - 1) * n, 4 * H)
        dwh_ref[:] = _mxu(A, B, ((0,), (0,)))
    else:
        dwh_ref[:] = jnp.zeros(dwh_ref.shape, jnp.float32)


def _enc_fwd_call(xp, wh, with_res=True):
    t, n, H4 = xp.shape
    H = H4 // 4
    out_shape = [jax.ShapeDtypeStruct((n, H), jnp.float32)]
    if with_res:
        out_shape += [jax.ShapeDtypeStruct((t, n, H), jnp.float32),
                      jax.ShapeDtypeStruct((t, n, H), jnp.float32)]
    return pl.pallas_call(
        functools.partial(_enc_fwd_kernel, with_res),
        out_shape=tuple(out_shape),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in out_shape),
        interpret=_interpret(),
    )(xp, wh)


def _enc_bwd_call(xp, wh, allh, allc, dhlast):
    t, n, H4 = xp.shape
    H = H4 // 4
    return pl.pallas_call(
        _enc_bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((t, n, H4), jnp.float32),
            jax.ShapeDtypeStruct((H, H4), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=_interpret(),
    )(xp, wh, allh, allc, dhlast)


@jax.custom_vjp
def multi_lstm(xp, wh):
    """Fused-cell LSTM over time: xp (t, n, 4H) gate-major input
    projections, wh (H, 4H) block-diagonal recurrence. -> h_last (n, H).
    """
    (h_last,) = _enc_fwd_call(xp, wh, with_res=False)
    return h_last


def _multi_lstm_fwd(xp, wh):
    h_last, allh, allc = _enc_fwd_call(xp, wh)
    return h_last, (xp, wh, allh, allc)


def _multi_lstm_bwd(res, dhlast):
    xp, wh, allh, allc = res
    dxp, dwh = _enc_bwd_call(xp, wh, allh, allc, dhlast)
    return dxp, dwh


multi_lstm.defvjp(_multi_lstm_fwd, _multi_lstm_bwd)


def multi_lstm_fits(t, n, H) -> bool:
    # xp + dxp (2 * t*n*4H) + allh/allc (2 * t*n*H) + weights (2 * 4H^2)
    words = 2 * t * n * 4 * H + 2 * t * n * H + 8 * H * H + 4 * n * H
    return words * 4 <= VMEM_BUDGET


# ======================================================= decoder kernel

def _dec_fwd_kernel(h0_ref, c0_ref, wsum_ref, b_ref, allh_ref, allc_ref):
    t = allh_ref.shape[0]
    allh_ref[0] = h0_ref[:]
    allc_ref[0] = c0_ref[:]

    def body(i, carry):
        h, c = carry
        gates = _mxu(h, wsum_ref[:]) + b_ref[0]
        ig, fg, gg, og = jnp.split(gates, 4, axis=-1)
        c = _sig(fg) * c + _sig(ig) * jnp.tanh(gg)
        h = _sig(og) * jnp.tanh(c)
        allh_ref[i] = h
        allc_ref[i] = c
        return h, c

    jax.lax.fori_loop(1, t, body, (h0_ref[:], c0_ref[:]))


def _dec_bwd_kernel(wsum_ref, b_ref, allh_ref, allc_ref, dallh_ref,
                    dh0_ref, dc0_ref, dwsum_ref, db_ref, dgates_scr):
    t = allh_ref.shape[0]
    n = allh_ref.shape[1]
    H = allh_ref.shape[2]

    def body(k, carry):
        dh, dc = carry
        i = t - 1 - k  # transition (i-1) -> i, i from t-1 down to 1
        hp = allh_ref[i - 1]
        cp = allc_ref[i - 1]
        gates = _mxu(hp, wsum_ref[:]) + b_ref[0]
        ig, fg, gg, og = jnp.split(gates, 4, axis=-1)
        si, sf, so = _sig(ig), _sig(fg), _sig(og)
        tg = jnp.tanh(gg)
        tc = jnp.tanh(allc_ref[i])

        do = dh * tc
        dc = dc + dh * so * (1.0 - tc * tc)
        dgates = jnp.concatenate([
            dc * tg * si * (1.0 - si),
            dc * cp * sf * (1.0 - sf),
            dc * si * (1.0 - tg * tg),
            do * so * (1.0 - so),
        ], axis=-1)
        dgates_scr[i - 1] = dgates
        dh = _mxu(dgates, wsum_ref[:], ((1,), (1,))) + dallh_ref[i - 1]
        dc = dc * sf
        return dh, dc

    dh, dc = jax.lax.fori_loop(
        0, t - 1, body,
        (dallh_ref[t - 1], jnp.zeros(dc0_ref.shape, jnp.float32)))
    dh0_ref[:] = dh
    dc0_ref[:] = dc

    # dwsum = sum_{i>=1} h_{i-1}^T dgates_i as one post-loop GEMM
    A = allh_ref[0:t - 1].reshape((t - 1) * n, H)
    B = dgates_scr[:].reshape((t - 1) * n, 4 * H)
    dwsum_ref[:] = _mxu(A, B, ((0,), (0,)))
    db_ref[:] = jnp.sum(B, axis=0, keepdims=True)


def _dec_fwd_call(h0, c0, wsum, b, t):
    n, H = h0.shape
    return pl.pallas_call(
        functools.partial(_dec_fwd_kernel),
        out_shape=(
            jax.ShapeDtypeStruct((t, n, H), jnp.float32),
            jax.ShapeDtypeStruct((t, n, H), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=_interpret(),
    )(h0, c0, wsum, b)


def _dec_bwd_call(wsum, b, allh, allc, dallh):
    t, n, H = allh.shape
    return pl.pallas_call(
        _dec_bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, H), jnp.float32),
            jax.ShapeDtypeStruct((n, H), jnp.float32),
            jax.ShapeDtypeStruct((H, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * H), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(4)),
        scratch_shapes=[pltpu.VMEM((t - 1, n, 4 * H), jnp.float32)],
        interpret=_interpret(),
    )(wsum, b, allh, allc, dallh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def decoder_lstm(h0, c0, wsum, b, t):
    """Autoregressive decoder recurrence: state (h0, c0) after the
    latent-driven step 0, then t-1 steps of ``gates = h @ wsum + b``.
    Returns all hidden states (t, n, H) (allh[0] == h0)."""
    allh, _ = _dec_fwd_call(h0, c0, wsum, b, t)
    return allh


def _decoder_fwd(h0, c0, wsum, b, t):
    allh, allc = _dec_fwd_call(h0, c0, wsum, b, t)
    return allh, (wsum, b, allh, allc)


def _decoder_bwd(t, res, dallh):
    wsum, b, allh, allc = res
    if t == 1:
        return dallh[0], jnp.zeros_like(allc[0]), jnp.zeros_like(wsum), \
            jnp.zeros_like(b)
    dh0, dc0, dwsum, db = _dec_bwd_call(wsum, b, allh, allc, dallh)
    return dh0, dc0, dwsum, db.reshape(b.shape)


decoder_lstm.defvjp(_decoder_fwd, _decoder_bwd)


def decoder_fits(t, n, H) -> bool:
    words = 4 * t * n * H + 2 * 4 * H * H + 6 * n * H
    return words * 4 <= VMEM_BUDGET
