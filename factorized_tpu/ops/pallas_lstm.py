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
import numpy as np

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
#
# Streamed (grid-over-time) kernels, one timestep per grid iteration:
# weights VMEM-resident (constant index_map), carries in scratch,
# per-step blocks streamed with double-buffered DMA. VMEM footprint is
# per-STEP, independent of t — and, crucially, stays small when the
# multiseed trainer vmaps the call (vmap prepends a batch grid axis and
# double-buffers per-seed blocks; whole-sequence grid=1 kernels OOM'd
# there — see ops/pallas_mfn.py). The forward stores the pre-activation
# GATES as the residual: for a pure LSTM the gates recompute
# (h_{i-1} @ Wh) sits ON the backward critical path, and dxp IS dgates,
# so storing gates removes the only backward matmul besides dh.
# The dWh reduction runs outside in XLA as one large GEMM.


def _seq_params():
    if hasattr(pltpu, "CompilerParams"):
        return {"compiler_params": pltpu.CompilerParams(
            dimension_semantics=("arbitrary",))}
    return {}


def _enc_fwd_kernel(with_res, xp_ref, wh_ref, *refs):
    if with_res:
        hlast_ref, allh_ref, allc_ref, gates_ref = refs[:4]
        h_scr, c_scr = refs[4:]
    else:
        hlast_ref = refs[0]
        h_scr, c_scr = refs[1:]
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _init():
        h_scr[:] = jnp.zeros(h_scr.shape, jnp.float32)
        c_scr[:] = jnp.zeros(c_scr.shape, jnp.float32)

    h, c = h_scr[:], c_scr[:]
    gates = xp_ref[0] + _mxu(h, wh_ref[:])
    ig, fg, gg, og = jnp.split(gates, 4, axis=-1)
    c = _sig(fg) * c + _sig(ig) * jnp.tanh(gg)
    h = _sig(og) * jnp.tanh(c)
    if with_res:
        allh_ref[0] = h
        allc_ref[0] = c
        gates_ref[0] = gates
    h_scr[:] = h
    c_scr[:] = c
    hlast_ref[:] = h  # revisited block; copied out once at the end


def _enc_bwd_kernel(t, gates_ref, allcp_ref, allci_ref, wh_ref,
                    dhlast_ref, dxp_ref, dh_scr, dc_scr):
    k = pl.program_id(0)
    i = t - 1 - k

    @pl.when(k == 0)
    def _init():
        dh_scr[:] = dhlast_ref[:]
        dc_scr[:] = jnp.zeros(dc_scr.shape, jnp.float32)

    dh, dc = dh_scr[:], dc_scr[:]
    not_first = (i > 0).astype(jnp.float32)
    cp = allcp_ref[0] * not_first

    ig, fg, gg, og = jnp.split(gates_ref[0], 4, axis=-1)
    si, sf, so = _sig(ig), _sig(fg), _sig(og)
    tg = jnp.tanh(gg)
    tc = jnp.tanh(allci_ref[0])

    do = dh * tc
    dc = dc + dh * so * (1.0 - tc * tc)
    dgates = jnp.concatenate([
        dc * tg * si * (1.0 - si),
        dc * cp * sf * (1.0 - sf),
        dc * si * (1.0 - tg * tg),
        do * so * (1.0 - so),
    ], axis=-1)
    dxp_ref[0] = dgates
    dh_scr[:] = _mxu(dgates, wh_ref[:], ((1,), (1,)))
    dc_scr[:] = dc * sf


def _step3(n, width, imap):
    return pl.BlockSpec((1, n, width), imap, memory_space=pltpu.VMEM)


def _enc_fwd_call(xp, wh, with_res=True):
    t, n, H4 = xp.shape
    H = H4 // 4

    def at_i(k):
        return (k, 0, 0)

    def const2(k):
        return (0, 0)

    out_shape = [jax.ShapeDtypeStruct((n, H), jnp.float32)]
    out_specs = [pl.BlockSpec((n, H), const2, memory_space=pltpu.VMEM)]
    if with_res:
        out_shape += [jax.ShapeDtypeStruct((t, n, H), jnp.float32),
                      jax.ShapeDtypeStruct((t, n, H), jnp.float32),
                      jax.ShapeDtypeStruct((t, n, H4), jnp.float32)]
        out_specs += [_step3(n, H, at_i), _step3(n, H, at_i),
                      _step3(n, H4, at_i)]
    return pl.pallas_call(
        functools.partial(_enc_fwd_kernel, with_res),
        grid=(t,),
        out_shape=tuple(out_shape),
        in_specs=[_step3(n, H4, at_i),
                  pl.BlockSpec(wh.shape, const2,
                               memory_space=pltpu.VMEM)],
        out_specs=tuple(out_specs),
        scratch_shapes=[pltpu.VMEM((n, H), jnp.float32),
                        pltpu.VMEM((n, H), jnp.float32)],
        interpret=_interpret(),
        **_seq_params(),
    )(xp, wh)


def _enc_bwd_call(gates, wh, allc, dhlast):
    t, n, H4 = gates.shape
    H = H4 // 4

    def at_i(k):
        return (t - 1 - k, 0, 0)

    def at_prev(k):
        return (jnp.maximum(t - 2 - k, 0), 0, 0)

    def const2(k):
        return (0, 0)

    (dxp,) = pl.pallas_call(
        functools.partial(_enc_bwd_kernel, t),
        grid=(t,),
        out_shape=(jax.ShapeDtypeStruct((t, n, H4), jnp.float32),),
        in_specs=[_step3(n, H4, at_i),      # gates[i]
                  _step3(n, H, at_prev),    # allc[i-1]
                  _step3(n, H, at_i),       # allc[i]
                  pl.BlockSpec(wh.shape, const2,
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((n, H), const2,
                               memory_space=pltpu.VMEM)],
        out_specs=(_step3(n, H4, at_i),),
        scratch_shapes=[pltpu.VMEM((n, H), jnp.float32),
                        pltpu.VMEM((n, H), jnp.float32)],
        interpret=_interpret(),
        **_seq_params(),
    )(gates, allc, allc, wh, dhlast)
    return dxp


@jax.custom_vjp
def multi_lstm(xp, wh):
    """Fused-cell LSTM over time: xp (t, n, 4H) gate-major input
    projections, wh (H, 4H) block-diagonal recurrence. -> h_last (n, H).
    """
    (h_last,) = _enc_fwd_call(xp, wh, with_res=False)
    return h_last


def _multi_lstm_fwd(xp, wh):
    h_last, allh, allc, gates = _enc_fwd_call(xp, wh)
    return h_last, (wh, allh, allc, gates)


def _multi_lstm_bwd(res, dhlast):
    wh, allh, allc, gates = res
    dxp = _enc_bwd_call(gates, wh, allc, dhlast)
    t, n, H4 = gates.shape
    H = H4 // 4
    # dWh = sum_{i>=1} h_{i-1}^T dgates_i as one XLA GEMM
    if t > 1:
        A = allh[0:t - 1].reshape((t - 1) * n, H)
        B = dxp[1:t].reshape((t - 1) * n, H4)
        dwh = jnp.dot(A.T, B, preferred_element_type=jnp.float32)
    else:
        dwh = jnp.zeros_like(wh)
    return dxp, dwh


multi_lstm.defvjp(_multi_lstm_fwd, _multi_lstm_bwd)


def multi_lstm_fits(t, n, H) -> bool:
    if not (isinstance(t, (int, np.integer))
            and isinstance(n, (int, np.integer))):
        # symbolic dims (jax.export symbolic batch): the VMEM ledger is
        # undecidable and the artifact must stay portable — scan path
        return False
    # per-step ledger (streamed): weights 2x-buffered (per-seed under
    # vmap) + 2x-buffered step blocks + carries + temporaries
    words = (2 * 2 * 4 * H * H          # wh + (vmap) prefetch
             + 2 * n * (2 * 4 * H + 2 * H)   # xp/gates/dxp + allh/allc
             + 2 * n * H                # carries scratch
             + 6 * n * H)               # temporaries
    return words * 4 <= VMEM_BUDGET


# ======================================================= decoder kernel
# Same streamed design as the encoder; the forward stores the
# pre-activation gates (transition i lives in slot i of a (t, n, 4H)
# buffer, slot 0 zeroed) so the backward is load + elementwise + one
# dh matmul, with dwsum/db reduced outside in XLA.


def _dec_fwd_kernel(h0_ref, c0_ref, wsum_ref, b_ref, allh_ref, allc_ref,
                    gates_ref, h_scr, c_scr):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _first():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]
        allh_ref[0] = h0_ref[:]
        allc_ref[0] = c0_ref[:]
        gates_ref[0] = jnp.zeros(gates_ref.shape[1:], jnp.float32)

    @pl.when(k > 0)
    def _step():
        h, c = h_scr[:], c_scr[:]
        gates = _mxu(h, wsum_ref[:]) + b_ref[0]
        ig, fg, gg, og = jnp.split(gates, 4, axis=-1)
        c = _sig(fg) * c + _sig(ig) * jnp.tanh(gg)
        h = _sig(og) * jnp.tanh(c)
        allh_ref[0] = h
        allc_ref[0] = c
        gates_ref[0] = gates
        h_scr[:] = h
        c_scr[:] = c


def _dec_bwd_kernel(t, gates_ref, allcp_ref, allci_ref, dallhp_ref,
                    wsum_ref, dhlast_ref, dgates_ref, dh0_ref, dc0_ref,
                    dh_scr, dc_scr):
    k = pl.program_id(0)
    # transition (i-1) -> i, i from t-1 down to 1

    @pl.when(k == 0)
    def _init():
        dh_scr[:] = dhlast_ref[:]
        dc_scr[:] = jnp.zeros(dc_scr.shape, jnp.float32)

    dh, dc = dh_scr[:], dc_scr[:]
    cp = allcp_ref[0]
    ig, fg, gg, og = jnp.split(gates_ref[0], 4, axis=-1)
    si, sf, so = _sig(ig), _sig(fg), _sig(og)
    tg = jnp.tanh(gg)
    tc = jnp.tanh(allci_ref[0])

    do = dh * tc
    dc = dc + dh * so * (1.0 - tc * tc)
    dgates = jnp.concatenate([
        dc * tg * si * (1.0 - si),
        dc * cp * sf * (1.0 - sf),
        dc * si * (1.0 - tg * tg),
        do * so * (1.0 - so),
    ], axis=-1)
    dgates_ref[0] = dgates
    dh_scr[:] = _mxu(dgates, wsum_ref[:], ((1,), (1,))) + dallhp_ref[0]
    dc_scr[:] = dc * sf
    dh0_ref[:] = dh_scr[:]  # revisited; the final write is dh0/dc0
    dc0_ref[:] = dc_scr[:]


def _dec_fwd_call(h0, c0, wsum, b, t):
    n, H = h0.shape

    def at_i(k):
        return (k, 0, 0)

    def const2(k):
        return (0, 0)

    full2 = functools.partial(pl.BlockSpec, index_map=const2,
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _dec_fwd_kernel,
        grid=(t,),
        out_shape=(
            jax.ShapeDtypeStruct((t, n, H), jnp.float32),
            jax.ShapeDtypeStruct((t, n, H), jnp.float32),
            jax.ShapeDtypeStruct((t, n, 4 * H), jnp.float32),
        ),
        in_specs=[full2((n, H)), full2((n, H)), full2(wsum.shape),
                  full2(b.shape)],
        out_specs=(_step3(n, H, at_i), _step3(n, H, at_i),
                   _step3(n, 4 * H, at_i)),
        scratch_shapes=[pltpu.VMEM((n, H), jnp.float32),
                        pltpu.VMEM((n, H), jnp.float32)],
        interpret=_interpret(),
        **_seq_params(),
    )(h0, c0, wsum, b)


def _dec_bwd_call(wsum, gates, allc, dallh):
    t, n, H = allc.shape

    def at_i(k):  # transition index i = t-1-k
        return (t - 1 - k, 0, 0)

    def at_prev(k):
        return (t - 2 - k, 0, 0)

    def const2(k):
        return (0, 0)

    full2 = functools.partial(pl.BlockSpec, index_map=const2,
                              memory_space=pltpu.VMEM)
    dgates, dh0, dc0 = pl.pallas_call(
        functools.partial(_dec_bwd_kernel, t),
        grid=(t - 1,),
        out_shape=(
            jax.ShapeDtypeStruct((t - 1, n, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((n, H), jnp.float32),
            jax.ShapeDtypeStruct((n, H), jnp.float32),
        ),
        in_specs=[_step3(n, 4 * H, at_i),   # gates[i]
                  _step3(n, H, at_prev),    # allc[i-1]
                  _step3(n, H, at_i),       # allc[i]
                  _step3(n, H, at_prev),    # dallh[i-1]
                  full2(wsum.shape),
                  full2((n, H))],           # dallh[t-1]
        out_specs=(
            pl.BlockSpec((1, n, 4 * H), at_prev,
                         memory_space=pltpu.VMEM),  # dgates slot i-1
            full2((n, H)), full2((n, H)),
        ),
        scratch_shapes=[pltpu.VMEM((n, H), jnp.float32),
                        pltpu.VMEM((n, H), jnp.float32)],
        interpret=_interpret(),
        **_seq_params(),
    )(gates, allc, allc, dallh, wsum, dallh[t - 1])
    return dgates, dh0, dc0


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def decoder_lstm(h0, c0, wsum, b, t):
    """Autoregressive decoder recurrence: state (h0, c0) after the
    latent-driven step 0, then t-1 steps of ``gates = h @ wsum + b``.
    Returns all hidden states (t, n, H) (allh[0] == h0)."""
    allh, _, _ = _dec_fwd_call(h0, c0, wsum, b, t)
    return allh


def _decoder_fwd(h0, c0, wsum, b, t):
    allh, allc, gates = _dec_fwd_call(h0, c0, wsum, b, t)
    return allh, (wsum, b, allh, allc, gates)


def _decoder_bwd(t, res, dallh):
    wsum, b, allh, allc, gates = res
    if t == 1:
        return dallh[0], jnp.zeros_like(allc[0]), jnp.zeros_like(wsum), \
            jnp.zeros_like(b)
    dgates, dh0, dc0 = _dec_bwd_call(wsum, gates, allc, dallh)
    n, H = dh0.shape
    # dwsum = sum_{i>=1} h_{i-1}^T dgates_i and db as XLA reductions
    A = allh[0:t - 1].reshape((t - 1) * n, H)
    B = dgates.reshape((t - 1) * n, 4 * H)
    dwsum = jnp.dot(A.T, B, preferred_element_type=jnp.float32)
    db = jnp.sum(B, axis=0).reshape(b.shape)
    return dh0, dc0, dwsum, db


decoder_lstm.defvjp(_decoder_fwd, _decoder_bwd)


def decoder_fits(t, n, H) -> bool:
    if not (isinstance(t, (int, np.integer))
            and isinstance(n, (int, np.integer))):
        return False  # symbolic dims (jax.export) -> scan path
    # per-step ledger (streamed); weights 2x-buffered under vmap
    words = (2 * 2 * 4 * H * H
             + 2 * n * (3 * 4 * H + 4 * H)  # gates/dgates x2 + h/c blocks
             + 2 * n * H                    # carries scratch
             + 6 * n * H)
    return words * 4 <= VMEM_BUDGET
