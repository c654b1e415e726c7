"""LSTM encoder / autoregressive decoder as `lax.scan` programs.

Behavioral parity targets:
- ``encoderLSTM`` (reference ``mfm_model.py:40-62``): a single
  ``nn.LSTMCell`` unrolled over ``t`` python-loop steps on time-major
  ``t x n x d`` input; returns ``fc1(last_h)``.
- ``decoderLSTM`` (reference ``mfm_model.py:64-91``): autoregressive
  cell whose step-0 input is the latent ``hT`` and whose step-i input
  is the *previous hidden state*; every hidden state maps through
  ``fc1`` to a ``d``-dim reconstruction, stacked to ``t x n x d``.

TPU-first redesign (NOT a translation):
- Encoder: the input projection ``x_t @ W_x`` for ALL timesteps is
  hoisted out of the recurrence into one large ``(t*n, d) @ (d, 4h)``
  MXU matmul; the scan body only does the ``h @ W_h`` matmul plus
  fused element-wise gate math.
- Decoder: because the step-i input *is* the step-(i-1) hidden state,
  the two per-step matmuls collapse into one: for i >= 1,
  ``gates = h_{i-1} @ (W_x + W_h) + b`` — half the recurrent FLOPs of a
  naive port. The output projection for all timesteps is hoisted into a
  single ``(t*n, h) @ (h, d)`` matmul after the scan.

Gate order is ``[i, f, g, o]`` along the 4h axis (torch ``LSTMCell``
layout), so reference checkpoints map over by a single transpose.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from factorized_tpu.ops.core import linear_apply, linear_init, uniform_fan_in

# Unroll factor for the time-dimension scans. Measured on v5e at MFM
# size: rolled (False) wins in the whole-epoch program (230 steps/s vs
# 22 with full unroll — unrolled bodies inside the batch scan blow up
# scheduling); keep rolled and fuse chains via ops/fused.py instead.
TIME_UNROLL = False


def lstm_cell_init(key, d: int, h: int, dtype=jnp.float32):
    """One LSTM cell: W_x (d,4h), W_h (h,4h), b (4h).

    torch keeps separate b_ih/b_hh, both U(-1/sqrt(h),1/sqrt(h)) and
    always summed; we store their sum as a single bias drawn from the
    sum-distribution's factors (two independent uniforms added)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "wx": uniform_fan_in(k1, (d, 4 * h), h, dtype),
        "wh": uniform_fan_in(k2, (h, 4 * h), h, dtype),
        # sum of torch's b_ih + b_hh (each uniform with bound 1/sqrt(h))
        "b": uniform_fan_in(k3, (4 * h,), h, dtype)
        + uniform_fan_in(k4, (4 * h,), h, dtype),
    }


def lstm_step(c_prev, gates):
    """Element-wise LSTM gate math given pre-activation gates.

    ``gates = x @ W_x + h_prev @ W_h + b`` is computed by the caller so
    that input projections can be hoisted/fused; gate order [i,f,g,o].
    """
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c_prev + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return h, c


def lstm_scan(cell, x):
    """Run an LSTM over time-major input ``x (t, n, d)``.

    Returns (all_h (t,n,h), last_h (n,h), last_c (n,h)). The input
    projection for every timestep is one big MXU matmul.
    """
    t, n, d = x.shape
    h_dim = cell["wh"].shape[0]
    xproj = (x.reshape(t * n, d) @ cell["wx"]).reshape(t, n, 4 * h_dim) + cell["b"]

    def step(carry, xp_t):
        h, c = carry
        gates = xp_t + h @ cell["wh"]
        h, c = lstm_step(c, gates)
        return (h, c), h

    init = (
        jnp.zeros((n, h_dim), x.dtype),
        jnp.zeros((n, h_dim), x.dtype),
    )
    (h_last, c_last), all_h = jax.lax.scan(step, init, xproj,
                                           unroll=TIME_UNROLL)
    return all_h, h_last, c_last


def encoder_init(key, d: int, h: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "lstm": lstm_cell_init(k1, d, h, dtype),
        "fc1": linear_init(k2, h, h, dtype),
    }


def encoder_apply(params, x):
    """x (t, n, d) -> latent (n, h): fc1 of the last hidden state."""
    _, h_last, _ = lstm_scan(params["lstm"], x)
    return linear_apply(params["fc1"], h_last)


def decoder_init(key, h: int, d: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "lstm": lstm_cell_init(k1, h, h, dtype),
        "fc1": linear_init(k2, h, d, dtype),
    }


def decoder_apply(params, hT, t: int):
    """Autoregressive decode: hT (n, h) -> reconstructions (t, n, d)."""
    cell = params["lstm"]
    n, h_dim = hT.shape
    zeros = jnp.zeros((n, h_dim), hT.dtype)

    # Step 0: input hT, state (0, 0) — the h@W_h term vanishes.
    gates0 = hT @ cell["wx"] + cell["b"]
    h0, c0 = lstm_step(zeros, gates0)

    # Steps >= 1: input == previous hidden state, so the two matmuls
    # fuse into one against (W_x + W_h).
    w_sum = cell["wx"] + cell["wh"]

    def step(carry, _):
        h, c = carry
        gates = h @ w_sum + cell["b"]
        h, c = lstm_step(c, gates)
        return (h, c), h

    if t > 1:
        _, rest = jax.lax.scan(step, (h0, c0), None, length=t - 1,
                               unroll=TIME_UNROLL)
        all_h = jnp.concatenate([h0[None], rest], axis=0)
    else:
        all_h = h0[None]

    # Hoisted output projection: one (t*n, h) @ (h, d) matmul.
    d_out = params["fc1"]["w"].shape[1]
    return linear_apply(params["fc1"], all_h.reshape(t * n, h_dim)).reshape(
        t, n, d_out
    )
