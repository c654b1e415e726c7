"""Memory Fusion Network (MFN) encoder as one fused `lax.scan`.

Behavioral parity target: reference ``mfm_model.py:93-199`` — per
timestep, three per-modality ``LSTMCell``s advance; the previous and new
cell states concatenate into ``cStar`` (delta-memory window of 2); a
two-layer softmax attention (att1) re-weights ``cStar``; a tanh proposal
(att2) and two sigmoid gates (gamma1/gamma2) update a cross-modal memory
``mem = g1*mem + g2*cHat``. The encoder's output is
``[last_h_l, last_h_a, last_h_v, last_mem]`` (size sum(h_dims)+mem).

TPU-first redesign: all three modality LSTMs' input projections are
hoisted out of the scan into three large MXU matmuls over the whole
sequence; the scan carry holds (h,c) x3 + mem so the entire fusion step
is a single fused XLA loop body (the reference does ~10 python-level
cell/MLP calls per timestep, ``mfm_model.py:161-191``).

Dropout inside the four attention/gate MLPs draws a fresh mask per
timestep (as ``nn.Dropout`` does per call); keys are pre-split per step
and scanned alongside the inputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from factorized_tpu.ops.core import mlp2_apply, mlp2_init
from factorized_tpu.ops.lstm import lstm_cell_init, lstm_step


def mfn_init(
    key,
    input_dims,
    h_dims,
    mem_dim: int,
    window_dim: int,
    att1_shape: int,
    att2_shape: int,
    gamma1_shape: int,
    gamma2_shape: int,
    dtype=jnp.float32,
):
    d_l, d_a, d_v = input_dims
    dh_l, dh_a, dh_v = h_dims
    total_h = dh_l + dh_a + dh_v
    att_in = total_h * window_dim
    gamma_in = att_in + mem_dim
    keys = jax.random.split(key, 7)
    return {
        "lstm_l": lstm_cell_init(keys[0], d_l, dh_l, dtype),
        "lstm_a": lstm_cell_init(keys[1], d_a, dh_a, dtype),
        "lstm_v": lstm_cell_init(keys[2], d_v, dh_v, dtype),
        "att1": mlp2_init(keys[3], att_in, att1_shape, att_in, dtype),
        "att2": mlp2_init(keys[4], att_in, att2_shape, mem_dim, dtype),
        "gamma1": mlp2_init(keys[5], gamma_in, gamma1_shape, mem_dim, dtype),
        "gamma2": mlp2_init(keys[6], gamma_in, gamma2_shape, mem_dim, dtype),
    }


def mfn_apply(
    params,
    x_l,
    x_a,
    x_v,
    *,
    mem_dim: int,
    drops,  # (att1_drop, att2_drop, gamma1_drop, gamma2_drop)
    key=None,
    train: bool = False,
):
    """x_m are time-major (t, n, d_m). Returns last_hs (n, sum(h)+mem)."""
    t, n, _ = x_l.shape
    dh_l = params["lstm_l"]["wh"].shape[0]
    dh_a = params["lstm_a"]["wh"].shape[0]
    dh_v = params["lstm_v"]["wh"].shape[0]
    dtype = x_l.dtype

    def hoist(cell, x):
        tt, nn, d = x.shape
        h4 = cell["wx"].shape[1]
        return (x.reshape(tt * nn, d) @ cell["wx"]).reshape(tt, nn, h4) + cell["b"]

    xp_l = hoist(params["lstm_l"], x_l)
    xp_a = hoist(params["lstm_a"], x_a)
    xp_v = hoist(params["lstm_v"], x_v)

    if train:
        ks = jax.random.split(key, t * 4)
        step_keys = ks.reshape((t, 4) + ks.shape[1:])
    else:
        # placeholder of the right leading length for the scan (unused)
        step_keys = jnp.zeros((t, 4, 2), dtype=jnp.uint32)

    def step(carry, inputs):
        h_l, c_l, h_a, c_a, h_v, c_v, mem = carry
        xpl, xpa, xpv, ks = inputs

        new_h_l, new_c_l = lstm_step(c_l, xpl + h_l @ params["lstm_l"]["wh"])
        new_h_a, new_c_a = lstm_step(c_a, xpa + h_a @ params["lstm_a"]["wh"])
        new_h_v, new_c_v = lstm_step(c_v, xpv + h_v @ params["lstm_v"]["wh"])

        prev_cs = jnp.concatenate([c_l, c_a, c_v], axis=1)
        new_cs = jnp.concatenate([new_c_l, new_c_a, new_c_v], axis=1)
        c_star = jnp.concatenate([prev_cs, new_cs], axis=1)

        attention = jax.nn.softmax(
            mlp2_apply(params["att1"], c_star, key=ks[0], drop=drops[0], train=train),
            axis=1,
        )
        attended = attention * c_star
        c_hat = jnp.tanh(
            mlp2_apply(params["att2"], attended, key=ks[1], drop=drops[1], train=train)
        )
        both = jnp.concatenate([attended, mem], axis=1)
        g1 = jax.nn.sigmoid(
            mlp2_apply(params["gamma1"], both, key=ks[2], drop=drops[2], train=train)
        )
        g2 = jax.nn.sigmoid(
            mlp2_apply(params["gamma2"], both, key=ks[3], drop=drops[3], train=train)
        )
        mem = g1 * mem + g2 * c_hat

        return (new_h_l, new_c_l, new_h_a, new_c_a, new_h_v, new_c_v, mem), None

    init = (
        jnp.zeros((n, dh_l), dtype),
        jnp.zeros((n, dh_l), dtype),
        jnp.zeros((n, dh_a), dtype),
        jnp.zeros((n, dh_a), dtype),
        jnp.zeros((n, dh_v), dtype),
        jnp.zeros((n, dh_v), dtype),
        jnp.zeros((n, mem_dim), dtype),
    )
    from factorized_tpu.ops.lstm import TIME_UNROLL

    (h_l, _, h_a, _, h_v, _, mem), _ = jax.lax.scan(
        step, init, (xp_l, xp_a, xp_v, step_keys), unroll=TIME_UNROLL
    )
    return jnp.concatenate([h_l, h_a, h_v, mem], axis=1)
