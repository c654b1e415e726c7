"""Block-diagonal fusion of independent LSTM recurrences.

The MFM forward runs up to 10 independent LSTM chains (3 unimodal
encoders, MFN's 3 modality cells, 3 decoders, plus surrogate encoders in
the missing-modality model; reference ``mfm_model.py:522-555``). Naively
that is 7+ serialized ``lax.scan`` while-loops of tiny matmuls — on TPU
the step cost is per-op overhead, not FLOPs.

This module fuses k independent cells into ONE scan whose per-step
recurrent matmul is a single block-diagonal GEMM over the concatenated
hidden state:

- weights stay per-cell in the param pytree (checkpoint/parity
  unchanged); the block-diagonal matrix is assembled inside jit from
  the blocks (gradients scatter back automatically);
- gate layout is GATE-MAJOR: columns [i-all-cells | f | g | o], so the
  fused pre-activations feed the same ``lstm_step`` used everywhere,
  on concatenated (h, c) carries;
- input projections remain hoisted per-cell (large parallel MXU
  matmuls over the whole sequence), then get re-packed gate-major.

Math is bit-identical to the unfused path up to float reassociation;
``tests/test_fused.py`` asserts equivalence.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from factorized_tpu.ops.lstm import lstm_step

# Pallas kernel dispatch: None = auto (TPU backend + fits VMEM budget),
# True = force (interpret mode off-TPU, for tests), False = never.
USE_PALLAS = None


def _pallas_ok(fits: bool) -> bool:
    if USE_PALLAS is False:
        return False
    if USE_PALLAS is True:
        return True
    import jax as _jax

    return fits and _jax.default_backend() == "tpu"


def blockdiag(mats: Sequence[jnp.ndarray], cols: Sequence[int]):
    """Plain block-diagonal assembly via pad+concat.

    Each block is padded to the full column width at its offset and the
    row strips concatenated — XLA lowers this to ONE write of the output
    buffer. The equivalent dynamic_update_slice chain into a zeros
    buffer is NOT fused inside the whole-epoch program: the optimized
    HLO keeps one full-buffer DUS op per block (measured r4,
    scripts/dus_attribution_probe.py — 5.7 ms/epoch, ~35% of the
    16.5 ms device epoch, all from weight assembly)."""
    c_tot = sum(cols)
    strips = []
    c = 0
    for m, cc in zip(mats, cols):
        strips.append(jnp.pad(m, ((0, 0), (c, c_tot - c - cc))))
        c += cc
    return jnp.concatenate(strips, axis=0)


def gate_major_blockdiag(mats: Sequence[jnp.ndarray], h_dims: Sequence[int]):
    """Per-cell (d_i, 4*h_i) weights -> (sum_d, 4*sum_h) block-diagonal
    with gate-major column layout. Pad+concat, not a DUS chain — see
    ``blockdiag``."""
    h_tot = sum(h_dims)
    strips = []
    col = 0
    for m, h in zip(mats, h_dims):
        gates = [
            jnp.pad(m[:, g * h : (g + 1) * h],
                    ((0, 0), (col, h_tot - col - h)))
            for g in range(4)
        ]
        strips.append(jnp.concatenate(gates, axis=1))
        col += h
    return jnp.concatenate(strips, axis=0)


def gate_major_bias(biases: Sequence[jnp.ndarray], h_dims: Sequence[int]):
    parts = []
    for g in range(4):
        parts.extend(b[g * h : (g + 1) * h] for b, h in zip(biases, h_dims))
    return jnp.concatenate(parts)


def repack_gate_major(xprojs: Sequence[jnp.ndarray], h_dims: Sequence[int]):
    """Per-cell hoisted projections (t, n, 4*h_i) -> (t, n, 4*sum_h)
    gate-major."""
    parts = []
    for g in range(4):
        parts.extend(
            xp[..., g * h : (g + 1) * h] for xp, h in zip(xprojs, h_dims)
        )
    return jnp.concatenate(parts, axis=-1)


def hoist_xproj(cell, x):
    t, n, d = x.shape
    h4 = cell["wx"].shape[1]
    return (x.reshape(t * n, d) @ cell["wx"]).reshape(t, n, h4) + cell["b"]


def split_heads(h_cat, h_dims: Sequence[int]) -> List[jnp.ndarray]:
    outs = []
    o = 0
    for h in h_dims:
        outs.append(h_cat[..., o : o + h])
        o += h
    return outs


def fused_lstm_scan(cells: Sequence[dict], xs: Sequence[jnp.ndarray]):
    """Run k independent LSTMs as one scan.

    cells: list of {'wx','wh','b'}; xs: list of (t, n, d_i) inputs.
    Returns list of last hidden states [(n, h_i)].
    """
    h_dims = [c["wh"].shape[0] for c in cells]
    h_tot = sum(h_dims)
    t, n, _ = xs[0].shape
    dtype = xs[0].dtype

    xp = repack_gate_major(
        [hoist_xproj(c, x) for c, x in zip(cells, xs)], h_dims
    )
    wh_bd = gate_major_blockdiag([c["wh"] for c in cells], h_dims)

    from factorized_tpu.ops import pallas_lstm

    if _pallas_ok(pallas_lstm.multi_lstm_fits(t, n, h_tot)):
        h_last = pallas_lstm.multi_lstm(xp, wh_bd)
        return split_heads(h_last, h_dims)

    def step(carry, xp_t):
        h, c = carry
        h, c = lstm_step(c, xp_t + h @ wh_bd)
        return (h, c), None

    init = (jnp.zeros((n, h_tot), dtype), jnp.zeros((n, h_tot), dtype))
    (h_last, _), _ = jax.lax.scan(step, init, xp)
    return split_heads(h_last, h_dims)


def fused_decoder_scan(dec_params: Sequence[dict], hTs: Sequence[jnp.ndarray],
                       t: int):
    """k autoregressive decoders (``mfm_model.py:64-91`` semantics) as
    one scan + one block output projection.

    dec_params: list of {'lstm': cell, 'fc1': linear}; hTs: list of
    (n, h_i) latents (h_i == cell hidden size). Returns list of
    (t, n, d_i) reconstructions.
    """
    cells = [p["lstm"] for p in dec_params]
    h_dims = [c["wh"].shape[0] for c in cells]
    h_tot = sum(h_dims)
    n = hTs[0].shape[0]
    dtype = hTs[0].dtype

    # step 0: input hT, state 0 — h@wh term vanishes
    wx_bd = gate_major_blockdiag([c["wx"] for c in cells], h_dims)
    b_cat = gate_major_bias([c["b"] for c in cells], h_dims)
    hT_cat = jnp.concatenate(hTs, axis=1)
    gates0 = hT_cat @ wx_bd + b_cat
    h0, c0 = lstm_step(jnp.zeros((n, h_tot), dtype), gates0)

    # steps >= 1: input == previous hidden -> single (W_x + W_h) GEMM
    wsum_bd = gate_major_blockdiag(
        [c["wx"] + c["wh"] for c in cells], h_dims
    )

    from factorized_tpu.ops import pallas_lstm

    if t > 1 and _pallas_ok(pallas_lstm.decoder_fits(t, n, h_tot)):
        all_h = pallas_lstm.decoder_lstm(
            h0, c0, wsum_bd, b_cat.reshape(1, -1), t
        )
    elif t > 1:
        def step(carry, _):
            h, c = carry
            h, c = lstm_step(c, h @ wsum_bd + b_cat)
            return (h, c), h

        _, rest = jax.lax.scan(step, (h0, c0), None, length=t - 1)
        all_h = jnp.concatenate([h0[None], rest], axis=0)  # (t, n, h_tot)
    else:
        all_h = h0[None]

    # one block-diagonal output projection (h_tot, sum_d)
    d_dims = [p["fc1"]["w"].shape[1] for p in dec_params]
    d_tot = sum(d_dims)
    w_out = blockdiag([p["fc1"]["w"] for p in dec_params], d_dims)
    b_out = jnp.concatenate([p["fc1"]["b"] for p in dec_params])
    recon = (all_h.reshape(t * n, h_tot) @ w_out + b_out).reshape(t, n, d_tot)
    return split_heads(recon, d_dims)


def _mlp2_pair_merged(p1, p2, x, drops, keys, train):
    """gamma1/gamma2 share their input (``mfm_model.py:178-179``), so
    their fc1s run as ONE concatenated GEMM and fc2s as one block-diag
    GEMM; dropout rates/keys stay per-MLP on slices."""
    s1 = p1["fc1"]["w"].shape[1]
    w1 = jnp.concatenate([p1["fc1"]["w"], p2["fc1"]["w"]], axis=1)
    b1 = jnp.concatenate([p1["fc1"]["b"], p2["fc1"]["b"]])
    h = jax.nn.relu(x @ w1 + b1)
    h1, h2 = h[..., :s1], h[..., s1:]
    if train:
        from factorized_tpu.ops.core import dropout, rate_active

        if rate_active(drops[0], train):
            h1 = dropout(keys[0], h1, drops[0], train)
        if rate_active(drops[1], train):
            h2 = dropout(keys[1], h2, drops[1], train)
    o1 = h1 @ p1["fc2"]["w"] + p1["fc2"]["b"]
    o2 = h2 @ p2["fc2"]["w"] + p2["fc2"]["b"]
    return o1, o2


def fused_mfm_encode(enc_cells, mfn_params, x_l, x_a, x_v, *, mem_dim,
                     drops, key=None, train=False):
    """The entire MFM encode stage — 3 unimodal encoder LSTMs + the
    MFN's 3 modality LSTMs + delta-memory attention — as ONE scan.

    The fused carry is ordered [enc_l, enc_a, enc_v, mfn_l, mfn_a,
    mfn_v], so the MFN's ``prev_cs``/``new_cs`` concatenation
    (``mfm_model.py:171-173``) is literally a slice of the fused cell
    state. Returns ([enc_h_l, enc_h_a, enc_h_v], mfn_last_hs).
    """
    from factorized_tpu.ops.core import mlp2_apply

    mfn_cells = [mfn_params["lstm_l"], mfn_params["lstm_a"],
                 mfn_params["lstm_v"]]
    cells = list(enc_cells) + mfn_cells
    xs = [x_l, x_a, x_v, x_l, x_a, x_v]
    h_dims = [c["wh"].shape[0] for c in cells]
    z_tot = sum(h_dims[:3])
    h_tot = sum(h_dims)
    t, n, _ = x_l.shape
    dtype = x_l.dtype

    xp = repack_gate_major(
        [hoist_xproj(c, x) for c, x in zip(cells, xs)], h_dims
    )
    wh_bd = gate_major_blockdiag([c["wh"] for c in cells], h_dims)

    from factorized_tpu.ops import pallas_mfn

    att_in = 2 * sum(h_dims[3:])
    site_sizes = (
        mfn_params["att1"]["fc1"]["w"].shape[1],
        mfn_params["att2"]["fc1"]["w"].shape[1],
        mfn_params["gamma1"]["fc1"]["w"].shape[1],
        mfn_params["gamma2"]["fc1"]["w"].shape[1],
    )
    widths = [
        att_in * site_sizes[0],
        att_in * site_sizes[1],
        (att_in + mem_dim) * (site_sizes[2] + site_sizes[3]),
    ]
    # masks only exist when training with at least one nonzero rate
    # (traced rates count as nonzero: the value is run-time data)
    from factorized_tpu.ops.core import rate_active

    use_masks = (train and key is not None
                 and any(rate_active(d, train) for d in drops))
    mask_words = t * n * sum(site_sizes) if use_masks else 0
    if _pallas_ok(pallas_mfn.encode_fits(t, n, h_tot, mem_dim, att_in,
                                         widths, mask_words)):
        def b2(p):
            return p["b"].reshape(1, -1)

        weights = {
            "wh": wh_bd,
            "a1w1": mfn_params["att1"]["fc1"]["w"],
            "a1b1": b2(mfn_params["att1"]["fc1"]),
            "a1w2": mfn_params["att1"]["fc2"]["w"],
            "a1b2": b2(mfn_params["att1"]["fc2"]),
            "a2w1": mfn_params["att2"]["fc1"]["w"],
            "a2b1": b2(mfn_params["att2"]["fc1"]),
            "a2w2": mfn_params["att2"]["fc2"]["w"],
            "a2b2": b2(mfn_params["att2"]["fc2"]),
            "gw1": jnp.concatenate([mfn_params["gamma1"]["fc1"]["w"],
                                    mfn_params["gamma2"]["fc1"]["w"]],
                                   axis=1),
            "gb1": jnp.concatenate([b2(mfn_params["gamma1"]["fc1"]),
                                    b2(mfn_params["gamma2"]["fc1"])],
                                   axis=1),
            "g1w2": mfn_params["gamma1"]["fc2"]["w"],
            "g1b2": b2(mfn_params["gamma1"]["fc2"]),
            "g2w2": mfn_params["gamma2"]["fc2"]["w"],
            "g2b2": b2(mfn_params["gamma2"]["fc2"]),
        }
        s3 = weights["g1w2"].shape[0]
        sizes = (weights["a1w1"].shape[1], weights["a2w1"].shape[1],
                 s3, weights["gw1"].shape[1] - s3)
        if use_masks:
            masks = pallas_mfn.make_dropout_masks(key, t, n, sizes, drops)
        else:
            masks = jnp.zeros((1, 1, 1), jnp.float32)
        h_last, mem = pallas_mfn.mfm_encode_pallas(
            xp, masks, weights, z_tot, use_masks
        )
        enc_hs = split_heads(h_last[:, :z_tot], h_dims[:3])
        return enc_hs, jnp.concatenate([h_last[:, z_tot:], mem], axis=1)

    if train:
        ks = jax.random.split(key, t * 4)
        step_keys = ks.reshape((t, 4) + ks.shape[1:])
    else:
        step_keys = jnp.zeros((t, 4, 2), dtype=jnp.uint32)

    def step(carry, inputs):
        h, c, mem = carry
        xp_t, kst = inputs
        new_h, new_c = lstm_step(c, xp_t + h @ wh_bd)

        prev_cs = c[:, z_tot:]
        new_cs = new_c[:, z_tot:]
        c_star = jnp.concatenate([prev_cs, new_cs], axis=1)
        attention = jax.nn.softmax(
            mlp2_apply(mfn_params["att1"], c_star, key=kst[0],
                       drop=drops[0], train=train),
            axis=1,
        )
        attended = attention * c_star
        c_hat = jnp.tanh(
            mlp2_apply(mfn_params["att2"], attended, key=kst[1],
                       drop=drops[1], train=train)
        )
        both = jnp.concatenate([attended, mem], axis=1)
        g1, g2 = _mlp2_pair_merged(
            mfn_params["gamma1"], mfn_params["gamma2"], both,
            (drops[2], drops[3]), (kst[2], kst[3]), train
        )
        mem = jax.nn.sigmoid(g1) * mem + jax.nn.sigmoid(g2) * c_hat
        return (new_h, new_c, mem), None

    init = (
        jnp.zeros((n, h_tot), dtype),
        jnp.zeros((n, h_tot), dtype),
        jnp.zeros((n, mem_dim), dtype),
    )
    (h_last, _, mem), _ = jax.lax.scan(step, init, (xp, step_keys))
    enc_hs = split_heads(h_last[:, :z_tot], h_dims[:3])
    mfn_last = jnp.concatenate([h_last[:, z_tot:], mem], axis=1)
    return enc_hs, mfn_last
