"""Baselines and missing-modality comparison models.

- seq2seq (reference ``mfm_model.py:887-958``): cross-modal translation
  only — reconstruct each modality from the other two; MMD on the
  surrogate latents; no label head.
- basic_missing (``mfm_model.py:960-1017``): predict the label directly
  from two-modality encoders, MMD-regularized; three separate heads.
- EFLSTM (``test_mosi.py:130-156``): early-fusion LSTM baseline.
- MFN predictor (``test_mosi.py:158-265``): the CVPR'18 MFN with its own
  output MLP, used as a standalone predictor.
- SelfAttention (``test_attention.py:266-306``): learned per-timestep
  scale times the x.x^T Gram matrix re-weights the sequence before an
  LSTM head. (The reference leaves ``alpha`` UNINITIALIZED memory —
  ``torch.Tensor(t,1)``; we use U(-1/sqrt(t), 1/sqrt(t)).)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from factorized_tpu.models.common import (
    mfn_drops,
    split_modalities,
    subkeys,
    zf_apply,
    zf_init,
)
from factorized_tpu.ops.core import (
    dropout,
    linear_apply,
    linear_init,
    mlp2_apply,
    mlp2_init,
    uniform_fan_in,
)
from factorized_tpu.ops.lstm import (
    decoder_apply,
    decoder_init,
    encoder_apply,
    encoder_init,
    lstm_cell_init,
    lstm_scan,
)
from factorized_tpu.ops.losses import loss_mmd
from factorized_tpu.ops.mfn import mfn_apply, mfn_init


# ------------------------------------------------------------- seq2seq

def seq2seq_init(key, cfg, dtype=jnp.float32):
    d_l, d_a, d_v = cfg.input_dims
    k = subkeys(key, 9)
    return {
        "encoder_la_to_v": encoder_init(k[0], d_l + d_a, cfg.zv_size, dtype),
        "encoder_lv_to_a": encoder_init(k[1], d_l + d_v, cfg.za_size, dtype),
        "encoder_av_to_l": encoder_init(k[2], d_a + d_v, cfg.zl_size, dtype),
        "decoder_l": decoder_init(k[3], cfg.fl_size, d_l, dtype),
        "decoder_a": decoder_init(k[4], cfg.fa_size, d_a, dtype),
        "decoder_v": decoder_init(k[5], cfg.fv_size, d_v, dtype),
        "zl_to_fl": zf_init(k[6], cfg.zl_size, cfg.fl_size, dtype),
        "za_to_fa": zf_init(k[7], cfg.za_size, cfg.fa_size, dtype),
        "zv_to_fv": zf_init(k[8], cfg.zv_size, cfg.fv_size, dtype),
    }


def seq2seq_apply(params, x, cfg, *, key, train=False):
    t = x.shape[0]
    x_l, x_a, x_v = split_modalities(x, cfg.input_dims)
    k = subkeys(key, 4)

    zv_nov = encoder_apply(params["encoder_la_to_v"], jnp.concatenate([x_l, x_a], 2))
    za_noa = encoder_apply(params["encoder_lv_to_a"], jnp.concatenate([x_l, x_v], 2))
    zl_nol = encoder_apply(params["encoder_av_to_l"], jnp.concatenate([x_a, x_v], 2))

    km = subkeys(k[0], 3)
    mmd = loss_mmd(km[0], zv_nov) + loss_mmd(km[1], za_noa) + loss_mmd(km[2], zl_nol)

    fl = zf_apply(params["zl_to_fl"], zl_nol, cfg.zl_to_fl_dropout, k[1], train)
    fa = zf_apply(params["za_to_fa"], za_noa, cfg.za_to_fa_dropout, k[2], train)
    fv = zf_apply(params["zv_to_fv"], zv_nov, cfg.zv_to_fv_dropout, k[3], train)

    x_l_hat_nol = decoder_apply(params["decoder_l"], fl, t)
    x_a_hat_noa = decoder_apply(params["decoder_a"], fa, t)
    x_v_hat_nov = decoder_apply(params["decoder_v"], fv, t)
    return [x_l_hat_nol], [x_a_hat_noa], [x_v_hat_nov], mmd


# -------------------------------------------------------- basic_missing

def basic_missing_init(key, cfg, dtype=jnp.float32):
    d_l, d_a, d_v = cfg.input_dims
    k = subkeys(key, 6)
    return {
        "encoder_la_to_y": encoder_init(k[0], d_l + d_a, cfg.zy_size, dtype),
        "encoder_lv_to_y": encoder_init(k[1], d_l + d_v, cfg.zy_size, dtype),
        "encoder_av_to_y": encoder_init(k[2], d_a + d_v, cfg.zy_size, dtype),
        "zy_nol_to_y": mlp2_init(k[3], cfg.zy_size, cfg.fy_size, cfg.output_dim, dtype),
        "zy_noa_to_y": mlp2_init(k[4], cfg.zy_size, cfg.fy_size, cfg.output_dim, dtype),
        "zy_nov_to_y": mlp2_init(k[5], cfg.zy_size, cfg.fy_size, cfg.output_dim, dtype),
    }


def basic_missing_apply(params, x, cfg, *, key, train=False):
    x_l, x_a, x_v = split_modalities(x, cfg.input_dims)
    k = subkeys(key, 4)

    zy_nov = encoder_apply(params["encoder_la_to_y"], jnp.concatenate([x_l, x_a], 2))
    zy_noa = encoder_apply(params["encoder_lv_to_y"], jnp.concatenate([x_l, x_v], 2))
    zy_nol = encoder_apply(params["encoder_av_to_y"], jnp.concatenate([x_a, x_v], 2))

    km = subkeys(k[0], 3)
    mmd = loss_mmd(km[0], zy_nov) + loss_mmd(km[1], zy_noa) + loss_mmd(km[2], zy_nol)

    drop = cfg.zy_to_fy_dropout  # the reference reuses this rate for all 3
    y_hat_nol = mlp2_apply(params["zy_nol_to_y"], zy_nol, key=k[1], drop=drop, train=train)
    y_hat_noa = mlp2_apply(params["zy_noa_to_y"], zy_noa, key=k[2], drop=drop, train=train)
    y_hat_nov = mlp2_apply(params["zy_nov_to_y"], zy_nov, key=k[3], drop=drop, train=train)
    return y_hat_nol, y_hat_noa, y_hat_nov, mmd


# --------------------------------------------------------------- EFLSTM

def eflstm_init(key, d, h, output_dim, dtype=jnp.float32):
    k = subkeys(key, 3)
    return {
        "lstm": lstm_cell_init(k[0], d, h, dtype),
        "fc1": linear_init(k[1], h, h, dtype),
        "fc2": linear_init(k[2], h, output_dim, dtype),
    }


def eflstm_apply(params, x, drop, *, key, train=False):
    """x (t, n, d) -> logits (n, output_dim)."""
    _, h_last, _ = lstm_scan(params["lstm"], x)
    out = jax.nn.relu(linear_apply(params["fc1"], h_last))
    out = dropout(key, out, drop, train)
    return linear_apply(params["fc2"], out)


# -------------------------------------------------------- MFN predictor

def mfn_predictor_init(key, cfg, dtype=jnp.float32):
    k = subkeys(key, 2)
    return {
        "mfn": mfn_init(
            k[0],
            cfg.input_dims,
            cfg.h_dims,
            cfg.memsize,
            cfg.windowsize,
            cfg.att1_shape,
            cfg.att2_shape,
            cfg.gamma1_shape,
            cfg.gamma2_shape,
            dtype,
        ),
        "out": mlp2_init(k[1], cfg.last_mfn_size, cfg.out_shape, cfg.output_dim, dtype),
    }


def mfn_predictor_apply(params, x, cfg, *, key, train=False):
    x_l, x_a, x_v = split_modalities(x, cfg.input_dims)
    k = subkeys(key, 2)
    last_hs = mfn_apply(
        params["mfn"],
        x_l,
        x_a,
        x_v,
        mem_dim=cfg.memsize,
        drops=mfn_drops(cfg),
        key=k[0],
        train=train,
    )
    return mlp2_apply(params["out"], last_hs, key=k[1], drop=cfg.out_drop, train=train)


# -------------------------------------------------------- SelfAttention

def self_attention_init(key, d, h, t, output_dim, dtype=jnp.float32):
    k = subkeys(key, 4)
    return {
        "alpha": uniform_fan_in(k[0], (t, 1), t, dtype),
        "lstm": lstm_cell_init(k[1], d, h, dtype),
        "fc1": linear_init(k[2], h, h, dtype),
        "fc2": linear_init(k[3], h, output_dim, dtype),
    }


def self_attention_apply(params, x, drop, *, key, train=False):
    """x is BATCH-major (n, t, d) — the reference keeps this path
    batch-major (``test_attention.py:344``)."""
    n, t, d = x.shape
    gram = jnp.einsum("ntd,nsd->nts", x, x)  # (n, t, t)
    alphas = jnp.broadcast_to(params["alpha"], (t, t))
    attention = alphas * gram
    x = jnp.einsum("nts,nsd->ntd", attention, x)
    x = jnp.transpose(x, (1, 0, 2))  # -> time-major
    _, h_last, _ = lstm_scan(params["lstm"], x)
    out = jax.nn.relu(linear_apply(params["fc1"], h_last))
    out = dropout(key, out, drop, train)
    return linear_apply(params["fc2"], out)
