"""Ablation models M_A..M_D (reference ``mfm_model.py:201-467``).

- M_A (201-269): one joint encoder over concatenated modalities -> zl,
  MFN -> zy; ALL three decoders driven by [fy, fl]; MMD on (zl, zy).
- M_B (271-343): per-modality encoders/decoders only, no zy/MFN; label
  head from [fl, fa, fv]; MMD on (zl, za, zv).
- M_C (345-403): MFN -> zy only; decoders all driven by fy; MMD on zy.
- M_D (405-467): discriminative-only; per-modality encoders -> f's ->
  linear label head; "reconstructions" are the inputs themselves.
"""

from __future__ import annotations

import jax.numpy as jnp

from factorized_tpu.models.common import (
    mfn_encoder_init,
    run_mfn,
    split_modalities,
    subkeys,
    trio_encoder_init,
    yhead_apply,
    yhead_init,
    zf_apply,
    zf_init,
)
from factorized_tpu.ops.core import linear_apply, linear_init
from factorized_tpu.ops.lstm import decoder_apply, decoder_init, encoder_apply, encoder_init
from factorized_tpu.ops.losses import loss_mmd


def m_a_init(key, cfg, dtype=jnp.float32):
    d_l, d_a, d_v = cfg.input_dims
    k = subkeys(key, 8)
    drive = cfg.fy_size + cfg.fl_size
    return {
        "encoder_l": encoder_init(k[0], cfg.d_total, cfg.zl_size, dtype),
        "decoder_l": decoder_init(k[1], drive, d_l, dtype),
        "decoder_a": decoder_init(k[2], drive, d_a, dtype),
        "decoder_v": decoder_init(k[3], drive, d_v, dtype),
        "mfn_enc": mfn_encoder_init(k[4], cfg, dtype),
        "zy_to_fy": zf_init(k[5], cfg.zy_size, cfg.fy_size, dtype),
        "zl_to_fl": zf_init(k[6], cfg.zl_size, cfg.fl_size, dtype),
        "fy_to_y": yhead_init(k[7], cfg.fy_size, cfg.output_dim, dtype),
    }


def m_a_apply(params, x, cfg, *, key, train=False):
    t = x.shape[0]
    x_l, x_a, x_v = split_modalities(x, cfg.input_dims)
    k = subkeys(key, 5)

    zl = encoder_apply(params["encoder_l"], x)
    mfn_last = run_mfn(params["mfn_enc"], x_l, x_a, x_v, cfg, k[0], train)
    zy = linear_apply(params["mfn_enc"]["last_to_zy"], mfn_last)
    km = subkeys(k[1], 2)
    mmd = loss_mmd(km[0], zl) + loss_mmd(km[1], zy)

    fy = zf_apply(params["zy_to_fy"], zy, cfg.zy_to_fy_dropout, k[2], train)
    fl = zf_apply(params["zl_to_fl"], zl, cfg.zl_to_fl_dropout, k[3], train)
    fyfl = jnp.concatenate([fy, fl], axis=1)

    x_l_hat = decoder_apply(params["decoder_l"], fyfl, t)
    x_a_hat = decoder_apply(params["decoder_a"], fyfl, t)
    x_v_hat = decoder_apply(params["decoder_v"], fyfl, t)
    y_hat = yhead_apply(params["fy_to_y"], fy, cfg.fy_to_y_dropout, k[4], train)
    return [x_l_hat, x_a_hat, x_v_hat, y_hat], mmd, 0.0


def m_b_init(key, cfg, dtype=jnp.float32):
    d_l, d_a, d_v = cfg.input_dims
    k = subkeys(key, 8)
    return {
        "enc": trio_encoder_init(k[0], cfg, dtype),
        "decoder_l": decoder_init(k[1], cfg.fl_size, d_l, dtype),
        "decoder_a": decoder_init(k[2], cfg.fa_size, d_a, dtype),
        "decoder_v": decoder_init(k[3], cfg.fv_size, d_v, dtype),
        "zl_to_fl": zf_init(k[4], cfg.zl_size, cfg.fl_size, dtype),
        "za_to_fa": zf_init(k[5], cfg.za_size, cfg.fa_size, dtype),
        "zv_to_fv": zf_init(k[6], cfg.zv_size, cfg.fv_size, dtype),
        # label head input is [fl, fa, fv] (mfm_model.py:313)
        "fy_to_y": {
            "fc1": linear_init(
                subkeys(k[7], 2)[0],
                cfg.fl_size + cfg.fa_size + cfg.fv_size,
                cfg.fy_size,
                dtype,
            ),
            "fc2": linear_init(subkeys(k[7], 2)[1], cfg.fy_size, cfg.output_dim, dtype),
        },
    }


def m_b_apply(params, x, cfg, *, key, train=False):
    t = x.shape[0]
    x_l, x_a, x_v = split_modalities(x, cfg.input_dims)
    k = subkeys(key, 5)

    zl = encoder_apply(params["enc"]["encoder_l"], x_l)
    za = encoder_apply(params["enc"]["encoder_a"], x_a)
    zv = encoder_apply(params["enc"]["encoder_v"], x_v)
    km = subkeys(k[0], 3)
    mmd = loss_mmd(km[0], zl) + loss_mmd(km[1], za) + loss_mmd(km[2], zv)

    fl = zf_apply(params["zl_to_fl"], zl, cfg.zl_to_fl_dropout, k[1], train)
    fa = zf_apply(params["za_to_fa"], za, cfg.za_to_fa_dropout, k[2], train)
    fv = zf_apply(params["zv_to_fv"], zv, cfg.zv_to_fv_dropout, k[3], train)

    x_l_hat = decoder_apply(params["decoder_l"], fl, t)
    x_a_hat = decoder_apply(params["decoder_a"], fa, t)
    x_v_hat = decoder_apply(params["decoder_v"], fv, t)
    fy = jnp.concatenate([fl, fa, fv], axis=1)
    y_hat = yhead_apply(params["fy_to_y"], fy, cfg.fy_to_y_dropout, k[4], train)
    return [x_l_hat, x_a_hat, x_v_hat, y_hat], mmd, 0.0


def m_c_init(key, cfg, dtype=jnp.float32):
    d_l, d_a, d_v = cfg.input_dims
    k = subkeys(key, 6)
    return {
        "decoder_l": decoder_init(k[0], cfg.fy_size, d_l, dtype),
        "decoder_a": decoder_init(k[1], cfg.fy_size, d_a, dtype),
        "decoder_v": decoder_init(k[2], cfg.fy_size, d_v, dtype),
        "mfn_enc": mfn_encoder_init(k[3], cfg, dtype),
        "zy_to_fy": zf_init(k[4], cfg.zy_size, cfg.fy_size, dtype),
        "fy_to_y": yhead_init(k[5], cfg.fy_size, cfg.output_dim, dtype),
    }


def m_c_apply(params, x, cfg, *, key, train=False):
    t = x.shape[0]
    x_l, x_a, x_v = split_modalities(x, cfg.input_dims)
    k = subkeys(key, 4)

    mfn_last = run_mfn(params["mfn_enc"], x_l, x_a, x_v, cfg, k[0], train)
    zy = linear_apply(params["mfn_enc"]["last_to_zy"], mfn_last)
    mmd = loss_mmd(k[1], zy)
    fy = zf_apply(params["zy_to_fy"], zy, cfg.zy_to_fy_dropout, k[2], train)

    x_l_hat = decoder_apply(params["decoder_l"], fy, t)
    x_a_hat = decoder_apply(params["decoder_a"], fy, t)
    x_v_hat = decoder_apply(params["decoder_v"], fy, t)
    y_hat = yhead_apply(params["fy_to_y"], fy, cfg.fy_to_y_dropout, k[3], train)
    return [x_l_hat, x_a_hat, x_v_hat, y_hat], mmd, 0.0


def m_d_init(key, cfg, dtype=jnp.float32):
    k = subkeys(key, 5)
    return {
        "enc": trio_encoder_init(k[0], cfg, dtype),
        "zl_to_fl": zf_init(k[1], cfg.zl_size, cfg.fl_size, dtype),
        "za_to_fa": zf_init(k[2], cfg.za_size, cfg.fa_size, dtype),
        "zv_to_fv": zf_init(k[3], cfg.zv_size, cfg.fv_size, dtype),
        "fs_to_y": linear_init(
            k[4], cfg.fl_size + cfg.fa_size + cfg.fv_size, cfg.output_dim, dtype
        ),
    }


def m_d_apply(params, x, cfg, *, key, train=False):
    x_l, x_a, x_v = split_modalities(x, cfg.input_dims)
    k = subkeys(key, 3)

    zl = encoder_apply(params["enc"]["encoder_l"], x_l)
    za = encoder_apply(params["enc"]["encoder_a"], x_a)
    zv = encoder_apply(params["enc"]["encoder_v"], x_v)

    fl = zf_apply(params["zl_to_fl"], zl, cfg.zl_to_fl_dropout, k[0], train)
    fa = zf_apply(params["za_to_fa"], za, cfg.za_to_fa_dropout, k[1], train)
    fv = zf_apply(params["zv_to_fv"], zv, cfg.zv_to_fv_dropout, k[2], train)

    fs = jnp.concatenate([fl, fa, fv], axis=1)
    y_hat = linear_apply(params["fs_to_y"], fs)
    # "reconstructions" are the inputs (discriminative-only ablation)
    return [x_l, x_a, x_v, y_hat], 0.0, 0.0
