"""Shared model sub-structures: modality split, z->f feature MLPs, label
head, per-modality encoder/decoder trios, and MFN wiring.

These appear verbatim across every reference model class
(``mfm_model.py:502-520`` and siblings); here they exist once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from factorized_tpu.ops.core import mlp2_apply, mlp2_init, linear_init
from factorized_tpu.ops.lstm import decoder_init, encoder_init
from factorized_tpu.ops.mfn import mfn_apply, mfn_init


def split_modalities(x, input_dims):
    """x (..., d_total) -> (x_l, x_a, x_v) on the last axis."""
    d_l, d_a, d_v = input_dims
    return (
        x[..., :d_l],
        x[..., d_l : d_l + d_a],
        x[..., d_l + d_a :],
    )


def subkeys(key, n):
    return jax.random.split(key, n)


# ---- z -> f feature maps (relu(fc2(drop(relu(fc1(z)))))) ----------------

def zf_init(key, z_size, f_size, dtype=jnp.float32):
    return mlp2_init(key, z_size, f_size, f_size, dtype)


def zf_apply(params, z, drop, key, train):
    return jax.nn.relu(mlp2_apply(params, z, key=key, drop=drop, train=train))


# ---- label head (fc2(drop(relu(fc1(fy))))) ------------------------------

def yhead_init(key, fy_size, output_dim, dtype=jnp.float32):
    return mlp2_init(key, fy_size, fy_size, output_dim, dtype)


def yhead_apply(params, fy, drop, key, train):
    return mlp2_apply(params, fy, key=key, drop=drop, train=train)


# ---- trios --------------------------------------------------------------

def trio_encoder_init(key, cfg, dtype=jnp.float32):
    d_l, d_a, d_v = cfg.input_dims
    k = subkeys(key, 3)
    return {
        "encoder_l": encoder_init(k[0], d_l, cfg.zl_size, dtype),
        "encoder_a": encoder_init(k[1], d_a, cfg.za_size, dtype),
        "encoder_v": encoder_init(k[2], d_v, cfg.zv_size, dtype),
    }


def trio_decoder_init(key, cfg, dtype=jnp.float32):
    """Decoders driven by [fy, f_mod] concat (``mfm_model.py:495-497``)."""
    d_l, d_a, d_v = cfg.input_dims
    k = subkeys(key, 3)
    return {
        "decoder_l": decoder_init(k[0], cfg.fy_size + cfg.fl_size, d_l, dtype),
        "decoder_a": decoder_init(k[1], cfg.fy_size + cfg.fa_size, d_a, dtype),
        "decoder_v": decoder_init(k[2], cfg.fy_size + cfg.fv_size, d_v, dtype),
    }


def trio_zf_init(key, cfg, dtype=jnp.float32):
    k = subkeys(key, 4)
    return {
        "zy_to_fy": zf_init(k[0], cfg.zy_size, cfg.fy_size, dtype),
        "zl_to_fl": zf_init(k[1], cfg.zl_size, cfg.fl_size, dtype),
        "za_to_fa": zf_init(k[2], cfg.za_size, cfg.fa_size, dtype),
        "zv_to_fv": zf_init(k[3], cfg.zv_size, cfg.fv_size, dtype),
    }


def mfn_encoder_init(key, cfg, dtype=jnp.float32):
    """MFN trunk + the last_hs -> zy projection (``mfm_model.py:499-500``)."""
    k1, k2 = subkeys(key, 2)
    return {
        "mfn": mfn_init(
            k1,
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
        "last_to_zy": linear_init(k2, cfg.last_mfn_size, cfg.zy_size, dtype),
    }


def mfn_drops(cfg):
    return (cfg.att1_drop, cfg.att2_drop, cfg.gamma1_drop, cfg.gamma2_drop)


def run_mfn(params, x_l, x_a, x_v, cfg, key, train):
    return mfn_apply(
        params["mfn"],
        x_l,
        x_a,
        x_v,
        mem_dim=cfg.memsize,
        drops=mfn_drops(cfg),
        key=key,
        train=train,
    )
