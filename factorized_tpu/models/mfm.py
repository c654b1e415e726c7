"""The MFM family: MFM (MMD), MFM_KL / MFM_KL_EF (variational), and
MFM_missing (surrogate encoders for missing modalities).

Parity targets (all in reference ``mfm_model.py``):
- MFM:        469-555  — 3 unimodal encoders -> zl/za/zv, MFN -> zy,
              MMD on all four latents, z->f MLPs, decoders on [fy,f_m],
              label head fy -> y.
- MFM_KL_EF:  557-660  — mu/logvar heads per latent, zy from a joint
              early-fusion encoder; KLD loss; decodes from the MEAN
              (no reparameterization sampling — reproduced as-is).
- MFM_KL:     662-764  — like MFM_KL_EF but zy comes from the MFN.
- MFM_missing:766-885  — six surrogate encoders infer a missing
              modality's latent from the other two; missing_loss is six
              MSE terms; decodes 4 ways (all-present + one-missing x3).

Apply returns mirror the reference forward returns:
``(decoded, reg_loss, missing_loss)`` where
``decoded = [x_l_hat, x_a_hat, x_v_hat, y_hat]`` (and MFM_missing adds
``decoded_nol/noa/nov``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from factorized_tpu.models.common import (
    mfn_encoder_init,
    run_mfn,
    split_modalities,
    subkeys,
    trio_decoder_init,
    trio_encoder_init,
    trio_zf_init,
    yhead_apply,
    yhead_init,
    zf_apply,
)
from factorized_tpu.ops.core import linear_apply, linear_init
from factorized_tpu.ops.fused import (
    fused_decoder_scan,
    fused_lstm_scan,
    fused_mfm_encode,
)
from factorized_tpu.ops.lstm import decoder_apply, encoder_apply, encoder_init
from factorized_tpu.ops.losses import l2_loss, loss_kld
from factorized_tpu.models.common import mfn_drops

# Block-diagonal fused scans (ops/fused.py) vs the modular per-module
# path — same math up to float reassociation (tests/test_fused.py).
#
# "auto" (default): pick per config by estimated step compute. The
# fusion trades WASTED MXU work (the off-block zeros are real
# multiplies — utils/flops.py measures 1.7-2.2x the model FLOPs) for
# fewer sequential loops and launches. At MOSI parity scale the step is
# latency-bound and fusion wins (~+30%); once the step is MXU-bound the
# waste dominates: measured crossover on v5e (scripts/scale_mfu_probe,
# r5) — A_b256/h256 (6.0e10 model FLOPs/step) fused 181 vs modular 156
# steps/s; B_b512/h512 (4.4e11) fused 58 vs modular 70; D_b2048
# (6.7e12) fused 6.3 vs modular 9.4 (31.9% bf16 model-MFU).
# True forces fused everywhere; False forces modular (debug/probes).
FUSED = "auto"

# geometric midpoint of the measured A (fused wins) / B (modular wins)
# model-FLOPs-per-step bracket
_FUSED_FLOPS_CROSSOVER = 1.6e11


def _step_flops_estimate(cfg) -> float:
    """Closed-form estimate of one train step's model GEMM FLOPs (fwd
    x3 for bwd) — only feeds the fused/modular gate, so the dominant
    terms suffice (exact accounting lives in utils/flops.py)."""
    t, n = cfg.seqlength, cfg.batchsize
    d_l, d_a, d_v = cfg.input_dims
    zs = (cfg.zl_size, cfg.za_size, cfg.zv_size)
    per_t = 0.0
    # trio encoder LSTMs (hidden == z_size) + MFN LSTMs (h_dims)
    for d, z in zip((d_l, d_a, d_v), zs):
        per_t += 4 * z * (d + z)
    for d, h in zip((d_l, d_a, d_v), cfg.h_dims):
        per_t += 4 * h * (d + h)
    # MFN attention/gate MLPs
    att_in = 2 * sum(cfg.h_dims)
    g_in = att_in + cfg.memsize
    per_t += att_in * cfg.att1_shape + cfg.att1_shape * att_in
    per_t += att_in * cfg.att2_shape + cfg.att2_shape * cfg.memsize
    per_t += g_in * cfg.gamma1_shape + cfg.gamma1_shape * cfg.memsize
    per_t += g_in * cfg.gamma2_shape + cfg.gamma2_shape * cfg.memsize
    # decoder LSTMs (hidden = fy + f_m) + output projections
    for d, f in zip((d_l, d_a, d_v),
                    (cfg.fl_size, cfg.fa_size, cfg.fv_size)):
        hd = cfg.fy_size + f
        per_t += 4 * hd * 2 * hd + hd * d
    return 3.0 * 2.0 * n * t * per_t  # bwd ~2x fwd; MACs -> FLOPs


def fused_active(cfg) -> bool:
    """Whether the block-diagonal fused path runs at this config."""
    if FUSED is True:
        return True
    if not FUSED:
        return False
    return _step_flops_estimate(cfg) < _FUSED_FLOPS_CROSSOVER


# ---------------------------------------------------------------- helpers

def _zf_all(params, zy, zl, za, zv, cfg, key, train):
    """The four z->f MLPs as two block-diagonal GEMMs (their inputs are
    independent, so fc1s/fc2s fuse; dropout keys/rates stay per-MLP on
    slices — same math as four separate relu(fc2(drop(relu(fc1(z))))))."""
    from factorized_tpu.ops.core import dropout, rate_active

    zf = params["zf"]
    names = ("zy_to_fy", "zl_to_fl", "za_to_fa", "zv_to_fv")
    rates = (cfg.zy_to_fy_dropout, cfg.zl_to_fl_dropout,
             cfg.za_to_fa_dropout, cfg.zv_to_fv_dropout)
    k = subkeys(key, 4)
    zs = (zy, zl, za, zv)
    z_dims = [z.shape[1] for z in zs]
    f_dims = [zf[n]["fc2"]["w"].shape[1] for n in names]

    from factorized_tpu.ops.fused import blockdiag

    w1 = blockdiag([zf[n]["fc1"]["w"] for n in names], f_dims)
    b1 = jnp.concatenate([zf[n]["fc1"]["b"] for n in names])
    w2 = blockdiag([zf[n]["fc2"]["w"] for n in names], f_dims)
    b2 = jnp.concatenate([zf[n]["fc2"]["b"] for n in names])

    z_cat = jnp.concatenate(zs, axis=1)
    h = jax.nn.relu(z_cat @ w1 + b1)
    if any(rate_active(r, train) for r in rates):
        parts = []
        o = 0
        for f, rate, kk in zip(f_dims, rates, k):
            sl = h[:, o:o + f]
            parts.append(dropout(kk, sl, rate, train)
                         if rate_active(rate, train) else sl)
            o += f
        h = jnp.concatenate(parts, axis=1)
    f_cat = jax.nn.relu(h @ w2 + b2)
    outs = []
    o = 0
    for f in f_dims:
        outs.append(f_cat[:, o:o + f])
        o += f
    return tuple(outs)


def _decode(params, fy, fl, fa, fv, t, cfg, key, train):
    drives = [jnp.concatenate([fy, f], 1) for f in (fl, fa, fv)]
    dec = params["dec"]
    if fused_active(cfg):
        x_l_hat, x_a_hat, x_v_hat = fused_decoder_scan(
            [dec["decoder_l"], dec["decoder_a"], dec["decoder_v"]], drives, t
        )
    else:
        x_l_hat = decoder_apply(dec["decoder_l"], drives[0], t)
        x_a_hat = decoder_apply(dec["decoder_a"], drives[1], t)
        x_v_hat = decoder_apply(dec["decoder_v"], drives[2], t)
    y_hat = yhead_apply(params["fy_to_y"], fy, cfg.fy_to_y_dropout, key, train)
    return [x_l_hat, x_a_hat, x_v_hat, y_hat]


def _encode_stage(params, x_l, x_a, x_v, cfg, key, train):
    """zl/za/zv latents + MFN last_hs, fused or modular."""
    enc = params["enc"]
    if fused_active(cfg):
        (hl, ha, hv), mfn_last = fused_mfm_encode(
            [enc["encoder_l"]["lstm"], enc["encoder_a"]["lstm"],
             enc["encoder_v"]["lstm"]],
            params["mfn_enc"]["mfn"], x_l, x_a, x_v,
            mem_dim=cfg.memsize, drops=mfn_drops(cfg), key=key, train=train,
        )
        zl = linear_apply(enc["encoder_l"]["fc1"], hl)
        za = linear_apply(enc["encoder_a"]["fc1"], ha)
        zv = linear_apply(enc["encoder_v"]["fc1"], hv)
    else:
        zl = encoder_apply(enc["encoder_l"], x_l)
        za = encoder_apply(enc["encoder_a"], x_a)
        zv = encoder_apply(enc["encoder_v"], x_v)
        mfn_last = run_mfn(params["mfn_enc"], x_l, x_a, x_v, cfg, key, train)
    return zl, za, zv, mfn_last


def _mmd4(key, zl, za, zv, zy):
    """Sum of four MMD terms (``mfm_model.py:536``) computed BATCHED:
    latents padded to a common width and stacked, so the 12 tiny kernel
    matmuls become 3 batched GEMMs. Zero-padding is exact (padded
    coordinates contribute 0 to squared distances; the fresh Gaussian is
    zeroed on padded dims) — only the RNG stream differs from drawing 4
    separate samples, and MMD is a stochastic regularizer by design
    (``mfm_model.py:26``)."""
    zs = (zl, za, zv, zy)
    dims = [z.shape[1] for z in zs]
    dmax = max(dims)
    n = zl.shape[0]

    Z = jnp.stack([
        jnp.pad(z, ((0, 0), (0, dmax - d))) for z, d in zip(zs, dims)
    ])
    mask = jnp.stack([
        jnp.concatenate([jnp.ones(d), jnp.zeros(dmax - d)]) for d in dims
    ])  # (4, dmax)
    R = jax.random.normal(key, Z.shape, Z.dtype) * mask[:, None, :]

    inv_d2 = jnp.asarray([1.0 / (d * d) for d in dims], Z.dtype)

    def kmean(A, B):
        a2 = jnp.sum(A * A, axis=2)[:, :, None]
        b2 = jnp.sum(B * B, axis=2)[:, None, :]
        sq = jnp.maximum(a2 + b2 - 2.0 * jnp.einsum("bnd,bmd->bnm", A, B),
                         0.0)
        return jnp.mean(jnp.exp(-sq * inv_d2[:, None, None]), axis=(1, 2))

    per_latent = kmean(R, R) + kmean(Z, Z) - 2.0 * kmean(R, Z)
    return jnp.sum(per_latent)


# -------------------------------------------------------------------- MFM

def mfm_init(key, cfg, dtype=jnp.float32):
    k = subkeys(key, 5)
    return {
        "enc": trio_encoder_init(k[0], cfg, dtype),
        "dec": trio_decoder_init(k[1], cfg, dtype),
        "mfn_enc": mfn_encoder_init(k[2], cfg, dtype),
        "zf": trio_zf_init(k[3], cfg, dtype),
        "fy_to_y": yhead_init(k[4], cfg.fy_size, cfg.output_dim, dtype),
    }


def mfm_apply(params, x, cfg, *, key, train=False):
    t = x.shape[0]
    x_l, x_a, x_v = split_modalities(x, cfg.input_dims)
    k = subkeys(key, 4)

    zl, za, zv, mfn_last = _encode_stage(params, x_l, x_a, x_v, cfg, k[0],
                                         train)
    zy = linear_apply(params["mfn_enc"]["last_to_zy"], mfn_last)

    mmd = _mmd4(k[1], zl, za, zv, zy)
    fy, fl, fa, fv = _zf_all(params, zy, zl, za, zv, cfg, k[2], train)
    decoded = _decode(params, fy, fl, fa, fv, t, cfg, k[3], train)
    return decoded, mmd, 0.0


# ------------------------------------------------------- variational heads

def _varhead_init(key, cfg, dtype):
    """Per-latent mu/logvar projections (``mfm_model.py:592-597``)."""
    k = subkeys(key, 6)
    return {
        "last_to_zl": linear_init(k[0], cfg.zl_size, cfg.zl_size, dtype),
        "last_to_za": linear_init(k[1], cfg.za_size, cfg.za_size, dtype),
        "last_to_zv": linear_init(k[2], cfg.zv_size, cfg.zv_size, dtype),
        "last_to_logvarzl": linear_init(k[3], cfg.zl_size, cfg.zl_size, dtype),
        "last_to_logvarza": linear_init(k[4], cfg.za_size, cfg.za_size, dtype),
        "last_to_logvarzv": linear_init(k[5], cfg.zv_size, cfg.zv_size, dtype),
    }


def _var_latents(params, zl_last, za_last, zv_last):
    vh = params["varhead"]
    zl = linear_apply(vh["last_to_zl"], zl_last)
    za = linear_apply(vh["last_to_za"], za_last)
    zv = linear_apply(vh["last_to_zv"], zv_last)
    lv_l = linear_apply(vh["last_to_logvarzl"], zl_last)
    lv_a = linear_apply(vh["last_to_logvarza"], za_last)
    lv_v = linear_apply(vh["last_to_logvarzv"], zv_last)
    return zl, za, zv, lv_l, lv_a, lv_v


def mfm_kl_ef_init(key, cfg, dtype=jnp.float32):
    """Early-fusion variational MFM (``mfm_model.py:557-617``)."""
    k = subkeys(key, 8)
    last_ef = cfg.zl_size + cfg.za_size + cfg.zv_size
    return {
        "enc": trio_encoder_init(k[0], cfg, dtype),
        "dec": trio_decoder_init(k[1], cfg, dtype),
        "varhead": _varhead_init(k[2], cfg, dtype),
        "ef_encoder": encoder_init(k[3], cfg.d_total, last_ef, dtype),
        "last_to_zy": linear_init(k[4], last_ef, cfg.zy_size, dtype),
        "last_to_logvarzy": linear_init(k[5], last_ef, cfg.zy_size, dtype),
        "zf": trio_zf_init(k[6], cfg, dtype),
        "fy_to_y": yhead_init(k[7], cfg.fy_size, cfg.output_dim, dtype),
    }


def mfm_kl_ef_apply(params, x, cfg, *, key, train=False):
    t = x.shape[0]
    x_l, x_a, x_v = split_modalities(x, cfg.input_dims)
    k = subkeys(key, 2)

    enc = params["enc"]
    if fused_active(cfg):
        hl, ha, hv, h_ef = fused_lstm_scan(
            [enc["encoder_l"]["lstm"], enc["encoder_a"]["lstm"],
             enc["encoder_v"]["lstm"], params["ef_encoder"]["lstm"]],
            [x_l, x_a, x_v, x],
        )
        zl_last = linear_apply(enc["encoder_l"]["fc1"], hl)
        za_last = linear_apply(enc["encoder_a"]["fc1"], ha)
        zv_last = linear_apply(enc["encoder_v"]["fc1"], hv)
        ef_last = linear_apply(params["ef_encoder"]["fc1"], h_ef)
    else:
        zl_last = encoder_apply(enc["encoder_l"], x_l)
        za_last = encoder_apply(enc["encoder_a"], x_a)
        zv_last = encoder_apply(enc["encoder_v"], x_v)
        ef_last = encoder_apply(params["ef_encoder"], x)
    zl, za, zv, lv_l, lv_a, lv_v = _var_latents(params, zl_last, za_last, zv_last)

    zy = linear_apply(params["last_to_zy"], ef_last)
    lv_y = linear_apply(params["last_to_logvarzy"], ef_last)

    kld = (
        loss_kld(zl, lv_l)
        + loss_kld(za, lv_a)
        + loss_kld(zv, lv_v)
        + loss_kld(zy, lv_y)
    )
    # NOTE: decodes from the MEAN latents (no sampling) — exact parity
    # with the reference's (degenerate) behavior, mfm_model.py:630-660.
    fy, fl, fa, fv = _zf_all(params, zy, zl, za, zv, cfg, k[0], train)
    decoded = _decode(params, fy, fl, fa, fv, t, cfg, k[1], train)
    return decoded, kld, 0.0


def mfm_kl_init(key, cfg, dtype=jnp.float32):
    """Variational MFM with zy from the MFN (``mfm_model.py:662-721``)."""
    k = subkeys(key, 7)
    return {
        "enc": trio_encoder_init(k[0], cfg, dtype),
        "dec": trio_decoder_init(k[1], cfg, dtype),
        "varhead": _varhead_init(k[2], cfg, dtype),
        "mfn_enc": mfn_encoder_init(k[3], cfg, dtype),
        "last_to_logvarzy": linear_init(k[4], cfg.last_mfn_size, cfg.zy_size, dtype),
        "zf": trio_zf_init(k[5], cfg, dtype),
        "fy_to_y": yhead_init(k[6], cfg.fy_size, cfg.output_dim, dtype),
    }


def mfm_kl_apply(params, x, cfg, *, key, train=False):
    t = x.shape[0]
    x_l, x_a, x_v = split_modalities(x, cfg.input_dims)
    k = subkeys(key, 3)

    zl_last, za_last, zv_last, mfn_last = _encode_stage(
        params, x_l, x_a, x_v, cfg, k[0], train
    )
    zl, za, zv, lv_l, lv_a, lv_v = _var_latents(params, zl_last, za_last, zv_last)

    zy = linear_apply(params["mfn_enc"]["last_to_zy"], mfn_last)
    lv_y = linear_apply(params["last_to_logvarzy"], mfn_last)

    kld = (
        loss_kld(zl, lv_l)
        + loss_kld(za, lv_a)
        + loss_kld(zv, lv_v)
        + loss_kld(zy, lv_y)
    )
    fy, fl, fa, fv = _zf_all(params, zy, zl, za, zv, cfg, k[1], train)
    decoded = _decode(params, fy, fl, fa, fv, t, cfg, k[2], train)
    return decoded, kld, 0.0


# ----------------------------------------------------------- MFM_missing

def mfm_missing_init(key, cfg, dtype=jnp.float32):
    k = subkeys(key, 7)
    d_l, d_a, d_v = cfg.input_dims
    ks = subkeys(k[5], 6)
    return {
        "enc": trio_encoder_init(k[0], cfg, dtype),
        "dec": trio_decoder_init(k[1], cfg, dtype),
        "mfn_enc": mfn_encoder_init(k[2], cfg, dtype),
        "zf": trio_zf_init(k[3], cfg, dtype),
        "fy_to_y": yhead_init(k[4], cfg.fy_size, cfg.output_dim, dtype),
        # surrogate encoders: infer a missing modality's latent / zy
        # from the other two (``mfm_model.py:792-798``)
        "encoder_la_to_v": encoder_init(ks[0], d_l + d_a, cfg.zv_size, dtype),
        "encoder_lv_to_a": encoder_init(ks[1], d_l + d_v, cfg.za_size, dtype),
        "encoder_av_to_l": encoder_init(ks[2], d_a + d_v, cfg.zl_size, dtype),
        "encoder_la_to_y": encoder_init(ks[3], d_l + d_a, cfg.zy_size, dtype),
        "encoder_lv_to_y": encoder_init(ks[4], d_l + d_v, cfg.zy_size, dtype),
        "encoder_av_to_y": encoder_init(ks[5], d_a + d_v, cfg.zy_size, dtype),
    }


def mfm_missing_apply(params, x, cfg, *, key, train=False):
    t = x.shape[0]
    x_l, x_a, x_v = split_modalities(x, cfg.input_dims)
    k = subkeys(key, 6)

    zl, za, zv, mfn_last = _encode_stage(params, x_l, x_a, x_v, cfg, k[0],
                                         train)
    zy = linear_apply(params["mfn_enc"]["last_to_zy"], mfn_last)

    x_la = jnp.concatenate([x_l, x_a], axis=2)
    x_lv = jnp.concatenate([x_l, x_v], axis=2)
    x_av = jnp.concatenate([x_a, x_v], axis=2)
    surrogate_names = ("encoder_la_to_v", "encoder_lv_to_a",
                      "encoder_av_to_l", "encoder_la_to_y",
                      "encoder_lv_to_y", "encoder_av_to_y")
    surrogate_xs = [x_la, x_lv, x_av, x_la, x_lv, x_av]
    if fused_active(cfg):
        hs = fused_lstm_scan(
            [params[n]["lstm"] for n in surrogate_names], surrogate_xs
        )
        (zv_nov, za_noa, zl_nol, zy_nov, zy_noa, zy_nol) = [
            linear_apply(params[n]["fc1"], h)
            for n, h in zip(surrogate_names, hs)
        ]
    else:
        (zv_nov, za_noa, zl_nol, zy_nov, zy_noa, zy_nol) = [
            encoder_apply(params[n], xin)
            for n, xin in zip(surrogate_names, surrogate_xs)
        ]

    mmd = _mmd4(k[1], zl, za, zv, zy)
    missing_loss = (
        l2_loss(zv_nov, zv)
        + l2_loss(za_noa, za)
        + l2_loss(zl_nol, zl)
        + l2_loss(zy_nov, zy)
        + l2_loss(zy_noa, zy)
        + l2_loss(zy_nol, zy)
    )

    def decode(zl_, za_, zv_, zy_, dkey):
        dk = subkeys(dkey, 2)
        fy, fl, fa, fv = _zf_all(params, zy_, zl_, za_, zv_, cfg, dk[0], train)
        return _decode(params, fy, fl, fa, fv, t, cfg, dk[1], train)

    decoded = decode(zl, za, zv, zy, k[2])
    decoded_nol = decode(zl_nol, za, zv, zy_nol, k[3])
    decoded_noa = decode(zl, za_noa, zv, zy_noa, k[4])
    decoded_nov = decode(zl, za, zv_nov, zy_nov, k[5])
    return decoded, decoded_nol, decoded_noa, decoded_nov, mmd, missing_loss
