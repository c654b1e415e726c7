"""Fused block-diagonal scans must match the modular path exactly
(up to float reassociation)."""

import numpy as np
import jax
import jax.numpy as jnp

import factorized_tpu.models.mfm as mfm_mod
from factorized_tpu.config import MFMConfig
from factorized_tpu.ops.fused import fused_decoder_scan, fused_lstm_scan
from factorized_tpu.ops.lstm import (
    decoder_apply,
    decoder_init,
    encoder_apply,
    encoder_init,
    lstm_cell_init,
    lstm_scan,
)

KEY = jax.random.PRNGKey(0)
CFG = MFMConfig(
    input_dims=[12, 4, 6], h_dims=[8, 5, 7], memsize=9,
    zy_size=6, zl_size=8, za_size=5, zv_size=7,
    fy_size=6, fl_size=8, fa_size=5, fv_size=4,
    att1_shape=16, att2_shape=16, gamma1_shape=16, gamma2_shape=16,
    # eval-mode comparison: dropout rates irrelevant
)


def test_fused_lstm_scan_matches_separate():
    dims = [(11, 7), (5, 9), (8, 4)]
    keys = jax.random.split(KEY, 3)
    cells = [lstm_cell_init(k, d, h) for k, (d, h) in zip(keys, dims)]
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.normal(size=(6, 3, d)), jnp.float32)
          for d, _ in dims]
    fused = fused_lstm_scan(cells, xs)
    for cell, x, got in zip(cells, xs, fused):
        _, want, _ = lstm_scan(cell, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)


def test_fused_decoder_scan_matches_separate():
    specs = [(7, 11), (5, 4), (6, 9)]  # (h, d_out)
    keys = jax.random.split(KEY, 3)
    decs = [decoder_init(k, h, d) for k, (h, d) in zip(keys, specs)]
    rng = np.random.default_rng(1)
    hTs = [jnp.asarray(rng.normal(size=(4, h)), jnp.float32)
           for h, _ in specs]
    fused = fused_decoder_scan(decs, hTs, 5)
    for dec, hT, got in zip(decs, hTs, fused):
        want = decoder_apply(dec, hT, 5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)


def _compare_model(name):
    init, apply_fn = {
        "mfm": (mfm_mod.mfm_init, mfm_mod.mfm_apply),
        "kl": (mfm_mod.mfm_kl_init, mfm_mod.mfm_kl_apply),
        "kl_ef": (mfm_mod.mfm_kl_ef_init, mfm_mod.mfm_kl_ef_apply),
        "missing": (mfm_mod.mfm_missing_init, mfm_mod.mfm_missing_apply),
    }[name]
    params = init(KEY, CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 3, CFG.d_total))
    key = jax.random.PRNGKey(2)
    saved = mfm_mod.FUSED
    try:
        mfm_mod.FUSED = True
        out_f = apply_fn(params, x, CFG, key=key, train=False)
        mfm_mod.FUSED = False
        out_m = apply_fn(params, x, CFG, key=key, train=False)
    finally:
        mfm_mod.FUSED = saved
    flat_f = jax.tree.leaves(out_f)
    flat_m = jax.tree.leaves(out_m)
    assert len(flat_f) == len(flat_m)
    for a, b in zip(flat_f, flat_m):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-4, atol=1e-5)


def test_mfm_fused_equals_modular():
    _compare_model("mfm")


def test_kl_fused_equals_modular():
    _compare_model("kl")


def test_kl_ef_fused_equals_modular():
    _compare_model("kl_ef")


def test_missing_fused_equals_modular():
    _compare_model("missing")
