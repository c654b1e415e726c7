"""Edge shapes for the streamed (grid-over-time) Pallas kernels.

The kernels iterate one timestep per grid index with clamped
``index_map``s for the i-1 operands and ``k == 0`` carry initialization
— off-by-ones live exactly at t=1/t=2 and at odd, non-tile-aligned
sequence lengths. Sweep those against the scan path through the full
MFM model (covers encode mega-kernel + decoder) and the raw multi-cell
kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import factorized_tpu.models.mfm as mfm_mod
import factorized_tpu.ops.fused as fused
from factorized_tpu.config import MFMConfig


def _with_flag(fn, flag):
    old = fused.USE_PALLAS
    fused.USE_PALLAS = flag
    try:
        return fn()
    finally:
        fused.USE_PALLAS = old


def _cfg(t):
    return MFMConfig(
        input_dims=[5, 3, 4], h_dims=[4, 3, 5], memsize=4,
        zy_size=4, zl_size=4, za_size=3, zv_size=4,
        fy_size=3, fl_size=4, fa_size=3, fv_size=3,
        att1_shape=6, att2_shape=6, gamma1_shape=6, gamma2_shape=6,
        att1_drop=0.25, gamma2_drop=0.4, seqlength=t, batchsize=3,
    )


@pytest.mark.parametrize(
    "t", [1, 2, pytest.param(7, marks=pytest.mark.slow),
          pytest.param(33, marks=pytest.mark.slow)])
def test_mfm_grads_all_t(t):
    cfg = _cfg(t)
    params = mfm_mod.mfm_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (t, 3, cfg.d_total))
    key = jax.random.PRNGKey(2)

    def loss(params):
        decoded, mmd, _ = mfm_mod.mfm_apply(params, x, cfg, key=key,
                                            train=True)
        return sum(jnp.sum(d ** 2) for d in decoded) + mmd

    g_p = _with_flag(lambda: jax.grad(loss)(params), True)
    g_s = _with_flag(lambda: jax.grad(loss)(params), False)
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=3e-5)


@pytest.mark.parametrize("t", [1, 2, 33])
def test_multi_lstm_raw(t):
    """The raw fused-cell kernel at boundary lengths."""
    n, H = 3, 5
    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.normal(size=(t, n, 4 * H)) * 0.3, jnp.float32)
    wh = jnp.asarray(rng.normal(size=(H, 4 * H)) * 0.3, jnp.float32)

    def grads(use_pallas):
        return jax.grad(
            lambda xp_w: jnp.sum(jnp.cos(
                _run_with(xp_w[0], xp_w[1], use_pallas)))
        )((xp, wh))

    g_p = grads(True)
    g_s = grads(False)
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def _run_with(xp, wh, use_pallas):
    from factorized_tpu.ops import pallas_lstm
    from factorized_tpu.ops.lstm import lstm_step

    t, n, H4 = xp.shape
    H = H4 // 4
    if use_pallas:
        return pallas_lstm.multi_lstm(xp, wh)

    def step(carry, xp_t):
        h, c = carry
        h, c = lstm_step(c, xp_t + h @ wh)
        return (h, c), None

    init = (jnp.zeros((n, H), jnp.float32),
            jnp.zeros((n, H), jnp.float32))
    (h, _), _ = jax.lax.scan(step, init, xp)
    return h
