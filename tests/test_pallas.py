"""Pallas LSTM kernels (interpret mode on CPU) vs the lax.scan path:
forward values and hand-derived BPTT gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import factorized_tpu.ops.fused as fused
from factorized_tpu.ops.lstm import decoder_init, lstm_cell_init


@pytest.fixture
def force_pallas():
    old = fused.USE_PALLAS
    fused.USE_PALLAS = True
    yield
    fused.USE_PALLAS = old


def _cells_xs(seed=0, t=5, n=3):
    dims = [(9, 6), (4, 8)]
    keys = jax.random.split(jax.random.PRNGKey(seed), len(dims))
    cells = [lstm_cell_init(k, d, h) for k, (d, h) in zip(keys, dims)]
    rng = np.random.default_rng(seed)
    xs = [jnp.asarray(rng.normal(size=(t, n, d)), jnp.float32)
          for d, _ in dims]
    return cells, xs


class TestMultiLSTM:
    def test_forward_matches_scan(self, force_pallas):
        cells, xs = _cells_xs()
        got = fused.fused_lstm_scan(cells, xs)
        fused.USE_PALLAS = False
        want = fused.fused_lstm_scan(cells, xs)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-5, atol=1e-6)

    def test_grads_match_scan(self, force_pallas):
        cells, xs = _cells_xs()

        def loss(cells, xs):
            outs = fused.fused_lstm_scan(cells, xs)
            return sum(jnp.sum(o * (i + 1.0)) for i, o in enumerate(outs))

        g_pallas = jax.grad(loss)(cells, xs)
        fused.USE_PALLAS = False
        g_scan = jax.grad(loss)(cells, xs)
        for a, b in zip(jax.tree.leaves(g_pallas), jax.tree.leaves(g_scan)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-5)


class TestDecoderKernel:
    def _decs(self, t=6, n=4):
        specs = [(5, 7), (6, 3)]
        keys = jax.random.split(jax.random.PRNGKey(1), len(specs))
        decs = [decoder_init(k, h, d) for k, (h, d) in zip(keys, specs)]
        rng = np.random.default_rng(1)
        hTs = [jnp.asarray(rng.normal(size=(n, h)), jnp.float32)
               for h, _ in specs]
        return decs, hTs, t

    def test_forward_matches_scan(self, force_pallas):
        decs, hTs, t = self._decs()
        got = fused.fused_decoder_scan(decs, hTs, t)
        fused.USE_PALLAS = False
        want = fused.fused_decoder_scan(decs, hTs, t)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-5, atol=1e-6)

    def test_grads_match_scan(self, force_pallas):
        decs, hTs, t = self._decs()

        def loss(decs, hTs):
            outs = fused.fused_decoder_scan(decs, hTs, t)
            return sum(jnp.sum(jnp.sin(o)) for o in outs)

        g_pallas = jax.grad(loss, argnums=(0, 1))(decs, hTs)
        fused.USE_PALLAS = False
        g_scan = jax.grad(loss, argnums=(0, 1))(decs, hTs)
        for a, b in zip(jax.tree.leaves(g_pallas), jax.tree.leaves(g_scan)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-5)

    def test_t1_edge(self, force_pallas):
        decs, hTs, _ = self._decs(t=1)
        out = fused.fused_decoder_scan(decs, hTs, 1)
        assert out[0].shape[0] == 1


class TestEndToEndModelGrads:
    @pytest.mark.slow
    def test_mfm_kl_ef_train_grads(self, force_pallas):
        """kl_ef uses the pallas multi_lstm for all 4 encoders and the
        decoder kernel; grads of the full loss must match the scan."""
        from factorized_tpu.config import MFMConfig
        import factorized_tpu.models.mfm as mfm_mod
        from factorized_tpu.train import make_loss_fn

        cfg = MFMConfig(
            input_dims=[8, 4, 5], h_dims=[6, 5, 4], memsize=6,
            zy_size=5, zl_size=6, za_size=4, zv_size=5,
            fy_size=4, fl_size=5, fa_size=4, fv_size=3,
            att1_shape=8, att2_shape=8, gamma1_shape=8, gamma2_shape=8,
            zy_to_fy_dropout=0.0, zl_to_fl_dropout=0.0,
            za_to_fa_dropout=0.0, zv_to_fv_dropout=0.0,
            fy_to_y_dropout=0.0,
        )
        params = mfm_mod.mfm_kl_ef_init(jax.random.PRNGKey(0), cfg)
        loss_fn = make_loss_fn(mfm_mod.mfm_kl_ef_apply, cfg, "joint")
        x = jax.random.normal(jax.random.PRNGKey(1), (5, 4, cfg.d_total))
        y = jax.random.normal(jax.random.PRNGKey(2), (4,))
        key = jax.random.PRNGKey(3)

        g_p = jax.grad(lambda p: loss_fn(p, x, y, key)[0])(params)
        fused.USE_PALLAS = False
        g_s = jax.grad(lambda p: loss_fn(p, x, y, key)[0])(params)
        for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_s)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=1e-5)
