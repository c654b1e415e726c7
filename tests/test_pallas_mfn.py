"""The Pallas fused-encode mega-kernel (interpret mode on CPU) vs the
XLA scan path: forward values, full-model gradients, dropout stats."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import factorized_tpu.models.mfm as mfm_mod
import factorized_tpu.ops.fused as fused
from factorized_tpu.config import MFMConfig
from factorized_tpu.train import make_loss_fn


@pytest.fixture
def force_pallas():
    old = fused.USE_PALLAS
    fused.USE_PALLAS = True
    yield
    fused.USE_PALLAS = old


CFG = MFMConfig(
    input_dims=[8, 4, 5], h_dims=[6, 5, 4], memsize=6,
    zy_size=5, zl_size=6, za_size=4, zv_size=5,
    fy_size=4, fl_size=5, fa_size=4, fv_size=3,
    att1_shape=8, att2_shape=8, gamma1_shape=8, gamma2_shape=8,
    att1_drop=0.0, att2_drop=0.0, gamma1_drop=0.0, gamma2_drop=0.0,
    zy_to_fy_dropout=0.0, zl_to_fl_dropout=0.0,
    za_to_fa_dropout=0.0, zv_to_fv_dropout=0.0, fy_to_y_dropout=0.0,
)


def _with_flag(fn, flag):
    old = fused.USE_PALLAS
    fused.USE_PALLAS = flag
    try:
        return fn()
    finally:
        fused.USE_PALLAS = old


class TestEncodeKernel:
    def test_eval_forward_matches_scan(self, force_pallas):
        params = mfm_mod.mfm_init(jax.random.PRNGKey(0), CFG)
        x = jax.random.normal(jax.random.PRNGKey(1), (6, 4, CFG.d_total))

        def run():
            return mfm_mod.mfm_apply(params, x, CFG,
                                     key=jax.random.PRNGKey(2), train=False)

        out_p = _with_flag(run, True)
        out_s = _with_flag(run, False)
        for a, b in zip(jax.tree.leaves(out_p), jax.tree.leaves(out_s)):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       rtol=2e-4, atol=1e-5)

    def test_train_grads_match_scan_no_dropout(self, force_pallas):
        params = mfm_mod.mfm_init(jax.random.PRNGKey(0), CFG)
        loss_fn = make_loss_fn(mfm_mod.mfm_apply, CFG, "joint")
        x = jax.random.normal(jax.random.PRNGKey(1), (5, 4, CFG.d_total))
        y = jax.random.normal(jax.random.PRNGKey(2), (4,))
        key = jax.random.PRNGKey(3)

        def grads():
            return jax.grad(lambda p: loss_fn(p, x, y, key)[0])(params)

        g_p = _with_flag(grads, True)
        g_s = _with_flag(grads, False)
        flat_p, tree_p = jax.tree.flatten(g_p)
        flat_s, _ = jax.tree.flatten(g_s)
        for path, a, b in zip(tree_p.flatten_up_to(g_p) and
                              [None] * len(flat_p), flat_p, flat_s):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=2e-5)

    @pytest.mark.slow
    def test_missing_model_grads(self, force_pallas):
        params = mfm_mod.mfm_missing_init(jax.random.PRNGKey(0), CFG)
        loss_fn = make_loss_fn(mfm_mod.mfm_missing_apply, CFG, "missing")
        x = jax.random.normal(jax.random.PRNGKey(1), (5, 4, CFG.d_total))
        y = jax.random.normal(jax.random.PRNGKey(2), (4,))
        key = jax.random.PRNGKey(3)

        def grads():
            return jax.grad(lambda p: loss_fn(p, x, y, key)[0])(params)

        g_p = _with_flag(grads, True)
        g_s = _with_flag(grads, False)
        for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_s)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=2e-5)

    @pytest.mark.slow
    def test_dropout_statistics(self, force_pallas):
        """Train-mode dropout uses the TPU PRNG — verify the masks scale
        activations correctly on average (not bitwise vs threefry)."""
        cfg = CFG.replace(att1_drop=0.5, att2_drop=0.5,
                          gamma1_drop=0.5, gamma2_drop=0.5)
        params = mfm_mod.mfm_init(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (6, 8, cfg.d_total))

        outs = []
        for s in range(40):
            decoded, _, _ = mfm_mod.mfm_apply(
                params, x, cfg, key=jax.random.PRNGKey(100 + s), train=True)
            outs.append(np.asarray(decoded[3]))
        mean_train = np.mean(outs, axis=0)
        decoded_eval, _, _ = mfm_mod.mfm_apply(
            params, x, cfg, key=jax.random.PRNGKey(0), train=False)
        # inverted dropout keeps expectations roughly aligned
        corr = np.corrcoef(mean_train.ravel(),
                           np.asarray(decoded_eval[3]).ravel())[0, 1]
        assert corr > 0.7

    def test_dropout_varies_with_key(self, force_pallas):
        """Dropout inside the attention MLPs only perturbs softmax
        weightings, so the effect on y_hat is small — compare the raw
        MFN output bit-exactly instead."""
        cfg = CFG.replace(att1_drop=0.5, gamma1_drop=0.5, gamma2_drop=0.5)
        params = mfm_mod.mfm_init(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (5, 4, cfg.d_total))

        def mfn_out(key, train):
            from factorized_tpu.models.common import split_modalities
            from factorized_tpu.models.mfm import _encode_stage

            x_l, x_a, x_v = split_modalities(x, cfg.input_dims)
            _, _, _, mfn_last = _encode_stage(params, x_l, x_a, x_v, cfg,
                                              key, train)
            return np.asarray(mfn_last)

        a = mfn_out(jax.random.PRNGKey(1), True)
        b = mfn_out(jax.random.PRNGKey(2), True)
        e = mfn_out(jax.random.PRNGKey(1), False)
        assert (a != b).any()
        assert (a != e).any()
        # same key -> identical masks -> identical output
        a2 = mfn_out(jax.random.PRNGKey(1), True)
        np.testing.assert_array_equal(a, a2)


class TestTrainModeBitwiseParity:
    def test_train_forward_matches_scan_with_dropout(self, force_pallas):
        """Masks are precomputed from the SAME threefry stream as the
        scan path, so train-mode forward matches up to x/keep vs
        x*(1/keep) rounding."""
        cfg = CFG.replace(att1_drop=0.5, att2_drop=0.2,
                          gamma1_drop=0.5, gamma2_drop=0.7)
        params = mfm_mod.mfm_init(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (6, 4, cfg.d_total))

        def run():
            return mfm_mod.mfm_apply(params, x, cfg,
                                     key=jax.random.PRNGKey(7), train=True)

        out_p = _with_flag(run, True)
        out_s = _with_flag(run, False)
        for a, b in zip(jax.tree.leaves(out_p), jax.tree.leaves(out_s)):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       rtol=2e-4, atol=1e-5)


class TestKernelsActiveAtProductionConfig:
    def test_fits_checks_pass_at_bench_shapes(self):
        """The v1 backward silently never ran at production size —
        encode_fits rejected it and training used the scan fallback
        while docs credited the kernel. Pin the v2 kernels ACTIVE at
        the pinned best-acc config (train mode, masks riding along) so
        a fits-formula edit can't silently deactivate them again."""
        from factorized_tpu.config import best_acc_mosi_config
        from factorized_tpu.ops import pallas_lstm, pallas_mfn

        cfg = best_acc_mosi_config()
        t, n = cfg.seqlength, cfg.batchsize
        h_tot = sum(cfg.h_dims) + cfg.zl_size + cfg.za_size + cfg.zv_size
        att_in = 2 * sum(cfg.h_dims)
        sites = (cfg.att1_shape, cfg.att2_shape, cfg.gamma1_shape,
                 cfg.gamma2_shape)
        widths = [att_in * sites[0], att_in * sites[1],
                  (att_in + cfg.memsize) * (sites[2] + sites[3])]
        assert pallas_mfn.encode_fits(t, n, h_tot, cfg.memsize, att_in,
                                      widths, t * n * sum(sites))
        assert pallas_mfn.encode_fits(t, n, h_tot, cfg.memsize, att_in,
                                      widths, 0)  # eval mode too
        dec_h = 3 * cfg.fy_size + cfg.fl_size + cfg.fa_size + cfg.fv_size
        assert pallas_lstm.decoder_fits(t, n, dec_h)
        # kl_ef's 4 fused encoder cells
        kl_h = cfg.zl_size + cfg.za_size + cfg.zv_size + cfg.zy_size
        assert pallas_lstm.multi_lstm_fits(t, n, kl_h)


class TestVmappedGrads:
    @pytest.mark.slow
    def test_vmapped_grads_match_scan(self, force_pallas):
        """The multiseed trainer vmaps the train step over seeds; the
        streamed backward kernel reads pl.program_id(0) for TIME, and
        vmap prepends a batch grid axis — JAX's grid_mapping.vmapped_dims
        machinery must keep user axis numbering intact. Lock that in."""
        K = 3
        cfg = CFG.replace(att1_drop=0.3, gamma1_drop=0.25)
        keys = jax.random.split(jax.random.PRNGKey(0), K)
        vparams = jax.vmap(lambda k: mfm_mod.mfm_init(k, cfg))(keys)
        loss_fn = make_loss_fn(mfm_mod.mfm_apply, cfg, "joint")
        x = jax.random.normal(jax.random.PRNGKey(1), (5, 4, cfg.d_total))
        y = jax.random.normal(jax.random.PRNGKey(2), (4,))
        step_keys = jax.random.split(jax.random.PRNGKey(3), K)

        def vgrads():
            return jax.vmap(
                lambda p, k: jax.grad(
                    lambda q: loss_fn(q, x, y, k)[0])(p)
            )(vparams, step_keys)

        g_p = _with_flag(vgrads, True)
        g_s = _with_flag(vgrads, False)
        for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_s)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=2e-5)


class TestDropoutActiveGrads:
    def test_grads_match_scan_with_dropout(self, force_pallas):
        """The masked backward paths (m1/m2/m3/m4 placement on
        dr1/dr2/dr3 in _bwd_kernel) must match the scan path — masks
        come from the same threefry stream, so gradients agree."""
        cfg = CFG.replace(att1_drop=0.3, att2_drop=0.2,
                          gamma1_drop=0.25, gamma2_drop=0.15)
        params = mfm_mod.mfm_init(jax.random.PRNGKey(0), cfg)
        loss_fn = make_loss_fn(mfm_mod.mfm_apply, cfg, "joint")
        x = jax.random.normal(jax.random.PRNGKey(1), (5, 4, cfg.d_total))
        y = jax.random.normal(jax.random.PRNGKey(2), (4,))
        key = jax.random.PRNGKey(3)

        def grads():
            return jax.grad(lambda p: loss_fn(p, x, y, key)[0])(params)

        g_p = _with_flag(grads, True)
        g_s = _with_flag(grads, False)
        for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_s)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=2e-5)
