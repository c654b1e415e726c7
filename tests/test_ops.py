"""Unit tests for core ops: losses vs closed forms, LSTM encoder/decoder
and MFN vs a PyTorch oracle with copied weights (SURVEY.md §4.2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from factorized_tpu.ops import (
    compute_kernel,
    decoder_apply,
    decoder_init,
    encoder_apply,
    encoder_init,
    loss_kld,
    loss_mmd,
    l1_loss,
    l2_loss,
    cross_entropy_loss,
    mfn_init,
    mfn_apply,
)

KEY = jax.random.PRNGKey(0)


def to_torch_lstmcell(cell, d, h):
    m = torch.nn.LSTMCell(d, h)
    with torch.no_grad():
        m.weight_ih.copy_(torch.tensor(np.asarray(cell["wx"]).T))
        m.weight_hh.copy_(torch.tensor(np.asarray(cell["wh"]).T))
        m.bias_ih.copy_(torch.tensor(np.asarray(cell["b"])))
        m.bias_hh.zero_()
    return m


def to_torch_linear(lin):
    w = np.asarray(lin["w"])
    m = torch.nn.Linear(w.shape[0], w.shape[1])
    with torch.no_grad():
        m.weight.copy_(torch.tensor(w.T))
        m.bias.copy_(torch.tensor(np.asarray(lin["b"])))
    return m


class TestLosses:
    def test_compute_kernel_matches_reference_formula(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(5, 7)).astype(np.float32)
        y = rng.normal(size=(4, 7)).astype(np.float32)
        got = np.asarray(compute_kernel(jnp.array(x), jnp.array(y)))
        # reference: exp(-mean_dim((xi-yj)^2)/dim)  (double /dim)
        diff = x[:, None, :] - y[None, :, :]
        want = np.exp(-(diff**2).mean(2) / 7.0)
        # the TPU-friendly ||x||^2+||y||^2-2xy expansion trades ~1e-3
        # relative precision for an MXU matmul instead of an O(n^2 d)
        # broadcast; loss-level impact is negligible.
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-4)

    def test_kernel_diagonal_is_one(self):
        x = jnp.ones((3, 4))
        k = compute_kernel(x, x)
        np.testing.assert_allclose(np.asarray(k), np.ones((3, 3)), atol=1e-6)

    def test_mmd_zero_mean_for_gaussian_input(self):
        # With z ~ N(0,I), E[MMD] ~ 0; check it's small for a big sample.
        z = jax.random.normal(jax.random.PRNGKey(1), (512, 16))
        val = float(loss_mmd(jax.random.PRNGKey(2), z))
        assert abs(val) < 5e-3

    def test_mmd_positive_for_shifted_input(self):
        z = jax.random.normal(jax.random.PRNGKey(1), (256, 8)) + 3.0
        val = float(loss_mmd(jax.random.PRNGKey(2), z))
        assert val > 0.05

    def test_kld_closed_form(self):
        mu = jnp.array([[0.5, -1.0]])
        logvar = jnp.array([[0.0, 1.0]])
        want = -0.5 * np.sum(
            1 + np.asarray(logvar) - np.asarray(mu) ** 2 - np.exp(np.asarray(logvar))
        )
        np.testing.assert_allclose(float(loss_kld(mu, logvar)), want, rtol=1e-6)

    def test_task_losses_match_torch(self):
        rng = np.random.default_rng(3)
        a = rng.normal(size=(6, 5)).astype(np.float32)
        b = rng.normal(size=(6, 5)).astype(np.float32)
        np.testing.assert_allclose(
            float(l1_loss(jnp.array(a), jnp.array(b))),
            float(F.l1_loss(torch.tensor(a), torch.tensor(b))),
            rtol=1e-4,
        )
        np.testing.assert_allclose(
            float(l2_loss(jnp.array(a), jnp.array(b))),
            float(F.mse_loss(torch.tensor(a), torch.tensor(b))),
            rtol=1e-4,
        )
        logits = rng.normal(size=(6, 3)).astype(np.float32)
        labels = rng.integers(0, 3, size=(6,))
        np.testing.assert_allclose(
            float(cross_entropy_loss(jnp.array(logits), jnp.array(labels))),
            float(F.cross_entropy(torch.tensor(logits), torch.tensor(labels))),
            rtol=1e-4,
        )


class TestLSTMParity:
    def test_encoder_matches_torch(self):
        d, h, t, n = 11, 7, 5, 3
        params = encoder_init(KEY, d, h)
        x = np.random.default_rng(0).normal(size=(t, n, d)).astype(np.float32)

        got = np.asarray(encoder_apply(params, jnp.array(x)))

        cell = to_torch_lstmcell(params["lstm"], d, h)
        fc1 = to_torch_linear(params["fc1"])
        hx = torch.zeros(n, h)
        cx = torch.zeros(n, h)
        xt = torch.tensor(x)
        with torch.no_grad():
            for i in range(t):
                hx, cx = cell(xt[i], (hx, cx))
            want = fc1(hx).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_decoder_matches_torch(self):
        h, d, t, n = 6, 9, 7, 4
        params = decoder_init(KEY, h, d)
        hT = np.random.default_rng(1).normal(size=(n, h)).astype(np.float32)

        got = np.asarray(decoder_apply(params, jnp.array(hT), t))

        cell = to_torch_lstmcell(params["lstm"], h, h)
        fc1 = to_torch_linear(params["fc1"])
        hx = torch.zeros(n, h)
        cx = torch.zeros(n, h)
        inp = torch.tensor(hT)
        outs = []
        with torch.no_grad():
            for i in range(t):
                hx, cx = cell(inp if i == 0 else outs[-1], (hx, cx))
                outs.append(hx)
            want = fc1(torch.stack(outs)).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_decoder_t1(self):
        params = decoder_init(KEY, 4, 3)
        out = decoder_apply(params, jnp.zeros((2, 4)), 1)
        assert out.shape == (1, 2, 3)


class TestMFNParity:
    def test_mfn_matches_torch(self):
        input_dims = [10, 4, 6]
        h_dims = [8, 5, 7]
        mem = 12
        t, n = 6, 3
        params = mfn_init(KEY, input_dims, h_dims, mem, 2, 16, 16, 16, 16)
        rng = np.random.default_rng(2)
        xs = [rng.normal(size=(t, n, d)).astype(np.float32) for d in input_dims]

        got = np.asarray(
            mfn_apply(
                params,
                *[jnp.array(x) for x in xs],
                mem_dim=mem,
                drops=(0.0, 0.0, 0.0, 0.0),
                key=None,
                train=False,
            )
        )

        cells = [
            to_torch_lstmcell(params[f"lstm_{m}"], d, h)
            for m, d, h in zip("lav", input_dims, h_dims)
        ]
        mlps = {
            name: (
                to_torch_linear(params[name]["fc1"]),
                to_torch_linear(params[name]["fc2"]),
            )
            for name in ("att1", "att2", "gamma1", "gamma2")
        }
        hs = [torch.zeros(n, h) for h in h_dims]
        cs = [torch.zeros(n, h) for h in h_dims]
        memt = torch.zeros(n, mem)
        xts = [torch.tensor(x) for x in xs]

        def mlp(name, v):
            a, b = mlps[name]
            return b(torch.relu(a(v)))

        with torch.no_grad():
            for i in range(t):
                prev_cs = torch.cat(cs, dim=1)
                new = [c(xts[j][i], (hs[j], cs[j])) for j, c in enumerate(cells)]
                new_cs = torch.cat([nc for _, nc in new], dim=1)
                c_star = torch.cat([prev_cs, new_cs], dim=1)
                att = torch.softmax(mlp("att1", c_star), dim=1)
                attended = att * c_star
                c_hat = torch.tanh(mlp("att2", attended))
                both = torch.cat([attended, memt], dim=1)
                g1 = torch.sigmoid(mlp("gamma1", both))
                g2 = torch.sigmoid(mlp("gamma2", both))
                memt = g1 * memt + g2 * c_hat
                hs = [nh for nh, _ in new]
                cs = [nc for _, nc in new]
            want = torch.cat(hs + [memt], dim=1).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestInitDistributions:
    def test_linear_init_bounds(self):
        from factorized_tpu.ops import linear_init

        p = linear_init(KEY, 100, 50)
        bound = 1 / np.sqrt(100)
        assert np.abs(np.asarray(p["w"])).max() <= bound
        assert np.abs(np.asarray(p["b"])).max() <= bound

    def test_dropout_eval_identity_and_train_scaling(self):
        from factorized_tpu.ops import dropout

        x = jnp.ones((1000,))
        assert np.allclose(np.asarray(dropout(KEY, x, 0.5, train=False)), 1.0)
        y = np.asarray(dropout(KEY, x, 0.5, train=True))
        assert set(np.unique(y)).issubset({0.0, 2.0})
        assert 0.3 < (y == 0).mean() < 0.7

    def test_dropout_rate_one_zeroes_in_both_paths(self):
        """rate >= 1 must zero everything on the TRACED path too —
        bernoulli(1e-6) is not all-zero, and a rare survivor would be
        scaled by 1e6 (per-lane rates are unvalidated config values in
        the bucket/evolve search)."""
        from factorized_tpu.ops import dropout

        x = jnp.ones((200_000,))
        assert np.all(np.asarray(dropout(KEY, x, 1.0, train=True)) == 0.0)
        traced = jax.jit(lambda r: dropout(KEY, x, r, train=True))
        assert np.all(np.asarray(traced(jnp.float32(1.0))) == 0.0)
        # sub-1 traced rates are untouched by the guard
        y = np.asarray(traced(jnp.float32(0.5)))
        assert set(np.unique(y)).issubset({0.0, 2.0})
