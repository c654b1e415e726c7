"""Analytic GEMM-FLOPs counter (utils/flops.py).

Exists because XLA's Compiled.cost_analysis() does not multiply a
while/scan body's FLOPs by trip count (two r5 probe runs of one chunk
program at different NB*E returned identical "flops"), so the bench's
MFU roofline uses this static jaxpr counter instead.
"""

import jax
import jax.numpy as jnp
import pytest

from factorized_tpu.utils.flops import (
    count_gemm_flops,
    model_train_flops_per_step,
)


def test_single_matmul():
    def f(x, w):
        return jnp.sum(x @ w)

    j = jax.make_jaxpr(f)(jnp.zeros((32, 100)), jnp.zeros((100, 50)))
    assert count_gemm_flops(j) == 2 * 32 * 100 * 50


def test_grad_counts_forward_plus_two_backward_dots():
    def f(x, w):
        return jnp.sum(x @ w)

    j = jax.make_jaxpr(jax.grad(f, argnums=(0, 1)))(
        jnp.zeros((32, 100)), jnp.zeros((100, 50)))
    # fwd dot + dx (dy @ w.T) + dw (x.T @ dy)
    assert count_gemm_flops(j) == 3 * 2 * 32 * 100 * 50


def test_scan_multiplies_by_length():
    def g(w, xs):
        def body(c, x):
            return c @ w, ()

        c, _ = jax.lax.scan(body, xs[0], xs[1:])
        return jnp.sum(c)

    j = jax.make_jaxpr(g)(jnp.zeros((64, 64)), jnp.zeros((10, 32, 64)))
    assert count_gemm_flops(j) == 9 * 2 * 32 * 64 * 64


def test_batched_dot_general():
    def f(a, b):
        return jnp.einsum("bnd,bmd->bnm", a, b)

    j = jax.make_jaxpr(f)(jnp.zeros((4, 8, 16)), jnp.zeros((4, 9, 16)))
    assert count_gemm_flops(j) == 2 * 4 * 8 * 9 * 16


def test_cond_takes_max_branch():
    def f(p, x, w):
        return jax.lax.cond(p, lambda: jnp.sum(x @ w),
                            lambda: jnp.sum(x))

    j = jax.make_jaxpr(f)(True, jnp.zeros((8, 8)), jnp.zeros((8, 8)))
    assert count_gemm_flops(j) == 2 * 8 * 8 * 8


@pytest.fixture(scope="module")
def tiny_cfg():
    from factorized_tpu.config import best_acc_mosi_config

    return best_acc_mosi_config(batchsize=4, seqlength=3,
                                input_dims=[6, 5, 4])


def test_mfm_step_flops_positive_and_fused_wastes_more(tiny_cfg):
    model = model_train_flops_per_step(tiny_cfg)
    executed = model_train_flops_per_step(tiny_cfg, fused=True)
    assert model > 0
    # block-diag fusion multiplies off-block zeros — strictly more GEMM
    # work than the modular math it replaces
    assert executed > model


def test_mfm_step_flops_scale_linearly_with_batch(tiny_cfg):
    from factorized_tpu.config import best_acc_mosi_config

    double = best_acc_mosi_config(batchsize=8, seqlength=3,
                                  input_dims=[6, 5, 4])
    f1 = model_train_flops_per_step(tiny_cfg)
    f2 = model_train_flops_per_step(double)
    # per-sample GEMMs double exactly; the MMD kernel terms are
    # quadratic in batch, so the ratio sits a bit above 2
    assert 2.0 <= f2 / f1 < 4.0


def test_fused_flag_restored_after_trace(tiny_cfg):
    from factorized_tpu.models import mfm

    before = mfm.FUSED
    model_train_flops_per_step(tiny_cfg, fused=not before)
    assert mfm.FUSED is before


def test_fused_gate_parity_config_stays_fused():
    from factorized_tpu.benchprog import active_paths, build_cfg
    from factorized_tpu.models.mfm import fused_active

    cfg = build_cfg()
    assert fused_active(cfg)
    assert active_paths(cfg)["fused_blockdiag"] is True


def test_fused_gate_scale_config_goes_modular():
    from factorized_tpu.benchprog import active_paths, scale_cfg
    from factorized_tpu.models.mfm import fused_active

    cfg = scale_cfg()
    assert not fused_active(cfg)
    paths = active_paths(cfg)
    assert paths == {"fused_blockdiag": False, "encode_pallas": False,
                     "decoder_pallas": False}


def test_fused_force_overrides_gate():
    from factorized_tpu.benchprog import scale_cfg
    from factorized_tpu.models import mfm

    saved = mfm.FUSED
    try:
        mfm.FUSED = True
        assert mfm.fused_active(scale_cfg())
        mfm.FUSED = False
        assert not mfm.fused_active(scale_cfg())
    finally:
        mfm.FUSED = saved
