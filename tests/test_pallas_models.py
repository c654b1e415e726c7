"""Registry-wide Pallas-vs-scan gradient parity.

Every model family routes through some mix of the three streamed Pallas
kernels (encode mega-kernel, multi-cell LSTM, decoder). This sweep
forces the Pallas path (interpret mode on CPU) for EVERY registry model
and asserts full-model gradients match the pure-XLA scan path — the
integration net under kernel rewrites that per-kernel tests can miss.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import factorized_tpu.ops.fused as fused
from factorized_tpu.config import MFMConfig
from factorized_tpu.models import get_model
from factorized_tpu.models.registry import MODELS

CFG = MFMConfig(
    input_dims=[7, 4, 5], h_dims=[6, 5, 4], memsize=6,
    zy_size=5, zl_size=6, za_size=4, zv_size=5,
    fy_size=4, fl_size=5, fa_size=4, fv_size=3,
    att1_shape=8, att2_shape=8, gamma1_shape=8, gamma2_shape=8,
    att1_drop=0.3, att2_drop=0.0, gamma1_drop=0.2, gamma2_drop=0.0,
    seqlength=4, batchsize=4,
)


def _scalarize(out):
    return sum(jnp.sum(jnp.asarray(leaf) ** 2)
               for leaf in jax.tree.leaves(out))


# Quick tier keeps one representative per kernel-usage class (flagship
# mfm; kl_ef = 4-chain multi-cell fused scan; missing = 6 surrogate
# chains + 4-way decode; mfn = predictor head, covers the plain
# encoder path). The rest of the registry runs in the full suite —
# same sweep, slow-marked (the per-model cost is interpret-mode Pallas
# tracing, ~10-16s each on the single-core CI host).
_QUICK = {"mfm", "kl_ef", "missing", "mfn"}


@pytest.mark.parametrize(
    "name",
    [n if n in _QUICK else pytest.param(n, marks=pytest.mark.slow)
     for n in sorted(MODELS)])
def test_grads_match_scan(name):
    init, apply_fn = get_model(name)
    params = init(jax.random.PRNGKey(0), CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 4, CFG.d_total))
    key = jax.random.PRNGKey(2)

    def loss(params):
        return _scalarize(apply_fn(params, x, CFG, key=key, train=True))

    old = fused.USE_PALLAS
    try:
        fused.USE_PALLAS = True
        g_p = jax.grad(loss)(params)
        fused.USE_PALLAS = False
        g_s = jax.grad(loss)(params)
    finally:
        fused.USE_PALLAS = old

    leaves_p = jax.tree.leaves(g_p)
    leaves_s = jax.tree.leaves(g_s)
    assert leaves_p and len(leaves_p) == len(leaves_s)
    for a, b in zip(leaves_p, leaves_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=3e-5)
