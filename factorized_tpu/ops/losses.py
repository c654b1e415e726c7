"""Prior-matching and task losses.

Behavioral parity targets:
- ``compute_kernel(x, y)`` (reference ``mfm_model.py:14-23``): RBF-ish
  kernel ``exp(-mean_dim((x_i - y_j)^2) / dim)``. Note the reference
  divides by ``dim`` twice (``.mean(2)/float(dim)``) — the exponent is
  ``-||x_i - y_j||^2 / dim^2``. We reproduce that exactly.
- ``loss_MMD(z)`` (``mfm_model.py:25-34``): MMD between the latents and
  a FRESH N(0, I) sample drawn every call — a stochastic regularizer.
  JAX makes the randomness explicit via a PRNG key.
- ``loss_KLD(mu, logvar)`` (``mfm_model.py:36-38``): summed (not meaned)
  Gaussian KL to N(0, I).
- Task losses: ``nn.L1Loss`` / ``nn.MSELoss`` (mean over all elements)
  and ``nn.CrossEntropyLoss`` (mean over batch) as composed by the
  trainers (``mfm_mosi.py:437-439``, ``mfm_moud.py:333-338``).

TPU-first notes: the pairwise squared distances use the
``||x||^2 + ||y||^2 - 2 x.y`` expansion so the n x n kernel matrix comes
from one MXU matmul instead of an O(n^2 d) broadcast subtract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_kernel(x, y):
    """Kernel matrix (n_x, n_y): exp(-sqdist(x_i, y_j) / dim^2)."""
    dim = x.shape[1]
    x2 = jnp.sum(x * x, axis=1, keepdims=True)  # (n_x, 1)
    y2 = jnp.sum(y * y, axis=1, keepdims=True)  # (n_y, 1)
    sq = x2 + y2.T - 2.0 * (x @ y.T)
    sq = jnp.maximum(sq, 0.0)  # guard fp cancellation
    return jnp.exp(-sq / float(dim * dim))


def loss_mmd(key, z):
    """MMD(z, N(0,I)) with a fresh Gaussian sample of z's shape."""
    r = jax.random.normal(key, z.shape, z.dtype)
    return (
        jnp.mean(compute_kernel(r, r))
        + jnp.mean(compute_kernel(z, z))
        - 2.0 * jnp.mean(compute_kernel(r, z))
    )


def loss_kld(mu, logvar):
    """Summed KL( N(mu, exp(logvar)) || N(0, I) )."""
    return -0.5 * jnp.sum(1.0 + logvar - mu * mu - jnp.exp(logvar))


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred, target):
    d = pred - target
    return jnp.mean(d * d)


def cross_entropy_loss(logits, labels):
    """Mean cross-entropy over the batch; labels are integer classes."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))
