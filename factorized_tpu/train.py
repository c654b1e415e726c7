"""Training core: fused XLA train steps and whole-epoch scan programs.

Reference behavior being rebuilt (mirrored trainer-by-trainer in
:mod:`factorized_tpu.trainers`):
- per-batch loop with host->device transfer every batch
  (``mfm_mosi.py:419-443``) becomes ONE jitted program per epoch — a
  ``lax.scan`` over device-resident minibatches in which forward,
  losses, backward and the Adam update are a single XLA computation;
- loss composition ``disc + gen + lda_mmd*mmd + missing``
  (``mfm_mosi.py:439``), the two-stage beta-VAE schedule
  (``mfm_mosi.py:278-281``), the 4-way missing-modality losses
  (``mfm_mosi.py:971-981``), seq2seq (``819-823``) and basic_missing
  (``1153-1157``);
- torch's ``ReduceLROnPlateau`` runs host-side between epochs; the LR
  is injected via ``optax.inject_hyperparams`` so changing it never
  recompiles.

The MMD terms resample N(0, I) every forward (``mfm_model.py:26``), so
each minibatch consumes a distinct PRNG key, pre-split and scanned.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from factorized_tpu.ops.losses import cross_entropy_loss, l1_loss, l2_loss


# ------------------------------------------------------------ batching

def shuffle_and_time_major(X, y, seed_or_rng):
    """Reference preamble: permute samples once (NOT per epoch), then
    swap to time-major (``mfm_mosi.py:226-232``)."""
    rng = (
        seed_or_rng
        if isinstance(seed_or_rng, np.random.RandomState)
        else np.random.RandomState(seed_or_rng)
    )
    p = rng.permutation(X.shape[0])
    X = np.ascontiguousarray(np.asarray(X)[p].swapaxes(0, 1), dtype=np.float32)
    return X, np.asarray(y)[p]


def make_batches(X, y, batchsize: int, include_remainder: bool):
    """X time-major (t, N, d) -> (Xb (nb,t,B,d), yb (nb,B), remainder).

    The MOSI trainers drop the remainder (``mfm_mosi.py:423``); the
    classification trainers run one extra (ragged) batch
    (``mfm_moud.py:314-319``) — we return it separately so it gets its
    own fixed-shape compiled step instead of shape churn inside jit.
    """
    t, n, d = X.shape
    nb = n // batchsize
    if nb == 0:
        raise ValueError(
            f"batchsize {batchsize} exceeds the {n} training samples - "
            f"no full batch can be formed")
    Xb = X[:, : nb * batchsize].reshape(t, nb, batchsize, d).transpose(1, 0, 2, 3)
    # y may be (n,) scalar labels or (n, n_traits) multi-trait vectors
    yb = y[: nb * batchsize].reshape(nb, batchsize, *y.shape[1:])
    rem = None
    if include_remainder and n % batchsize:
        rem = (X[:, nb * batchsize :], y[nb * batchsize :])
    return np.ascontiguousarray(Xb), yb, rem


# ------------------------------------------------------ loss composition

def _split_x(x, input_dims):
    d_l, d_a, d_v = input_dims
    return x[..., :d_l], x[..., d_l : d_l + d_a], x[..., d_l + d_a :]


def _disc(y_hat, y, task: str):
    if task == "classification":
        return cross_entropy_loss(y_hat, y)
    if y_hat.ndim == y.ndim:
        # multi-trait regression: vector labels, no squeeze
        return l1_loss(y_hat, y)
    return l1_loss(jnp.squeeze(y_hat, axis=1), y)


def make_loss_fn(apply_fn, cfg, variant: str, stage: int = 0) -> Callable:
    """Build ``loss_fn(params, x, y, key) -> (loss, tracked)``.

    ``tracked`` is the quantity the reference accumulates into the
    printed per-epoch train loss (it differs per trainer).
    """
    task = cfg.task

    if variant in ("joint", "beta_vae"):

        def loss_fn(params, x, y, key):
            k1, k2 = jax.random.split(key)
            decoded, reg, missing = apply_fn(params, x, cfg, key=k1, train=True)
            x_l_hat, x_a_hat, x_v_hat, y_hat = decoded
            x_l, x_a, x_v = _split_x(x, cfg.input_dims)
            gen = (
                cfg.lda_xl * l2_loss(x_l_hat, x_l)
                + cfg.lda_xa * l2_loss(x_a_hat, x_a)
                + cfg.lda_xv * l2_loss(x_v_hat, x_v)
            )
            disc = _disc(y_hat, y, task)
            reg = cfg.lda_mmd * reg
            if variant == "joint":
                loss = disc + gen + reg + missing
                tracked = disc
            elif stage == 1:
                loss = gen + reg
                tracked = loss
            else:  # stage 2
                loss = disc + reg
                tracked = loss
            return loss, tracked

    elif variant == "missing":

        def loss_fn(params, x, y, key):
            k1, _ = jax.random.split(key)
            (decoded, dec_nol, dec_noa, dec_nov, mmd, missing) = apply_fn(
                params, x, cfg, key=k1, train=True
            )
            x_l, x_a, x_v = _split_x(x, cfg.input_dims)
            gen = (
                cfg.lda_xl * l2_loss(decoded[0], x_l)
                + cfg.lda_xa * l2_loss(decoded[1], x_a)
                + cfg.lda_xv * l2_loss(decoded[2], x_v)
                + cfg.lda_xl * l2_loss(dec_nol[0], x_l)
                + cfg.lda_xa * l2_loss(dec_noa[1], x_a)
                # NOTE reference bug reproduced: uses x_v_hat_NOA where
                # nov is meant (mfm_mosi.py:976)
                + cfg.lda_xv * l2_loss(dec_noa[2], x_v)
            )
            disc = (
                _disc(decoded[3], y, task)
                + _disc(dec_nol[3], y, task)
                + _disc(dec_noa[3], y, task)
                + _disc(dec_nov[3], y, task)
            )
            loss = disc + gen + cfg.lda_mmd * mmd + missing
            return loss, l2_loss(decoded[0], x_l)

    elif variant == "s2s":

        def loss_fn(params, x, y, key):
            k1, _ = jax.random.split(key)
            nol, noa, nov, mmd = apply_fn(params, x, cfg, key=k1, train=True)
            x_l, x_a, x_v = _split_x(x, cfg.input_dims)
            gen = (
                cfg.lda_xl * l2_loss(nol[0], x_l)
                + cfg.lda_xa * l2_loss(noa[0], x_a)
                + cfg.lda_xv * l2_loss(nov[0], x_v)
                + cfg.lda_mmd * mmd
            )
            return gen, gen

    elif variant == "bm":

        def loss_fn(params, x, y, key):
            k1, _ = jax.random.split(key)
            y_nol, y_noa, y_nov, mmd = apply_fn(params, x, cfg, key=k1, train=True)
            disc = (
                _disc(y_nol, y, task)
                + _disc(y_noa, y, task)
                + _disc(y_nov, y, task)
                + cfg.lda_mmd * mmd
            )
            return disc, disc

    else:
        raise ValueError(f"unknown loss variant {variant!r}")

    return loss_fn


# -------------------------------------------------------- eval functions

def make_eval_fn(apply_fn, cfg, variant: str):
    """Validation loss, matching each reference trainer's ``evaluate``."""
    task = cfg.task

    if variant in ("joint", "beta_vae"):

        def eval_fn(params, x, y, key):
            decoded, _, _ = apply_fn(params, x, cfg, key=key, train=False)
            return _disc(decoded[3], y, task)

    elif variant == "missing":

        def eval_fn(params, x, y, key):
            # reference evaluates the FULL composite loss in eval mode
            # (mfm_mosi.py:987-1021); dropout off but same math
            (decoded, dec_nol, dec_noa, dec_nov, mmd, missing) = apply_fn(
                params, x, cfg, key=key, train=False
            )
            x_l, x_a, x_v = _split_x(x, cfg.input_dims)
            gen = (
                cfg.lda_xl * l2_loss(decoded[0], x_l)
                + cfg.lda_xa * l2_loss(decoded[1], x_a)
                + cfg.lda_xv * l2_loss(decoded[2], x_v)
                + cfg.lda_xl * l2_loss(dec_nol[0], x_l)
                + cfg.lda_xa * l2_loss(dec_noa[1], x_a)
                + cfg.lda_xv * l2_loss(dec_noa[2], x_v)  # same bug as train
            )
            disc = (
                _disc(decoded[3], y, task)
                + _disc(dec_nol[3], y, task)
                + _disc(dec_noa[3], y, task)
                + _disc(dec_nov[3], y, task)
            )
            return disc + gen + cfg.lda_mmd * mmd + missing

    elif variant == "s2s":

        def eval_fn(params, x, y, key):
            nol, noa, nov, _ = apply_fn(params, x, cfg, key=key, train=False)
            x_l, x_a, x_v = _split_x(x, cfg.input_dims)
            return (
                cfg.lda_xl * l2_loss(nol[0], x_l)
                + cfg.lda_xa * l2_loss(noa[0], x_a)
                + cfg.lda_xv * l2_loss(nov[0], x_v)
            )

    elif variant == "bm":

        def eval_fn(params, x, y, key):
            y_nol, _, _, _ = apply_fn(params, x, cfg, key=key, train=False)
            return _disc(y_nol, y, task)

    else:
        raise ValueError(variant)

    return eval_fn


# ------------------------------------------------------- optimizer setup

def make_optimizer(name: str, lr: float = None, momentum: float = 0.9):
    """LR-less gradient transform; the step applies ``p - lr * u`` with
    lr as a traced scalar argument, so ReduceLROnPlateau changes never
    recompile.

    Implementation notes (measured on v5e, MFM size, 39-batch epoch):
    - ``optax.inject_hyperparams`` cost 4x runtime (263ms vs 69ms/epoch)
      — avoided entirely;
    - ``optax.flatten`` collapses the per-leaf update ops into
      single-vector ops: epoch compile 11s vs 204s un-flattened.

    Semantics match torch: Adam (b1=.9, b2=.999, eps=1e-8, update
    ``m_hat/(sqrt(v_hat)+eps)``), SGD ``buf = mu*buf + g; p -= lr*buf``.
    ``lr`` is accepted for signature compatibility and ignored here.
    """
    if name == "adam":
        return optax.flatten(optax.scale_by_adam(eps=1e-8))
    if name == "sgd":
        return optax.flatten(optax.trace(decay=momentum))
    raise ValueError(f"unknown optimizer {name!r}")


# ------------------------------------------------------ epoch machinery

# Epochs per device dispatch in the single-seed trainer loop when no
# checkpoint cadence dictates the boundary (see trainers._loop). The
# per-epoch host loop cost ~594ms/epoch through the TPU tunnel (4+
# dispatch round-trips per epoch: epoch, eval, tracked-loss pull,
# best-params pull) vs ~51ms of actual epoch compute — chunking moves
# the round-trip to once per chunk, like parallel/multiseed.py does for
# the search loop.
DEFAULT_EPOCH_CHUNK = 10


def _compile_chunked_loop(epoch_fn, step_fn, eval_fn, *, mode="min",
                          save_always=False, with_rem=False, sched_kw=()):
    """Jitted multi-epoch program for the single-seed trainer loop:
    ``lax.scan`` over ``n_epochs`` (static) iterations of [train epoch
    -> full-set eval -> best-params select -> plateau scheduler step],
    everything on device.

    Semantics mirror ``trainers._loop`` exactly:
    - PRNG chain: one 3-way split per epoch; the epoch key feeds the
      same per-batch split as ``TrainProgram.epoch``; the remainder
      batch folds in ``nb`` like ``TrainProgram.run_epoch``;
    - best-keeper: ``<=`` (min) / ``>=`` (max) against the incumbent,
      exactly :class:`utils.checkpoint.BestKeeper`; ``save_always``
      keeps every healthy epoch (the beta-VAE ``if True:`` save,
      ``mfm_mosi.py:342``);
    - scheduler: :func:`utils.scheduler.plateau_step` on a 1-lane
      state, the functional twin of the host ``ReduceLROnPlateau``;
    - divergence: a non-finite train or valid loss latches ``alive``
      off — no further keeper/scheduler updates happen AND the carried
      params/opt_state freeze (``lax.cond`` skips the train epoch),
      matching the host loop's break-before-update exactly, including
      the live params a pre-first-save divergence returns.

    ``eval_fn(params, x, y, key)`` must return a scalar; pass the
    accuracy closure (mode='max') for the acc-maximizing trainer.

    Returns ``run(params, opt_state, best_p, best_v, sched, alive,
    Xb, yb, rem_x, rem_y, Xv, yv, key, n_epochs)`` -> advanced carry +
    stacked per-epoch (tracked, valid, lr, saved, ok).
    """
    from factorized_tpu.utils.scheduler import plateau_step

    sched_kw = dict(sched_kw)

    def run(params, opt_state, best_p, best_v, sched, alive,
            Xb, yb, rem_x, rem_y, Xv, yv, key, n_epochs):
        nb = Xb.shape[0]

        def body(carry, _):
            params, opt_state, best_p, best_v, sched, alive, key = carry
            key, ek, vk = jax.random.split(key, 3)
            lr = sched["lr"][0]

            def advance(state):
                params, opt_state = state
                params, opt_state, acc = epoch_fn(params, opt_state,
                                                  Xb, yb, ek, lr)
                if with_rem:
                    rkey = jax.random.fold_in(ek, nb)
                    params, opt_state, r_tracked = step_fn(
                        params, opt_state, rem_x, rem_y, rkey, lr)
                    # reference sums nb+1 batches, divides by nb
                    # (mfm_moud.py:314,342)
                    acc = acc + r_tracked / nb
                return params, opt_state, acc

            def hold(state):
                params, opt_state = state
                return params, opt_state, jnp.full((), jnp.nan,
                                                   jnp.float32)

            # a dead run stops ADVANCING, not just recording: after the
            # diverged epoch the carried params/opt_state freeze exactly
            # where the host loop's break leaves them, so even a
            # pre-first-save divergence returns identical live params on
            # both paths (the `hold` branch is never taken while alive,
            # so healthy runs pay nothing)
            params, opt_state, acc = jax.lax.cond(
                alive, advance, hold, (params, opt_state))
            valid = eval_fn(params, Xv, yv, vk)
            ok = alive & jnp.isfinite(acc) & jnp.isfinite(valid)
            if mode == "min":
                better = ok & (valid <= best_v)
            else:
                better = ok & (valid >= best_v)
            take = ok if save_always else better
            best_v = jnp.where(take, valid, best_v)
            best_p = jax.tree.map(
                lambda n, o: jnp.where(take, n, o), params, best_p)
            new_sched = plateau_step(sched, valid.reshape(1), **sched_kw)
            sched = jax.tree.map(
                lambda n, o: jnp.where(ok, n, o), new_sched, sched)
            return ((params, opt_state, best_p, best_v, sched, ok, key),
                    (acc, valid, sched["lr"][0], take, ok))

        carry, ys = jax.lax.scan(
            body, (params, opt_state, best_p, best_v, sched, alive, key),
            None, length=n_epochs)
        return carry + ys

    return jax.jit(run, static_argnums=(13,),
                   donate_argnums=(0, 1, 2, 3, 4))


class TrainProgram:
    """Compiled training/eval programs for one (model, cfg, variant).

    - ``epoch(params, opt_state, Xb, yb, key)`` — scan over minibatches,
      whole epoch on device, returns (params, opt_state, mean_tracked).
    - ``step(params, opt_state, x, y, key)`` — single batch (used for
      the ragged remainder batch at its own fixed shape).
    - ``evaluate(params, x, y, key)`` — full-set validation loss.
    """

    def __init__(self, apply_fn, cfg, variant: str, optimizer, stage: int = 0,
                 loss_fn=None, eval_fn=None):
        self.cfg = cfg
        self.optimizer = optimizer
        if loss_fn is None:
            loss_fn = make_loss_fn(apply_fn, cfg, variant, stage)
        if eval_fn is None:
            eval_fn = make_eval_fn(apply_fn, cfg, variant)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def step(params, opt_state, x, y, key, lr):
            (_, tracked), grads = grad_fn(params, x, y, key)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p - lr * u, params, updates)
            return params, opt_state, tracked

        def epoch(params, opt_state, Xb, yb, key, lr):
            nb = Xb.shape[0]
            keys = jax.random.split(key, nb)

            def body(carry, batch):
                params, opt_state, acc = carry
                x, y, k = batch
                params, opt_state, tracked = step(params, opt_state, x, y,
                                                  k, lr)
                return (params, opt_state, acc + tracked), None

            (params, opt_state, acc), _ = jax.lax.scan(
                body, (params, opt_state, jnp.zeros((), jnp.float32)),
                (Xb, yb, keys)
            )
            return params, opt_state, acc / nb

        self.epoch = jax.jit(epoch, donate_argnums=(0, 1))
        self.step = jax.jit(step, donate_argnums=(0, 1))
        self.evaluate = jax.jit(eval_fn)
        # unjitted closures, inlined into the chunked multi-epoch program
        self._raw = (epoch, step, eval_fn)
        self._chunk_cache = {}

    def chunked_loop(self, *, eval_device=None, mode="min",
                     save_always=False, with_rem=False, sched_kw=()):
        """Cached jitted multi-epoch chunk program (see
        :func:`_compile_chunked_loop`). ``eval_device`` overrides the
        program's eval (the acc-maximizing trainer's accuracy metric).
        Cached per override closure IDENTITY — passing a different
        eval_device compiles a fresh program instead of silently reusing
        the first one's metric; the closure is pinned in the cache entry
        so a recycled id() can never alias a dead closure."""
        epoch, step, eval_fn = self._raw
        key = (None if eval_device is None else id(eval_device),
               mode, save_always, with_rem,
               tuple(sorted(dict(sched_kw).items())))
        if key not in self._chunk_cache:
            self._chunk_cache[key] = (eval_device, _compile_chunked_loop(
                epoch, step, eval_device or eval_fn, mode=mode,
                save_always=save_always, with_rem=with_rem,
                sched_kw=sched_kw))
        return self._chunk_cache[key][1]

    def run_epoch(self, params, opt_state, Xb, yb, key, lr,
                  remainder=None):
        """One epoch incl. the optional ragged remainder batch. Returns
        (params, opt_state, mean_tracked_over_full_batches). ``lr`` is
        passed as a traced f32 scalar so scheduler changes never
        recompile."""
        nb = Xb.shape[0]
        lr = jnp.asarray(lr, jnp.float32)
        params, opt_state, acc = self.epoch(params, opt_state, Xb, yb,
                                            key, lr)
        if remainder is not None and remainder[0].shape[1] > 0:
            rx, ry = remainder
            rkey = jax.random.fold_in(key, nb)
            params, opt_state, r_tracked = self.step(
                params, opt_state, rx, ry, rkey, lr
            )
            # reference sums over nb+1 batches but divides by nb
            # (mfm_moud.py:314,342) — reproduce that mean
            acc = acc + r_tracked / nb
        return params, opt_state, float(acc)
