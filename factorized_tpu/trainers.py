"""Experiment-level trainers, one per reference training loop:

=====================  =========================================
this module            reference
=====================  =========================================
train_mfm              ``mfm_mosi.py:386-503`` (MFM / MFM_KL, joint loss)
train_beta_vae         ``mfm_mosi.py:225-384`` (two-stage, MFM_KL_EF)
train_mfm_missing      ``mfm_mosi.py:918-1106``
train_mfm_test_zeros   ``mfm_mosi.py:505-638``
train_mfm_ablation     ``mfm_mosi.py:640-767`` (M_A..M_D)
train_seq2seq          ``mfm_mosi.py:769-916``
train_basic_missing    ``mfm_mosi.py:1108-1225``
train_mfm_acc          ``mfm_mosi_acc.py:396-503`` (acc-maximizing)
train_predictor        ``test_mosi.py`` EFLSTM/MFN heads,
                       ``test_attention.py:308-404`` SelfAttention
=====================  =========================================

Each takes numpy arrays shaped like the reference loaders emit
(batch-major ``(n, t, d)`` X, 1-D y) plus an :class:`MFMConfig`; the
whole epoch runs as one XLA program (see :mod:`factorized_tpu.train`).
Every trainer returns a results dict with test metrics, the best params
pytree and per-epoch history.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from factorized_tpu.models import get_model
from factorized_tpu.ops.losses import l2_loss
from factorized_tpu.train import (
    TrainProgram,
    make_batches,
    make_optimizer,
    shuffle_and_time_major,
)
from factorized_tpu.utils.checkpoint import BestKeeper
from factorized_tpu.utils.logging import RunLogger
from factorized_tpu.utils.metrics import (
    accuracy,
    score_classification,
    score_regression,
)
from factorized_tpu.utils.scheduler import ReduceLROnPlateau


def _prep_data(X_train, y_train, X_valid, y_valid, X_test, y_test, seed):
    X_train, y_train = shuffle_and_time_major(X_train, y_train, seed)
    X_valid = np.ascontiguousarray(
        np.asarray(X_valid).swapaxes(0, 1), dtype=np.float32
    )
    X_test = np.ascontiguousarray(
        np.asarray(X_test).swapaxes(0, 1), dtype=np.float32
    )
    return X_train, y_train, X_valid, np.asarray(y_valid), X_test, np.asarray(y_test)


def _labels(y, cfg):
    return y.astype(np.int32) if cfg.task == "classification" else y.astype(np.float32)


def _loop(
    program,
    params,
    opt_state,
    Xb,
    yb,
    remainder,
    Xv,
    yv,
    num_epochs,
    scheduler,
    keeper,
    logger,
    key,
    save_always=False,
    eval_metric=None,
    snapshot=None,
    eval_device=None,
):
    """The trainer epoch loop: train epoch -> full-set eval -> RLROP ->
    best-valid checkpointing — the shape of every reference trainer
    (``mfm_mosi.py:467-479``) — plus divergence detection (NaN/inf
    losses abort the run and are recorded; the reference would silently
    checkpoint garbage).

    Runs CHUNKS of epochs as one device program by default (eval,
    scheduler and best-select all in-scan; see
    ``train._compile_chunked_loop`` — the per-epoch host round-trip
    cost ~590ms/epoch through the TPU tunnel vs ~50ms of compute).
    Falls back to the per-epoch host loop when a host-only
    ``eval_metric`` has no ``eval_device`` twin, when a ``snapshot``
    callback has no declared cadence (``.every``), or when
    ``FACTORIZED_TPU_HOST_LOOP=1`` (the A/B switch; chunked-vs-host
    parity is asserted in tests/test_chunked_loop.py).

    ``snapshot``: optional crash-resume hook called as
    ``snapshot(epoch, params, opt_state, lr, best_valid)``; the
    callback decides its own cadence (see ``cli.make_autosnapshot`` /
    ``--ckpt-every``) and declares it via a ``.every`` attribute so
    chunk boundaries can align to it."""
    import os

    if num_epochs <= 0:
        return params, opt_state, []
    chunkable = (
        os.environ.get("FACTORIZED_TPU_HOST_LOOP", "") != "1"
        and (eval_metric is None or eval_device is not None)
        and (snapshot is None or getattr(snapshot, "every", None))
    )
    if chunkable:
        return _loop_chunked(program, params, opt_state, Xb, yb, remainder,
                             Xv, yv, num_epochs, scheduler, keeper, logger,
                             key, save_always, eval_device, snapshot)
    return _loop_host(program, params, opt_state, Xb, yb, remainder, Xv, yv,
                      num_epochs, scheduler, keeper, logger, key,
                      save_always, eval_metric, snapshot)


def _loop_chunked(program, params, opt_state, Xb, yb, remainder, Xv, yv,
                  num_epochs, scheduler, keeper, logger, key,
                  save_always, eval_device, snapshot):
    """Chunked twin of :func:`_loop_host`: same key chain, keeper,
    scheduler and divergence semantics, one dispatch per chunk. After a
    NaN/inf epoch the ``alive`` gate freezes bookkeeping AND the
    carried params/opt_state (``lax.cond`` in
    ``train._compile_chunked_loop``), so even a run that diverges
    before its first save returns the same live params as the host
    loop's break (asserted in tests/test_chunked_loop.py)."""
    from factorized_tpu.train import DEFAULT_EPOCH_CHUNK

    with_rem = remainder is not None and remainder[0].shape[1] > 0
    sched_kw = {"mode": scheduler.mode, "factor": scheduler.factor,
                "patience": scheduler.patience,
                "threshold": scheduler.threshold,
                "cooldown": scheduler.cooldown, "min_lr": scheduler.min_lr}
    run = program.chunked_loop(eval_device=eval_device, mode=keeper.mode,
                               save_always=save_always, with_rem=with_rem,
                               sched_kw=sched_kw)
    Xb, yb = jax.device_put(Xb), jax.device_put(yb)
    Xv, yv = jax.device_put(Xv), jax.device_put(yv)
    rem_x = jax.device_put(remainder[0]) if with_rem else None
    rem_y = jax.device_put(remainder[1]) if with_rem else None
    # mirror the live host scheduler/keeper state onto the device
    sched = {"lr": jnp.asarray([scheduler.lr], jnp.float32),
             "best": jnp.asarray([scheduler.best], jnp.float32),
             "bad": jnp.asarray([scheduler.num_bad_epochs], jnp.int32),
             "cooldown": jnp.asarray([scheduler.cooldown_counter], jnp.int32)}
    best_v = jnp.asarray(keeper.best, jnp.float32)
    best_p = (jax.device_put(keeper.best_params)
              if keeper.best_params is not None
              else jax.tree.map(jnp.zeros_like, params))
    alive = jnp.asarray(True)

    every = getattr(snapshot, "every", None) if snapshot else None
    offset = getattr(snapshot, "offset", 0) if snapshot else 0
    # boundaries anchored at ABSOLUTE epoch 0 and aligned to the
    # snapshot cadence, so a resumed run re-enters on a boundary and
    # reproduces the uninterrupted run's programs exactly.
    # FACTORIZED_TPU_EPOCH_CHUNK overrides the default chunk size
    # (tests use a small value so multi-chunk carry threading is
    # exercised with a single compiled chunk shape).
    import os as _os

    env_chunk = int(_os.environ.get("FACTORIZED_TPU_EPOCH_CHUNK", 0))
    chunk = int(every) if every else (
        env_chunk or min(num_epochs, DEFAULT_EPOCH_CHUNK) or 1)
    history = []
    any_saved = keeper.best_params is not None
    diverged = False
    e = 0
    while e < num_epochs and not diverged:
        n = min(chunk - (offset + e) % chunk, num_epochs - e)
        (params, opt_state, best_p, best_v, sched, alive, key,
         trackeds, valids, lrs, saveds, oks) = run(
            params, opt_state, best_p, best_v, sched, alive,
            Xb, yb, rem_x, rem_y, Xv, yv, key, n)
        trackeds, valids = np.asarray(trackeds), np.asarray(valids)
        lrs, saveds, oks = np.asarray(lrs), np.asarray(saveds), np.asarray(oks)
        for j in range(n):
            ep = e + j
            tl, vl = float(trackeds[j]), float(valids[j])
            if not oks[j]:
                logger.text(ep, tl, vl, "DIVERGED - aborting run")
                logger.record("diverged", epoch=ep, train_loss=tl,
                              valid_loss=vl)
                history.append({"epoch": ep, "train_loss": tl, "valid": vl,
                                "diverged": True})
                diverged = True
                break
            saved = bool(saveds[j])
            if saved:
                any_saved = True
                keeper.best_epoch = ep
            logger.epoch(ep, tl, vl, saved, lr=float(lrs[j]))
            history.append({"epoch": ep, "train_loss": tl, "valid": vl,
                            "lr": float(lrs[j])})
        e += n
        if not diverged and snapshot is not None:
            cur_best = float(best_v) if any_saved else keeper.best
            snapshot(e - 1, params, opt_state, float(sched["lr"][0]),
                     cur_best)
    if any_saved:
        keeper.best = float(best_v)
        keeper.best_params = jax.tree.map(np.asarray, best_p)
    scheduler.lr = float(sched["lr"][0])
    scheduler.best = float(sched["best"][0])
    scheduler.num_bad_epochs = int(sched["bad"][0])
    scheduler.cooldown_counter = int(sched["cooldown"][0])
    return params, opt_state, history


def _loop_host(
    program,
    params,
    opt_state,
    Xb,
    yb,
    remainder,
    Xv,
    yv,
    num_epochs,
    scheduler,
    keeper,
    logger,
    key,
    save_always=False,
    eval_metric=None,
    snapshot=None,
):
    """The original per-epoch host loop (one epoch dispatch + one eval
    dispatch + host scheduler/keeper per epoch)."""
    history = []
    lr = scheduler.lr
    # device-resident epoch tensors: uploaded once, reused every epoch
    # (numpy args would re-transfer host->device per call)
    Xb = jax.device_put(Xb)
    yb = jax.device_put(yb)
    Xv = jax.device_put(Xv)
    yv = jax.device_put(yv)
    for epoch in range(num_epochs):
        key, ek, vk = jax.random.split(key, 3)
        params, opt_state, train_loss = program.run_epoch(
            params, opt_state, Xb, yb, ek, lr, remainder
        )
        if eval_metric is None:
            valid = float(program.evaluate(params, Xv, yv, vk))
        else:
            valid = eval_metric(params, Xv, yv, vk)
        if not (np.isfinite(train_loss) and np.isfinite(valid)):
            logger.text(epoch, train_loss, valid, "DIVERGED - aborting run")
            logger.record("diverged", epoch=epoch, train_loss=train_loss,
                          valid_loss=valid)
            history.append({"epoch": epoch, "train_loss": train_loss,
                            "valid": valid, "diverged": True})
            break
        lr = scheduler.step(valid)
        saved = keeper.update(valid, params, epoch)
        if save_always and not saved:
            keeper.best = valid
            keeper.best_params = jax.tree.map(np.asarray, params)
            keeper.best_epoch = epoch
            saved = True
        logger.epoch(epoch, train_loss, valid, saved, lr=lr)
        history.append({"epoch": epoch, "train_loss": train_loss,
                        "valid": valid, "lr": lr})
        if snapshot is not None:
            snapshot(epoch, params, opt_state, lr, keeper.best)
    return params, opt_state, history


def _offset_snapshot(snapshot, start_epoch):
    """Shift a snapshot callback's epoch numbering by the resume
    offset so recorded steps stay absolute across resumes. The
    cadence declaration (``.every``) is propagated and the offset
    recorded (``.offset``) so the chunked loop can align its chunk
    boundaries to ABSOLUTE epochs (see :func:`_loop_chunked`)."""
    if snapshot is None or not start_epoch:
        return snapshot

    def shifted(e, *a):
        return snapshot(start_epoch + e, *a)

    shifted.every = getattr(snapshot, "every", None)
    shifted.offset = start_epoch
    return shifted


def _score(logger, y_hat, y_test, cfg, binary_threshold, threshold_mode):
    if cfg.task == "classification":
        return score_classification(y_hat, y_test)
    return score_regression(y_hat, y_test, binary_threshold, threshold_mode)


def _std_predict(apply_fn, cfg):
    squeeze = cfg.task == "regression" and cfg.output_dim == 1

    @jax.jit
    def predict(params, x, key):
        decoded, _, _ = apply_fn(params, x, cfg, key=key, train=False)
        y_hat = decoded[3]
        return jnp.squeeze(y_hat, 1) if squeeze else y_hat

    return predict


def _maybe_resume(resume_from, params, opt_state, logger):
    """Restore ``(params, opt_state, start_epoch, lr, best_valid)`` from
    a checkpoint directory written by the CLI's ``--save-ckpt`` (resume
    is a capability the reference lacks entirely; SURVEY.md §5.4).
    No-op returning epoch 0 when ``resume_from`` is falsy."""
    if not resume_from:
        return params, opt_state, 0, None, None
    from factorized_tpu.utils.checkpoint import restore_checkpoint

    state, meta = restore_checkpoint(
        resume_from, target={"params": params, "opt_state": opt_state}
    )
    params, opt_state = state["params"], state["opt_state"]
    start_epoch = meta.get("step", 0)
    # restore schedule/keeper context so dynamics continue from where
    # the run left off (patience counters restart)
    resume_lr = meta.get("config", {}).get("_resume_lr")
    resume_best = meta.get("config", {}).get("_resume_best_valid")
    logger.text(f"resumed from {resume_from} at epoch {start_epoch}"
                + (f" lr={resume_lr}" if resume_lr else ""))
    return params, opt_state, start_epoch, resume_lr, resume_best


def _resume_keeper(keeper, resume_best, params):
    if resume_best is not None:
        keeper.best = resume_best
        keeper.best_params = jax.tree.map(np.asarray, params)
    return keeper


def train_mfm(
    X_train, y_train, X_valid, y_valid, X_test, y_test, cfg, *,
    lr: Optional[float] = None,
    optimizer: str = "adam",
    logger: Optional[RunLogger] = None,
    seed: int = 123,
    binary_threshold: float = 0.0,
    threshold_mode: str = "ge",
    include_remainder: bool = False,
    model_type: Optional[str] = None,
    resume_from: Optional[str] = None,
    snapshot=None,
):
    """Joint single-stage training of MFM / MFM_KL (or any registry
    model with the standard (decoded, reg, missing) return).

    ``resume_from``: a checkpoint directory saved with opt_state —
    training continues from its recorded epoch (a capability the
    reference lacks entirely; SURVEY.md §5.4)."""
    logger = logger or RunLogger()
    Xtr, ytr, Xv, yv, Xte, yte = _prep_data(
        X_train, y_train, X_valid, y_valid, X_test, y_test, seed
    )
    name = model_type or cfg.model_type
    # only types with the standard (decoded, reg, missing) return work
    # in this trainer; anything else is a config error, not a fallback
    standard = ("mfm", "kl", "kl_ef", "m_a", "m_b", "m_c", "m_d")
    if name not in standard:
        raise ValueError(
            f"train_mfm cannot train model type {name!r}; expected one "
            f"of {standard} (use the dedicated trainer otherwise)")
    init, apply_fn = get_model(name)
    key = jax.random.PRNGKey(seed)
    key, ik = jax.random.split(key)
    params = init(ik, cfg)
    # reference uses optim.Adam(model.parameters()) — torch DEFAULT lr
    # 1e-3 (mfm_mosi.py:403), NOT config lr; pass lr= to override (the
    # moud/you trainers do use config lr: mfm_moud.py:466)
    lr = 1e-3 if lr is None else lr
    opt = make_optimizer(optimizer, lr, cfg.momentum)
    opt_state = opt.init(params)

    params, opt_state, start_epoch, resume_lr, resume_best = _maybe_resume(
        resume_from, params, opt_state, logger)

    program = TrainProgram(apply_fn, cfg, "joint", opt)
    Xb, yb, rem = make_batches(Xtr, _labels(ytr, cfg), cfg.batchsize,
                               include_remainder)
    yv_l, yte_l = _labels(yv, cfg), _labels(yte, cfg)

    scheduler = ReduceLROnPlateau(resume_lr or lr)
    keeper = _resume_keeper(BestKeeper("min"), resume_best, params)
    params, opt_state, history = _loop(
        program, params, opt_state, Xb, yb, rem, Xv, yv_l,
        max(cfg.num_epochs - start_epoch, 0), scheduler, keeper, logger,
        jax.random.fold_in(key, start_epoch),
        snapshot=_offset_snapshot(snapshot, start_epoch)
    )

    best_params = keeper.best_params if keeper.best_params is not None else params
    predict = _std_predict(apply_fn, cfg)
    y_hat = np.asarray(predict(best_params, Xte, jax.random.PRNGKey(0)))
    logger.text("scoring y_hat")
    metrics = _score(logger, y_hat, yte_l, cfg, binary_threshold, threshold_mode)
    logger.record("final", **metrics)
    step = start_epoch + sum(1 for e in history if not e.get("diverged"))
    return {"metrics": metrics, "params": best_params,
            "opt_state": opt_state, "history": history,
            "best_valid": keeper.best, "step": step}


def train_beta_vae(
    X_train, y_train, X_valid, y_valid, X_test, y_test, cfg, *,
    lr: Optional[float] = None,
    logger: Optional[RunLogger] = None,
    seed: int = 123,
    binary_threshold: float = 0.0,
    threshold_mode: str = "ge",
    include_remainder: bool = False,
    resume_from: Optional[str] = None,
    snapshot=None,
):
    """Two-stage schedule (``mfm_mosi.py:278-281,338-360``): stage 1
    trains gen+mmd for num_epochs, stage 2 disc+mmd for num_epochs;
    the model is MFM_KL_EF and every epoch's params are kept (the
    reference saves unconditionally: ``if True:`` at 342). One
    scheduler spans BOTH stages — the reference constructs its
    ReduceLROnPlateau once before the stage loops (``mfm_mosi.py:253``),
    so lr decays carry from stage 1 into stage 2.

    ``resume_from``: checkpoint dir saved with opt_state; its recorded
    step counts TOTAL epochs across both stages (stage 1 = epochs
    [0, num_epochs), stage 2 = [num_epochs, 2*num_epochs))."""
    logger = logger or RunLogger()
    Xtr, ytr, Xv, yv, Xte, yte = _prep_data(
        X_train, y_train, X_valid, y_valid, X_test, y_test, seed
    )
    init, apply_fn = get_model("kl_ef")
    key = jax.random.PRNGKey(seed)
    key, ik = jax.random.split(key)
    params = init(ik, cfg)
    lr = 1e-3 if lr is None else lr
    opt = make_optimizer("adam", lr, cfg.momentum)
    opt_state = opt.init(params)

    params, opt_state, start_step, resume_lr, _ = _maybe_resume(
        resume_from, params, opt_state, logger)

    Xb, yb, rem = make_batches(Xtr, _labels(ytr, cfg), cfg.batchsize,
                               include_remainder)
    yv_l, yte_l = _labels(yv, cfg), _labels(yte, cfg)

    history = []
    scheduler = ReduceLROnPlateau(resume_lr or lr)
    for stage in (1, 2):
        done = min(max(start_step - (stage - 1) * cfg.num_epochs, 0),
                   cfg.num_epochs)
        n_epochs = cfg.num_epochs - done
        if n_epochs <= 0:
            continue
        program = TrainProgram(apply_fn, cfg, "beta_vae", opt, stage=stage)
        keeper = BestKeeper("min")
        params, opt_state, h = _loop(
            program, params, opt_state, Xb, yb, rem, Xv, yv_l,
            n_epochs, scheduler, keeper, logger,
            jax.random.fold_in(jax.random.fold_in(key, stage), done),
            save_always=True,
            # total-epoch numbering across both stages (resume semantics)
            snapshot=_offset_snapshot(snapshot,
                                      (stage - 1) * cfg.num_epochs + done),
        )
        history.extend({**e, "stage": stage} for e in h)
        if h and h[-1].get("diverged"):
            break

    predict = _std_predict(apply_fn, cfg)
    y_hat = np.asarray(predict(params, Xte, jax.random.PRNGKey(0)))
    logger.text("scoring y_hat")
    metrics = _score(logger, y_hat, yte_l, cfg, binary_threshold, threshold_mode)
    logger.record("final", **metrics)
    step = start_step + sum(1 for e in history if not e.get("diverged"))
    return {"metrics": metrics, "params": params, "opt_state": opt_state,
            "history": history, "step": step}


def train_mfm_missing(
    X_train, y_train, X_valid, y_valid, X_test, y_test, cfg, *,
    lr: Optional[float] = None,
    logger: Optional[RunLogger] = None,
    seed: int = 123,
    binary_threshold: float = 0.0,
    threshold_mode: str = "ge",
    resume_from: Optional[str] = None,
    snapshot=None,
):
    logger = logger or RunLogger()
    Xtr, ytr, Xv, yv, Xte, yte = _prep_data(
        X_train, y_train, X_valid, y_valid, X_test, y_test, seed
    )
    init, apply_fn = get_model("missing")
    key = jax.random.PRNGKey(seed)
    key, ik = jax.random.split(key)
    params = init(ik, cfg)
    lr = 1e-3 if lr is None else lr
    opt = make_optimizer("adam", lr, cfg.momentum)
    opt_state = opt.init(params)
    params, opt_state, start_epoch, resume_lr, resume_best = _maybe_resume(
        resume_from, params, opt_state, logger)

    program = TrainProgram(apply_fn, cfg, "missing", opt)
    Xb, yb, rem = make_batches(Xtr, _labels(ytr, cfg), cfg.batchsize, False)
    yv_l, yte_l = _labels(yv, cfg), _labels(yte, cfg)

    scheduler = ReduceLROnPlateau(resume_lr or lr)
    keeper = _resume_keeper(BestKeeper("min"), resume_best, params)
    params, opt_state, history = _loop(
        program, params, opt_state, Xb, yb, rem, Xv, yv_l,
        max(cfg.num_epochs - start_epoch, 0), scheduler, keeper, logger,
        jax.random.fold_in(key, start_epoch),
        snapshot=_offset_snapshot(snapshot, start_epoch)
    )
    best_params = keeper.best_params if keeper.best_params is not None else params

    d_l, d_a, d_v = cfg.input_dims

    @jax.jit
    def predict(params, x, key):
        decoded, nol, noa, nov, _, _ = apply_fn(params, x, cfg, key=key,
                                                train=False)
        return decoded, nol, noa, nov

    decoded, nol, noa, nov = predict(best_params, Xte, jax.random.PRNGKey(0))
    x_l, x_a, x_v = Xte[..., :d_l], Xte[..., d_l:d_l + d_a], Xte[..., d_l + d_a:]
    # per-condition reconstruction MSEs (mfm_mosi.py:1040-1058)
    for tag, dec in (("all present", decoded), ("l missing", nol),
                     ("a missing", noa), ("v missing", nov)):
        logger.text(tag, float(l2_loss(dec[0], x_l)),
                    float(l2_loss(dec[1], x_a)), float(l2_loss(dec[2], x_v)))

    def fetch_y(dec):
        y = np.asarray(dec[3])
        return y[:, 0] if cfg.task == "regression" else y

    results = {}
    for tag, dec in (("y_hat_nol", nol), ("y_hat_noa", noa),
                     ("y_hat_nov", nov), ("y_hat", decoded)):
        logger.text(f"scoring {tag}")
        results[tag] = _score(logger, fetch_y(dec), yte_l, cfg,
                              binary_threshold, threshold_mode)
    logger.record("final", **{t: m for t, m in results.items()})
    step = start_epoch + sum(1 for e in history if not e.get("diverged"))
    return {"metrics": results, "params": best_params, "history": history,
            "opt_state": opt_state, "best_valid": keeper.best, "step": step}


def train_mfm_test_zeros(
    X_train, y_train, X_valid, y_valid, X_test, y_test, cfg, *,
    lr: Optional[float] = None,
    logger: Optional[RunLogger] = None,
    seed: int = 123,
    binary_threshold: float = 0.0,
    threshold_mode: str = "ge",
    resume_from: Optional[str] = None,
    snapshot=None,
):
    """Train plain MFM; at test time zero one modality's input slice at
    a time and score each (``mfm_mosi.py:577-596``)."""
    logger = logger or RunLogger()
    Xtr, ytr, Xv, yv, Xte, yte = _prep_data(
        X_train, y_train, X_valid, y_valid, X_test, y_test, seed
    )
    init, apply_fn = get_model("mfm")
    key = jax.random.PRNGKey(seed)
    key, ik = jax.random.split(key)
    params = init(ik, cfg)
    lr = 1e-3 if lr is None else lr
    opt = make_optimizer("adam", lr, cfg.momentum)
    opt_state = opt.init(params)
    params, opt_state, start_epoch, resume_lr, resume_best = _maybe_resume(
        resume_from, params, opt_state, logger)

    program = TrainProgram(apply_fn, cfg, "joint", opt)
    Xb, yb, rem = make_batches(Xtr, _labels(ytr, cfg), cfg.batchsize, False)
    yv_l, yte_l = _labels(yv, cfg), _labels(yte, cfg)

    scheduler = ReduceLROnPlateau(resume_lr or lr)
    keeper = _resume_keeper(BestKeeper("min"), resume_best, params)
    params, opt_state, history = _loop(
        program, params, opt_state, Xb, yb, rem, Xv, yv_l,
        max(cfg.num_epochs - start_epoch, 0), scheduler, keeper, logger,
        jax.random.fold_in(key, start_epoch),
        snapshot=_offset_snapshot(snapshot, start_epoch)
    )
    best_params = keeper.best_params if keeper.best_params is not None else params

    d_l, d_a = cfg.input_dims[0], cfg.input_dims[1]
    predict = _std_predict(apply_fn, cfg)

    def zero_slice(x, lo, hi):
        z = x.copy()
        z[..., lo:hi] = 0.0
        return z

    results = {}
    conditions = (
        ("y_hat_nol", zero_slice(Xte, 0, d_l)),
        ("y_hat_noa", zero_slice(Xte, d_l, d_l + d_a)),
        ("y_hat_nov", zero_slice(Xte, d_l + d_a, Xte.shape[-1])),
    )
    for tag, x_z in conditions:
        y_hat = np.asarray(predict(best_params, x_z, jax.random.PRNGKey(0)))
        logger.text(f"scoring {tag}")
        results[tag] = _score(logger, y_hat, yte_l, cfg, binary_threshold,
                              threshold_mode)
    logger.record("final", **results)
    step = start_epoch + sum(1 for e in history if not e.get("diverged"))
    return {"metrics": results, "params": best_params, "history": history,
            "opt_state": opt_state, "best_valid": keeper.best, "step": step}


def train_mfm_ablation(X_train, y_train, X_valid, y_valid, X_test, y_test,
                       cfg, **kw):
    """Dispatch m_a/m_b/m_c/m_d (``mfm_mosi.py:651-658``); identical
    joint loss and loop to train_mfm."""
    assert cfg.model_type in ("m_a", "m_b", "m_c", "m_d")
    return train_mfm(X_train, y_train, X_valid, y_valid, X_test, y_test,
                     cfg, model_type=cfg.model_type, **kw)


def train_seq2seq(
    X_train, y_train, X_valid, y_valid, X_test, y_test, cfg, *,
    lr: Optional[float] = None,
    logger: Optional[RunLogger] = None,
    seed: int = 123,
    resume_from: Optional[str] = None,
    snapshot=None,
):
    """Reconstruction-only training; reports per-modality test MSE
    (``mfm_mosi.py:769-916``)."""
    logger = logger or RunLogger()
    Xtr, ytr, Xv, yv, Xte, yte = _prep_data(
        X_train, y_train, X_valid, y_valid, X_test, y_test, seed
    )
    init, apply_fn = get_model("s2s")
    key = jax.random.PRNGKey(seed)
    key, ik = jax.random.split(key)
    params = init(ik, cfg)
    lr = 1e-3 if lr is None else lr
    opt = make_optimizer("adam", lr, cfg.momentum)
    opt_state = opt.init(params)
    params, opt_state, start_epoch, resume_lr, resume_best = _maybe_resume(
        resume_from, params, opt_state, logger)

    program = TrainProgram(apply_fn, cfg, "s2s", opt)
    Xb, yb, rem = make_batches(Xtr, ytr.astype(np.float32), cfg.batchsize, False)
    scheduler = ReduceLROnPlateau(resume_lr or lr)
    keeper = _resume_keeper(BestKeeper("min"), resume_best, params)
    params, opt_state, history = _loop(
        program, params, opt_state, Xb, yb, rem, Xv,
        np.asarray(yv, np.float32), max(cfg.num_epochs - start_epoch, 0),
        scheduler, keeper, logger, jax.random.fold_in(key, start_epoch),
        snapshot=_offset_snapshot(snapshot, start_epoch)
    )
    best_params = keeper.best_params if keeper.best_params is not None else params

    @jax.jit
    def predict(params, x, key):
        nol, noa, nov, _ = apply_fn(params, x, cfg, key=key, train=False)
        return nol[0], noa[0], nov[0]

    d_l, d_a = cfg.input_dims[0], cfg.input_dims[1]
    xl_hat, xa_hat, xv_hat = predict(best_params, Xte, jax.random.PRNGKey(0))
    mses = {
        "x_l_nol_mse": float(l2_loss(xl_hat, Xte[..., :d_l])),
        "x_a_noa_mse": float(l2_loss(xa_hat, Xte[..., d_l:d_l + d_a])),
        "x_v_nov_mse": float(l2_loss(xv_hat, Xte[..., d_l + d_a:])),
    }
    logger.text(mses["x_l_nol_mse"], mses["x_a_noa_mse"], mses["x_v_nov_mse"])
    logger.record("final", **mses)
    step = start_epoch + sum(1 for e in history if not e.get("diverged"))
    return {"metrics": mses, "params": best_params, "history": history,
            "opt_state": opt_state, "best_valid": keeper.best, "step": step}


def train_basic_missing(
    X_train, y_train, X_valid, y_valid, X_test, y_test, cfg, *,
    lr: Optional[float] = None,
    logger: Optional[RunLogger] = None,
    seed: int = 123,
    binary_threshold: float = 0.0,
    threshold_mode: str = "ge",
    resume_from: Optional[str] = None,
    snapshot=None,
):
    logger = logger or RunLogger()
    Xtr, ytr, Xv, yv, Xte, yte = _prep_data(
        X_train, y_train, X_valid, y_valid, X_test, y_test, seed
    )
    init, apply_fn = get_model("bm")
    key = jax.random.PRNGKey(seed)
    key, ik = jax.random.split(key)
    params = init(ik, cfg)
    lr = 1e-3 if lr is None else lr
    opt = make_optimizer("adam", lr, cfg.momentum)
    opt_state = opt.init(params)
    params, opt_state, start_epoch, resume_lr, resume_best = _maybe_resume(
        resume_from, params, opt_state, logger)

    program = TrainProgram(apply_fn, cfg, "bm", opt)
    Xb, yb, rem = make_batches(Xtr, _labels(ytr, cfg), cfg.batchsize, False)
    yv_l, yte_l = _labels(yv, cfg), _labels(yte, cfg)
    scheduler = ReduceLROnPlateau(resume_lr or lr)
    keeper = _resume_keeper(BestKeeper("min"), resume_best, params)
    params, opt_state, history = _loop(
        program, params, opt_state, Xb, yb, rem, Xv, yv_l,
        max(cfg.num_epochs - start_epoch, 0), scheduler, keeper, logger,
        jax.random.fold_in(key, start_epoch),
        snapshot=_offset_snapshot(snapshot, start_epoch)
    )
    best_params = keeper.best_params if keeper.best_params is not None else params

    @jax.jit
    def predict(params, x, key):
        y_nol, y_noa, y_nov, _ = apply_fn(params, x, cfg, key=key, train=False)
        if cfg.task == "regression":
            return (jnp.squeeze(y_nol, 1), jnp.squeeze(y_noa, 1),
                    jnp.squeeze(y_nov, 1))
        return y_nol, y_noa, y_nov

    outs = predict(best_params, Xte, jax.random.PRNGKey(0))
    results = {}
    for tag, y_hat in zip(("y_hat_nol", "y_hat_noa", "y_hat_nov"), outs):
        logger.text(f"scoring {tag}")
        results[tag] = _score(logger, np.asarray(y_hat), yte_l, cfg,
                              binary_threshold, threshold_mode)
    logger.record("final", **results)
    step = start_epoch + sum(1 for e in history if not e.get("diverged"))
    return {"metrics": results, "params": best_params, "history": history,
            "opt_state": opt_state, "best_valid": keeper.best, "step": step}


def train_mfm_acc(
    X_train, y_train, X_valid, y_valid, X_test, y_test, cfg, *,
    lr: Optional[float] = None,
    logger: Optional[RunLogger] = None,
    seed: int = 123,
    resume_from: Optional[str] = None,
    snapshot=None,
):
    """Binary-accuracy MOSI variant (``mfm_mosi_acc.py:396-503``):
    labels binarized upstream (y >= 0), CE disc loss, and the valid
    metric is ACCURACY maximization (keeper mode 'max' with >=; the
    RLROP still steps on the same number, as the reference does)."""
    logger = logger or RunLogger()
    cfg = cfg.replace(task="classification", output_dim=2)
    Xtr, ytr, Xv, yv, Xte, yte = _prep_data(
        X_train, y_train, X_valid, y_valid, X_test, y_test, seed
    )
    init, apply_fn = get_model("mfm")
    key = jax.random.PRNGKey(seed)
    key, ik = jax.random.split(key)
    params = init(ik, cfg)
    lr = 1e-3 if lr is None else lr
    opt = make_optimizer("adam", lr, cfg.momentum)
    opt_state = opt.init(params)
    params, opt_state, start_epoch, resume_lr, resume_best = _maybe_resume(
        resume_from, params, opt_state, logger)

    program = TrainProgram(apply_fn, cfg, "joint", opt)
    Xb, yb, rem = make_batches(Xtr, _labels(ytr, cfg), cfg.batchsize, False)
    yv_l, yte_l = _labels(yv, cfg), _labels(yte, cfg)
    predict = _std_predict(apply_fn, cfg)

    def eval_accuracy(params, x, y, key):
        logits = np.asarray(predict(params, x, key))
        return accuracy(np.asarray(y), np.argmax(logits, axis=1))

    def eval_accuracy_device(params, x, y, key):
        # jit-safe twin of eval_accuracy for the chunked loop: same
        # argmax tie-breaking (first max index) as np.argmax
        decoded, _, _ = apply_fn(params, x, cfg, key=key, train=False)
        hit = jnp.argmax(decoded[3], axis=1) == y
        return hit.mean().astype(jnp.float32)

    scheduler = ReduceLROnPlateau(resume_lr or lr)
    keeper = _resume_keeper(BestKeeper("max"), resume_best, params)
    params, opt_state, history = _loop(
        program, params, opt_state, Xb, yb, rem, Xv, yv_l,
        max(cfg.num_epochs - start_epoch, 0), scheduler, keeper, logger,
        jax.random.fold_in(key, start_epoch), eval_metric=eval_accuracy,
        eval_device=eval_accuracy_device,
        snapshot=_offset_snapshot(snapshot, start_epoch),
    )
    best_params = keeper.best_params if keeper.best_params is not None else params
    logits = np.asarray(predict(best_params, Xte, jax.random.PRNGKey(0)))
    metrics = score_classification(logits, yte_l)
    logger.record("final", **metrics)
    step = start_epoch + sum(1 for e in history if not e.get("diverged"))
    return {"metrics": metrics, "params": best_params, "history": history,
            "opt_state": opt_state, "best_valid": keeper.best, "step": step}


def train_mfm_multitrait(
    X_train, y_train, X_valid, y_valid, X_test, y_test, cfg, *,
    lr: Optional[float] = None,
    logger: Optional[RunLogger] = None,
    seed: int = 123,
    resume_from: Optional[str] = None,
    snapshot=None,
):
    """Multi-trait regression — the reference's POM/IEMOCAP-style
    experiments, which exist there only as ``check.py``'s multi-trait
    log-aggregation modes (``check.py:128-164,226-250``; the training
    scripts were never committed). One MFM with ``output_dim ==
    n_traits``, joint loss with the L1 disc term over the trait vector,
    and per-trait scoring printed in the bracketed ``mae: [..]`` format
    those check modes parse."""
    from factorized_tpu.utils.metrics import score_multitrait

    logger = logger or RunLogger()
    y_train = np.asarray(y_train, np.float32)
    n_traits = y_train.shape[1]
    cfg = cfg.replace(task="regression", output_dim=n_traits)
    Xtr, ytr, Xv, yv, Xte, yte = _prep_data(
        X_train, y_train, X_valid, y_valid, X_test, y_test, seed
    )
    init, apply_fn = get_model(cfg.model_type if cfg.model_type in
                               ("mfm", "kl") else "mfm")
    key = jax.random.PRNGKey(seed)
    key, ik = jax.random.split(key)
    params = init(ik, cfg)
    lr = 1e-3 if lr is None else lr
    opt = make_optimizer("adam", lr, cfg.momentum)
    opt_state = opt.init(params)
    params, opt_state, start_epoch, resume_lr, resume_best = _maybe_resume(
        resume_from, params, opt_state, logger)

    program = TrainProgram(apply_fn, cfg, "joint", opt)
    Xb, yb, rem = make_batches(Xtr, ytr.astype(np.float32), cfg.batchsize,
                               False)
    yv_l = np.asarray(yv, np.float32)
    yte_l = np.asarray(yte, np.float32)

    scheduler = ReduceLROnPlateau(resume_lr or lr)
    keeper = _resume_keeper(BestKeeper("min"), resume_best, params)
    params, opt_state, history = _loop(
        program, params, opt_state, Xb, yb, rem, Xv, yv_l,
        max(cfg.num_epochs - start_epoch, 0), scheduler, keeper, logger,
        jax.random.fold_in(key, start_epoch),
        snapshot=_offset_snapshot(snapshot, start_epoch)
    )
    best_params = keeper.best_params if keeper.best_params is not None else params
    predict = _std_predict(apply_fn, cfg)
    y_hat = np.asarray(predict(best_params, Xte, jax.random.PRNGKey(0)))
    logger.text("scoring y_hat")
    metrics = score_multitrait(y_hat, yte_l)
    logger.record("final", **metrics)
    step = start_epoch + sum(1 for e in history if not e.get("diverged"))
    return {"metrics": metrics, "params": best_params,
            "opt_state": opt_state, "history": history,
            "best_valid": keeper.best, "step": step}


def train_predictor(
    X_train, y_train, X_valid, y_valid, X_test, y_test, kind, cfg, *,
    h: int = 128,
    drop: float = 0.5,
    lr: float = 0.01,
    optimizer: str = "adam",
    logger: Optional[RunLogger] = None,
    seed: int = 123,
    binary_threshold: float = 0.0,
    threshold_mode: str = "ge",
    resume_from: Optional[str] = None,
    snapshot=None,
):
    """Discriminative baselines trained with pure task loss:

    - ``kind='mfn'``  — the standalone MFN predictor
      (``test_mosi.py:269-482``; SGD+momentum variant
      ``test_mosi_acc.py:285``).
    - ``kind='eflstm'`` — early-fusion LSTM (``test_mosi.py:130-156``).
    - ``kind='self_attention'`` — Gram-matrix attention ablation
      (``test_attention.py:266-404``; note this path is BATCH-major in
      the reference — handled internally here).
    """
    from factorized_tpu.models import baselines

    logger = logger or RunLogger()
    Xtr, ytr, Xv, yv, Xte, yte = _prep_data(
        X_train, y_train, X_valid, y_valid, X_test, y_test, seed
    )
    t, _, d = Xtr.shape
    key = jax.random.PRNGKey(seed)
    key, ik = jax.random.split(key)

    if kind == "mfn":
        init, apply_reg = get_model("mfn")
        params = init(ik, cfg)

        def forward(params, x, key, train):
            out = apply_reg(params, x, cfg, key=key, train=train)
            return jnp.squeeze(out, 1) if cfg.task == "regression" else out

    elif kind == "eflstm":
        params = baselines.eflstm_init(ik, d, h, cfg.output_dim)

        def forward(params, x, key, train):
            out = baselines.eflstm_apply(params, x, drop, key=key, train=train)
            return jnp.squeeze(out, 1) if cfg.task == "regression" else out

    elif kind == "self_attention":
        params = baselines.self_attention_init(ik, d, h, t, cfg.output_dim)

        def forward(params, x, key, train):
            xb = jnp.transpose(x, (1, 0, 2))  # trainer keeps time-major
            out = baselines.self_attention_apply(params, xb, drop, key=key,
                                                 train=train)
            return jnp.squeeze(out, 1) if cfg.task == "regression" else out

    else:
        raise ValueError(f"unknown predictor kind {kind!r}")

    from factorized_tpu.ops.losses import cross_entropy_loss, l1_loss

    def task_loss(pred, y):
        if cfg.task == "classification":
            return cross_entropy_loss(pred, y)
        return l1_loss(pred, y)

    def loss_fn(params, x, y, key):
        pred = forward(params, x, key, True)
        loss = task_loss(pred, y)
        return loss, loss

    def eval_fn(params, x, y, key):
        return task_loss(forward(params, x, key, False), y)

    opt = make_optimizer(optimizer, lr, cfg.momentum)
    opt_state = opt.init(params)
    params, opt_state, start_epoch, resume_lr, resume_best = _maybe_resume(
        resume_from, params, opt_state, logger)
    program = TrainProgram(None, cfg, "custom", opt, loss_fn=loss_fn,
                           eval_fn=eval_fn)
    Xb, yb, rem = make_batches(Xtr, _labels(ytr, cfg), cfg.batchsize, False)
    yv_l, yte_l = _labels(yv, cfg), _labels(yte, cfg)
    scheduler = ReduceLROnPlateau(resume_lr or lr)
    keeper = _resume_keeper(BestKeeper("min"), resume_best, params)
    params, opt_state, history = _loop(
        program, params, opt_state, Xb, yb, rem, Xv, yv_l,
        max(cfg.num_epochs - start_epoch, 0), scheduler, keeper, logger,
        jax.random.fold_in(key, start_epoch),
        snapshot=_offset_snapshot(snapshot, start_epoch)
    )
    best_params = keeper.best_params if keeper.best_params is not None else params

    predict = jax.jit(lambda p, x, k: forward(p, x, k, False))
    y_hat = np.asarray(predict(best_params, Xte, jax.random.PRNGKey(0)))
    metrics = _score(logger, y_hat, yte_l, cfg, binary_threshold,
                     threshold_mode)
    logger.record("final", **metrics)
    step = start_epoch + sum(1 for e in history if not e.get("diverged"))
    return {"metrics": metrics, "params": best_params, "history": history,
            "opt_state": opt_state, "best_valid": keeper.best, "step": step}
