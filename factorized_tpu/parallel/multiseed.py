"""Vmapped multi-seed training: K models, one chip, one program.

The reference's production workload is an endless random search of
small (~1M-param) models (``mfm_mosi.py:1302-1369``) trained one at a
time — at batch 32 a single model leaves most of the MXU idle. This
module trains K seeds of one configuration SIMULTANEOUSLY via
``jax.vmap`` over the parameter axis: every matmul in the step gets a
K-wide leading batch dimension, multiplying chip utilization for seed
ensembles / random restarts (the per-dataset searches can sample K
seeds per drawn config).

Semantics per seed are identical to :func:`trainers.train_mfm`: same
loss, Adam, per-seed ReduceLROnPlateau (lr is a (K,) vector argument),
per-seed best-valid checkpointing, per-seed test scoring.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from factorized_tpu.models import get_model
from factorized_tpu.models.registry import MODELS
from factorized_tpu.train import (
    DEFAULT_EPOCH_CHUNK,  # one chunk constant for all chunked loops
    make_batches,
    make_eval_fn,
    make_loss_fn,
    make_optimizer,
    shuffle_and_time_major,
)
from factorized_tpu.utils.logging import RunLogger
from factorized_tpu.utils.metrics import (
    score_classification,
    score_regression,
)
from factorized_tpu.utils.scheduler import plateau_init, plateau_step



@jax.jit
def _take_lane(tree, i):
    """Gather lane ``i`` of a stacked (K, ...) tree as ONE program
    (``i`` is traced, so distinct picks share the compilation)."""
    return jax.tree.map(lambda a: a[i], tree)


@jax.jit
def _take_lanes(tree, idxs):
    """Gather a SUBSET of lanes of a stacked (K, ...) tree as one
    program (``idxs`` traced -> one compile per subset SIZE). The
    evolving search uses this to test-score only the lanes whose trial
    actually finished this rung instead of all K."""
    return jax.tree.map(lambda a: a[idxs], tree)


def data_fingerprint(X_train, X_valid, X_test, mesh,
                     y_train=None, y_valid=None, y_test=None):
    """Cheap identity of (dataset arrays, mesh) for ``prep=`` reuse
    validation: shapes + dtype + a hash of the leading rows of each
    split — LABELS included (a label-only mismatch, e.g. the same X
    rebucketed under different label columns, would otherwise slip
    through and silently score on the prep's stale y) — plus the
    mesh's device ids/axes. Catches a prep built from different
    tensors or a different mesh being silently reused while the
    positional data args are ignored."""
    import hashlib

    def sig(a, full=False):
        if a is None:
            return None
        a = np.asarray(a)
        sample = a if full else a[:2]  # labels are tiny: hash them whole
        probe = np.ascontiguousarray(sample).tobytes() if a.size else b""
        return (tuple(a.shape), str(a.dtype),
                hashlib.sha1(probe).hexdigest()[:16])

    mesh_id = (None if mesh is None else
               (tuple(int(d.id) for d in np.asarray(mesh.devices).flat),
                tuple(mesh.axis_names)))
    return (sig(X_train), sig(X_valid), sig(X_test),
            sig(y_train, full=True), sig(y_valid, full=True),
            sig(y_test, full=True), mesh_id)


def prepare_bucket_data(X_train, y_train, X_valid, y_valid, X_test,
                        y_test, rep, *, seed: int = 123, mesh=None):
    """Shuffle/batch/device-place the dataset ONCE for (possibly many)
    lane-program calls at one shape signature — used by
    :func:`train_mfm_multiseed` and ``multiconfig.train_config_bucket``.

    The evolving search runs every rung against the SAME tensors;
    re-uploading the full train/valid/test set through a TPU tunnel on
    each rung call measurably dominated the steady rung wall
    (scripts/evolve_probe.py), so the rung driver builds this once and
    passes it as ``prep=``."""
    fingerprint = data_fingerprint(X_train, X_valid, X_test, mesh,
                                   y_train, y_valid, y_test)
    X_train, y_train = shuffle_and_time_major(X_train, y_train, seed)
    Xv = np.ascontiguousarray(np.asarray(X_valid).swapaxes(0, 1),
                              np.float32)
    Xte = np.ascontiguousarray(np.asarray(X_test).swapaxes(0, 1),
                               np.float32)
    yv, yte = np.asarray(y_valid), np.asarray(y_test)
    if rep.task == "classification":
        yv, yte = yv.astype(np.int32), yte.astype(np.int32)
        ytr = np.asarray(y_train, np.int32)
    else:
        yv, yte = yv.astype(np.float32), yte.astype(np.float32)
        ytr = np.asarray(y_train, np.float32)
    Xb, yb, _ = make_batches(X_train, ytr, rep.batchsize, False)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        if "batch" in mesh.axis_names:
            b_dev = mesh.shape["batch"]
            if rep.batchsize % b_dev:
                raise ValueError(
                    f"batchsize={rep.batchsize} must divide the mesh "
                    f"'batch' axis ({b_dev})")
            x_sh = NamedSharding(mesh, P(None, None, "batch"))
            y_sh = NamedSharding(mesh, P(None, "batch"))
            xv_sh = (NamedSharding(mesh, P(None, "batch"))
                     if Xv.shape[1] % b_dev == 0
                     else NamedSharding(mesh, P()))
        else:
            x_sh = y_sh = xv_sh = NamedSharding(mesh, P())
        rep_sh = NamedSharding(mesh, P())
        Xb, yb = jax.device_put(Xb, x_sh), jax.device_put(yb, y_sh)
        Xv_d = jax.device_put(Xv, xv_sh)
        yv_d = jax.device_put(yv, rep_sh)
        Xte_d = jax.device_put(Xte, rep_sh)
    else:
        Xb, yb = jax.device_put(Xb), jax.device_put(yb)
        Xv_d = jax.device_put(Xv)
        yv_d = jax.device_put(yv)
        Xte_d = jax.device_put(Xte)
    return {"Xb": Xb, "yb": yb, "Xv": Xv_d, "yv": yv_d,
            "Xte": Xte_d, "yte": yte,
            "seed": seed, "batchsize": rep.batchsize, "task": rep.task,
            "fingerprint": fingerprint}


def _init_lane_programs(self, apply_fn, cfg, optimizer, loss_fn,
                        with_hps, init_fn=None):
    """Build the jitted K-lane program set shared by
    :class:`MultiSeedProgram` and ``multiconfig.ConfigBucketProgram``
    (they differ only in whether each lane threads a traced
    hyperparameter vector through the loss): ``epoch`` / ``evaluate`` /
    ``predict`` / ``select`` / ``take_lane`` / optional ``recycle``,
    set as attributes on ``self``."""

    def predict_fn(params, x):
        out = apply_fn(params, x, cfg, key=jax.random.PRNGKey(0),
                       train=False)
        y_hat = out[0][3]
        # scalar regression drops the trailing 1; multi-trait keeps the
        # (n, n_traits) vector; classification keeps logits
        return (jnp.squeeze(y_hat, 1)
                if cfg.task == "regression" and cfg.output_dim == 1
                else y_hat)

    predict_v = jax.vmap(predict_fn, in_axes=(0, None))

    def predict_chunked(params, x):
        """K-lane predict over a possibly LARGE segment set.

        The naive vmapped whole-set forward materializes (K, t, N, h)
        activations; at CMU-MOSEI scale (7445 test segments, K=8) the
        TPU tiling pads tiny head dims 16x and the single program OOMs
        HBM (observed r4). Above a chunk threshold the segment axis is
        processed in lax.map pieces — same values, bounded memory; at
        MOSI scale (hundreds of segments) the program is unchanged.

        FACTORIZED_PREDICT_CHUNK is read at TRACE time (once per input
        shape under jit): changing the env var later in-process is
        ignored for shapes already compiled — set it before the first
        predict call."""
        t, n, d = x.shape
        c = int(os.environ.get("FACTORIZED_PREDICT_CHUNK", "1024"))
        if n <= c:
            return predict_v(params, x)
        nc = -(-n // c)
        xp = jnp.pad(x, ((0, 0), (0, nc * c - n), (0, 0)))
        xs = jnp.moveaxis(xp.reshape(t, nc, c, d), 1, 0)  # (nc,t,c,d)
        ys = jax.lax.map(lambda xc: predict_v(params, xc), xs)
        y = jnp.moveaxis(ys, 0, 1)          # (K, nc, c[, T])
        y = y.reshape((y.shape[0], nc * c) + y.shape[3:])
        return y[:, :n]

    self.predict = jax.jit(predict_chunked)
    self.predict_one = jax.jit(predict_fn)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def lane_step(params, opt_state, x, y, key, lr, *hp):
        (_, tracked), grads = grad_fn(params, x, y, key, *hp)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p - lr * u, params, updates)
        return params, opt_state, tracked

    vstep = jax.vmap(lane_step,
                     in_axes=(0, 0, None, None, 0, 0) +
                             ((0,) if with_hps else ()))

    def epoch_scan(params, opt_state, Xb, yb, keys, lrs, hp):
        nb = Xb.shape[0]
        # distinct key per (batch, lane)
        bkeys = jax.vmap(lambda k: jax.random.split(k, nb))(keys)

        def body(carry, batch):
            params, opt_state, acc = carry
            x, y, ks = batch
            params, opt_state, tracked = vstep(params, opt_state, x, y,
                                               ks, lrs, *hp)
            return (params, opt_state, acc + tracked), None

        K = lrs.shape[0]
        (params, opt_state, acc), _ = jax.lax.scan(
            body, (params, opt_state, jnp.zeros((K,), jnp.float32)),
            (Xb, yb, jnp.swapaxes(bkeys, 0, 1))
        )
        return params, opt_state, acc / nb

    if with_hps:
        def epoch(params, opt_state, Xb, yb, keys, lrs, hps):
            return epoch_scan(params, opt_state, Xb, yb, keys, lrs,
                              (hps,))
    else:
        def epoch(params, opt_state, Xb, yb, keys, lrs):
            return epoch_scan(params, opt_state, Xb, yb, keys, lrs, ())

    self.epoch = jax.jit(epoch, donate_argnums=(0, 1))
    eval_v = jax.vmap(self._eval_fn, in_axes=(0, None, None, 0))
    self.evaluate = jax.jit(eval_v)

    def select(mask, new, old):
        # per-lane masked where over stacked (K, ...) trees — keeps
        # the best-params record ON DEVICE (one dispatch per epoch
        # instead of K per-lane host pulls; the pulls were measured
        # at tens of seconds of pure dispatch latency through the
        # TPU tunnel, scripts/evolve_probe.py)
        def sel(n, o):
            m = mask.reshape((mask.shape[0],) + (1,) * (n.ndim - 1))
            return jnp.where(m, n, o)

        return jax.tree.map(sel, new, old)

    self.select = jax.jit(select)
    self.take_lane = _take_lane
    self.take_lanes = _take_lanes
    self._pieces = (epoch, eval_v, predict_v, select)
    self._with_hps = with_hps
    self._run_cache = {}

    if init_fn is not None:
        def recycle(params, opt_state, lanes, base):
            keys = jax.vmap(
                lambda i: jax.random.fold_in(base, i))(lanes)
            fresh = jax.vmap(lambda k: init_fn(k, cfg))(keys)
            fresh_opt = jax.vmap(optimizer.init)(fresh)

            def set_(a, f):
                return a.at[lanes].set(f)

            return (jax.tree.map(set_, params, fresh),
                    jax.tree.map(set_, opt_state, fresh_opt))

        self.recycle = jax.jit(recycle, donate_argnums=(0, 1))
    else:
        self.recycle = None


def _compile_run_epochs(epoch_fn, eval_v, predict_v, select_fn,
                        valid_metric, with_hps):
    """Jitted multi-epoch program: ``lax.scan`` over ``n_epochs``
    (static) iterations of [train epoch -> eval -> best-select ->
    plateau scheduler step], everything on device. Returns the advanced
    carry plus stacked per-epoch (tracked, valids, lr) for logging.

    The PRNG chain (one 3-way split per epoch, K-way split for the
    epoch keys, K-way split for the eval keys) is identical to the
    former per-epoch host loop, so chunked runs reproduce it bitwise
    and crash-resume stays exact (tests/test_multiseed_resume.py,
    tests/test_evolve.py).

    Memory boundary: the in-scan eval forwards the WHOLE validation
    set per lane (verified to fit at CMU-MOSEI scale — 2.5k valid
    segments x K=8 on one v5e). TEST scoring is chunked
    (predict_chunked) because full test sets are ~3x larger and DID
    OOM; if a future valid set OOMs here, sub-sample it or extend the
    same lax.map chunking to eval_v with a masked mean."""
    acc_mode = valid_metric == "accuracy"

    def run(params, opt_state, best_stack, best, has_best, sched,
            Xb, yb, Xv, yv, key, hps, n_epochs):
        k = sched["lr"].shape[0]

        def body(carry, _):
            params, opt_state, best_stack, best, has_best, sched, key = carry
            key, ek, vk = jax.random.split(key, 3)
            ekeys = jax.random.split(ek, k)
            if with_hps:
                params, opt_state, tracked = epoch_fn(
                    params, opt_state, Xb, yb, ekeys, sched["lr"], hps)
            else:
                params, opt_state, tracked = epoch_fn(
                    params, opt_state, Xb, yb, ekeys, sched["lr"])
            if acc_mode:
                logits = predict_v(params, Xv)
                valids = (jnp.argmax(logits, axis=2) == yv[None]).mean(
                    axis=1).astype(jnp.float32)
                better = valids >= best
            else:
                valids = eval_v(params, Xv, yv, jax.random.split(vk, k))
                better = valids <= best
            best_stack = select_fn(better, params, best_stack)
            best = jnp.where(better, valids, best)
            has_best = has_best | better
            # min-mode regardless of valid_metric — the reference's
            # acc-keeper steps the SAME min-mode scheduler on accuracy
            # (mfm_mosi_acc.py:479-485; quirk kept)
            sched = plateau_step(sched, valids)
            return ((params, opt_state, best_stack, best, has_best,
                     sched, key),
                    (tracked, valids, sched["lr"]))

        carry, ys = jax.lax.scan(
            body,
            (params, opt_state, best_stack, best, has_best, sched, key),
            None, length=n_epochs)
        return carry + ys

    return jax.jit(run, static_argnums=(12,),
                   donate_argnums=(0, 1, 2, 3, 4, 5))


class MultiSeedProgram:
    """Compiled K-seed epoch/eval/predict programs (all lanes share one
    static config; see ``multiconfig.ConfigBucketProgram`` for the
    per-lane-hyperparameter twin — both are built by
    :func:`_init_lane_programs`)."""

    def __init__(self, apply_fn, cfg, optimizer, variant="joint"):
        loss_fn = make_loss_fn(apply_fn, cfg, variant)
        self._eval_fn = make_eval_fn(apply_fn, cfg, variant)
        _init_lane_programs(self, apply_fn, cfg, optimizer, loss_fn,
                            with_hps=False)

    def run_epochs(self, valid_metric: str):
        """Cached jitted multi-epoch chunk program (see
        :func:`_compile_run_epochs`)."""
        if valid_metric not in self._run_cache:
            self._run_cache[valid_metric] = _compile_run_epochs(
                *self._pieces, valid_metric, with_hps=self._with_hps)
        return self._run_cache[valid_metric]

    @staticmethod
    def vinit(init, cfg, base_key, n_seeds):
        keys = jax.random.split(base_key, n_seeds)
        return jax.vmap(lambda k: init(k, cfg))(keys)


# Types whose apply returns the standard (decoded, reg, missing) tuple
# trained with the single-stage joint loss — the only semantics this
# vmapped trainer implements. kl_ef (two-stage beta-VAE schedule),
# missing/zeros (4-way losses / zeroed-modality tests), s2s and bm have
# dedicated trainers; routing them here would silently change training
# semantics, so we refuse instead.
MULTISEED_TYPES = ("mfm", "kl", "m_a", "m_b", "m_c", "m_d")


def sched_to_dicts(sched):
    """Device plateau state -> the snapshot JSON format (list of
    per-lane {lr, best, bad, cooldown} dicts — unchanged on disk from
    the host-scheduler era, so old checkpoints restore)."""
    sc = {k: np.asarray(v) for k, v in sched.items()}
    return [{"lr": float(sc["lr"][i]), "best": float(sc["best"][i]),
             "bad": int(sc["bad"][i]), "cooldown": int(sc["cooldown"][i])}
            for i in range(sc["lr"].shape[0])]


def sched_from_dicts(dicts):
    """Inverse of :func:`sched_to_dicts`."""
    return {"lr": jnp.asarray([d["lr"] for d in dicts], jnp.float32),
            "best": jnp.asarray([d["best"] for d in dicts], jnp.float32),
            "bad": jnp.asarray([d["bad"] for d in dicts], jnp.int32),
            "cooldown": jnp.asarray([d["cooldown"] for d in dicts],
                                    jnp.int32)}


def _multiseed_snapshot(path, cfg, params, opt_state, best_stack, has_best,
                        best, sched, epoch, select):
    """Persist the FULL K-seed training state (live + per-seed-best
    params, opt_state, best-valid, lr and scheduler internals) so a
    killed search resumes exactly — the reference's closest analogue is
    best-valid checkpointing without resume (``mfm_mosi.py:473-477``).

    Seeds with no best yet store their live slice (same on-disk format
    as before the device-resident best tree; old checkpoints restore)."""
    from factorized_tpu.utils.checkpoint import save_checkpoint

    meta = cfg.to_dict()
    meta["_ms_n_seeds"] = int(sched["lr"].shape[0])
    meta["_ms_best_valid"] = [float(b) for b in np.asarray(best)]
    meta["_ms_lrs"] = [float(v) for v in np.asarray(sched["lr"])]
    meta["_ms_sched"] = sched_to_dicts(sched)
    best_out = select(jnp.asarray(has_best), best_stack, params)
    # ONE batched pull of all three trees (vs a blocking per-leaf
    # np.asarray round-trip through the TPU tunnel)
    live_h, best_h, opt_h = jax.device_get((params, best_out, opt_state))
    state = {"live": live_h, "best": best_h}
    save_checkpoint(path, state, opt_state=opt_h,
                    step=epoch + 1, config=meta)


def _multiseed_resume(resume_from, params, opt_state, n_seeds, logger):
    """Restore a _multiseed_snapshot. Returns (params, opt_state,
    best_stack, best, sched, start_epoch)."""
    from factorized_tpu.utils.checkpoint import restore_checkpoint

    host = jax.tree.map(np.asarray, params)
    target = {"params": {"live": host, "best": host},
              "opt_state": jax.tree.map(np.asarray, opt_state)}
    state, meta = restore_checkpoint(resume_from, target=target)
    mcfg = meta.get("config", {})
    ck_seeds = mcfg.get("_ms_n_seeds")
    if ck_seeds != n_seeds:
        raise ValueError(
            f"checkpoint at {resume_from} holds {ck_seeds} seeds but "
            f"--seeds {n_seeds} was requested; they must match")
    params = state["params"]["live"]
    opt_state = state["opt_state"]
    best_stack = state["params"]["best"]
    best = jnp.asarray(mcfg["_ms_best_valid"], jnp.float32)
    sched = sched_from_dicts(mcfg["_ms_sched"])
    start_epoch = int(meta.get("step", 0))
    logger.text(f"resumed {n_seeds}-seed state from {resume_from} "
                f"at epoch {start_epoch}")
    return params, opt_state, best_stack, best, sched, start_epoch


def train_mfm_multiseed(
    X_train, y_train, X_valid, y_valid, X_test, y_test, cfg, *,
    n_seeds: int = 8,
    lr: Optional[float] = None,
    logger: Optional[RunLogger] = None,
    seed: int = 123,
    binary_threshold: float = 0.0,
    threshold_mode: str = "ge",
    model_type: Optional[str] = None,
    valid_metric: str = "loss",
    mesh=None,
    resume_from: Optional[str] = None,
    ckpt_dir: Optional[str] = None,
    ckpt_every: int = 0,
):
    """Train ``n_seeds`` independent models of one config in a single
    vmapped program. Returns per-seed metrics plus the best seed.

    ``valid_metric='accuracy'`` reproduces the acc-maximizing trainer's
    semantics (``mfm_mosi_acc.py:479-485``: keep-on-best-ACCURACY with
    >=, scheduler still stepping on the same number).

    ``mesh``: optional ``jax.sharding.Mesh``.
    - 1-D (axis ``'seed'`` or legacy ``'data'``): the SEED axis of
      every state tensor is sharded (n_seeds must divide the axis
      size). Seeds are embarrassingly parallel, so XLA partitions the
      whole epoch program per-device with ZERO inter-chip collectives
      — linear chip scaling for the search workload. Batch data is
      replicated (identical for every seed).
    - 2-D ``('seed', 'batch')``: additionally shards the BATCH axis of
      the training data over ``'batch'`` — each seed's gradients get
      one XLA-inserted ``psum`` over that axis per step. Use when the
      slice has more chips than wanted seeds (e.g. 16 chips, K=8 ->
      mesh (8, 2): every seed trains 2-way data-parallel).

    ``ckpt_dir`` + ``ckpt_every``: every N epochs overwrite ``ckpt_dir``
    with the full K-seed state (live + per-seed-best params, opt_state,
    best-valid/lr/scheduler internals). ``resume_from``: restore such a
    checkpoint and continue — the resumed run reproduces the
    uninterrupted run exactly (same key chain, re-derived by epoch)."""
    logger = logger or RunLogger()
    name = model_type or cfg.model_type
    if name not in MODELS:
        name = "mfm"
    if name not in MULTISEED_TYPES:
        raise ValueError(
            f"multiseed training supports model types {MULTISEED_TYPES} "
            f"(single-stage joint loss); {name!r} has different training "
            "semantics - use its dedicated trainer with one seed")
    # after the type validation: prep uploads the full dataset through
    # the TPU tunnel, which a rejected call should never pay for
    prep = prepare_bucket_data(X_train, y_train, X_valid, y_valid,
                               X_test, y_test, cfg, seed=seed, mesh=mesh)
    Xb, yb = prep["Xb"], prep["yb"]
    Xv_d, yv_d = prep["Xv"], prep["yv"]
    Xte, yte = prep["Xte"], prep["yte"]
    init, apply_fn = get_model(name)
    lr = 1e-3 if lr is None else lr
    opt = make_optimizer("adam", lr, cfg.momentum)

    base = jax.random.PRNGKey(seed)
    params = MultiSeedProgram.vinit(init, cfg, base, n_seeds)
    opt_state = jax.vmap(opt.init)(params)
    program = MultiSeedProgram(apply_fn, cfg, opt)

    # all per-seed bookkeeping lives ON DEVICE: plateau scheduler
    # state, best-valid record, stacked best-params tree (gated by
    # has_best). The epoch loop below dispatches whole CHUNKS of epochs
    # as one program, so none of this round-trips the host per epoch.
    sched = plateau_init(np.full(n_seeds, lr, np.float32))
    best = jnp.full((n_seeds,), -jnp.inf if valid_metric == "accuracy"
                    else jnp.inf, jnp.float32)
    best_stack = jax.tree.map(jnp.zeros_like, params)
    has_best = jnp.zeros((n_seeds,), bool)
    key = jax.random.fold_in(base, 777)
    start_epoch = 0
    if resume_from:
        (params, opt_state, best_stack, best, sched,
         start_epoch) = _multiseed_resume(resume_from, params, opt_state,
                                          n_seeds, logger)
        # restored lanes without a recorded best hold their live slice
        # (the snapshot's fallback), so treating all as "has best" is
        # exact
        has_best = jnp.ones((n_seeds,), bool)
        # re-derive the key chain position (one 3-way split per epoch)
        for _ in range(start_epoch):
            key, _, _ = jax.random.split(key, 3)

    if mesh is not None:
        # data placement happened in prepare_bucket_data; here only the
        # per-seed STATE tensors get their seed-axis sharding
        from jax.sharding import NamedSharding, PartitionSpec as P

        seed_ax = "seed" if "seed" in mesh.axis_names else "data"
        n_dev = mesh.shape[seed_ax]
        if n_seeds % n_dev:
            raise ValueError(
                f"n_seeds={n_seeds} must divide the mesh {seed_ax!r} "
                f"axis ({n_dev}) for seed-parallel training")
        seed_sh = NamedSharding(mesh, P(seed_ax))
        params = jax.device_put(params, seed_sh)
        opt_state = jax.device_put(opt_state, seed_sh)
        best_stack = jax.device_put(best_stack, seed_sh)
        best = jax.device_put(best, seed_sh)
        has_best = jax.device_put(has_best, seed_sh)
        sched = {k: jax.device_put(v, seed_sh) for k, v in sched.items()}

    # chunk boundaries anchored at epoch 0 and aligned to ckpt_every,
    # so a resumed run re-enters on a boundary and reproduces the
    # uninterrupted run's programs exactly
    run = program.run_epochs(valid_metric)
    chunk = (ckpt_every if (ckpt_dir and ckpt_every)
             else min(cfg.num_epochs, DEFAULT_EPOCH_CHUNK)) or 1
    history = []
    e = start_epoch
    while e < cfg.num_epochs:
        n = min(chunk - e % chunk, cfg.num_epochs - e)
        (params, opt_state, best_stack, best, has_best, sched, key,
         trackeds, validss, _) = run(params, opt_state, best_stack, best,
                                     has_best, sched, Xb, yb, Xv_d, yv_d,
                                     key, None, n)
        trackeds, validss = np.asarray(trackeds), np.asarray(validss)
        for j in range(n):
            logger.text(e + j, trackeds[j].round(4).tolist(),
                        validss[j].round(4).tolist())
            logger.record("epoch", epoch=e + j,
                          train_loss=trackeds[j].tolist(),
                          valid_loss=validss[j].tolist())
            history.append({"epoch": e + j, "valids": validss[j].tolist()})
        e += n
        if ckpt_dir and ckpt_every and e % ckpt_every == 0:
            _multiseed_snapshot(ckpt_dir, cfg, params, opt_state,
                                best_stack, has_best, best, sched,
                                e - 1, program.select)

    # per-seed test scoring with each seed's best params (seeds that
    # never improved — only possible with 0 eval epochs — use live)
    eval_stack = program.select(jnp.asarray(has_best), best_stack, params)
    preds = np.asarray(program.predict(eval_stack, Xte))
    best = np.asarray(best)
    results = []
    for k in range(n_seeds):
        if cfg.task == "classification":
            m = score_classification(preds[k], yte, out=_Null())
        else:
            m = score_regression(preds[k], yte, binary_threshold,
                                 threshold_mode, out=_Null())
        results.append({"seed_index": k, "metrics": m,
                        "best_valid": float(best[k])})
    key_metric = "accuracy" if cfg.task == "classification" else "mae"
    maximize = cfg.task == "classification"

    def rank_val(k):
        # NaN-safe: a diverged seed (nan metrics) must never win the
        # pick (x<nan is always False, so a plain min/max would keep a
        # nan seed 0 over finite seeds)
        v = results[k]["metrics"][key_metric]
        if not np.isfinite(v):
            return np.inf
        return -v if maximize else v

    pick = min(range(n_seeds), key=rank_val)
    logger.record("final", per_seed=[r["metrics"] for r in results],
                  best_seed=pick)
    # one gather dispatch + one batched pull (per-leaf np.asarray costs
    # a tunnel round-trip per pytree leaf)
    pick_tree = jax.device_get(_take_lane(eval_stack, pick))
    # "params"/"step" mirror the single-seed trainers' return so the
    # CLI's --save-ckpt works on multiseed runs (best seed's params)
    return {"results": results, "best_seed": pick,
            "best_params": pick_tree, "params": pick_tree,
            "best_valid": float(best[pick]), "step": cfg.num_epochs,
            "history": history}


class _Null:
    def write(self, *a):
        pass

    def flush(self):
        pass
