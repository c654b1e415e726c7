"""Shape-bucketed config-vmapped search: train MANY search trials as
one program.

The reference's production workload is an infinite random search
(``mfm_mosi.py:1302-1369``): every trial draws a config and trains it
from scratch, one model at a time. Most sampled fields do NOT change
the compiled program — the 9 dropout rates, the 4 loss weights and the
learning rate (``mfm_mosi.py:1311-1344``) are VALUES, not shapes. Only
the size fields (h_dims, z/f sizes, memsize, attention shapes,
batchsize) change program structure.

So: bucket sampled configs by their shape signature and train each
bucket as ONE ``jax.vmap``-ed program, with the per-lane value fields
traced in as a (K, n_hp) hyperparameter matrix (see
``ops/core.dropout``'s traced-rate path). Search throughput then scales
like the K-seed multiseed trainer (``parallel/multiseed.py``) instead
of one-model-at-a-time — and composes with it: each config can occupy
``seeds_per_config`` lanes.

Lane semantics are identical to :func:`trainers.train_mfm` per lane:
same joint loss, Adam, per-lane ReduceLROnPlateau, per-lane best-valid
keeping, per-lane test scoring.
"""

from __future__ import annotations

import random
from collections import defaultdict
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from factorized_tpu.config import sample_search_config
from factorized_tpu.models import get_model
from factorized_tpu.parallel.multiseed import (
    DEFAULT_EPOCH_CHUNK,
    MULTISEED_TYPES,
    MultiSeedProgram,
    _compile_run_epochs,
    _init_lane_programs,
    _Null,
    data_fingerprint,
    prepare_bucket_data,
    sched_from_dicts,
    sched_to_dicts,
)
from factorized_tpu.train import make_eval_fn, make_loss_fn, make_optimizer
from factorized_tpu.utils.logging import RunLogger
from factorized_tpu.utils.metrics import (
    score_classification,
    score_multitrait,
    score_regression,
)
from factorized_tpu.utils.scheduler import plateau_init

# Per-lane VALUE fields: traced into the vmapped program as a (K, n_hp)
# matrix. Everything the per-dataset search samples that is not a shape
# (config.py sample_search_config).
HP_FIELDS = (
    "zy_to_fy_dropout", "zl_to_fl_dropout", "za_to_fa_dropout",
    "zv_to_fv_dropout", "fy_to_y_dropout",
    # out_drop is traced for the drift invariant (every sampled value
    # field is per-lane) but is inert for every bucketable model type —
    # the MFM family never reads the MFN's out layer, exactly like the
    # reference (mfm_model.py:136-138,199); only the non-bucketable MFN
    # baseline consumes it (models/baselines.py:175)
    "att1_drop", "att2_drop", "gamma1_drop", "gamma2_drop", "out_drop",
    "lda_mmd", "lda_xl", "lda_xa", "lda_xv",
)

# Fields that change the compiled program: configs must agree on ALL of
# these to share a bucket.
SHAPE_FIELDS = (
    "input_dims", "h_dims", "memsize", "windowsize", "output_dim",
    "seqlength", "zy_size", "zl_size", "za_size", "zv_size",
    "fy_size", "fl_size", "fa_size", "fv_size",
    "att1_shape", "att2_shape", "gamma1_shape", "gamma2_shape",
    "out_shape", "batchsize", "num_epochs", "task", "model_type",
    "missing", "zeros",
)


def shape_signature(cfg) -> tuple:
    """Hashable compilation signature of a config."""
    vals = []
    for f in SHAPE_FIELDS:
        v = getattr(cfg, f)
        vals.append(tuple(v) if isinstance(v, list) else v)
    return tuple(vals)


def bucket_configs(cfgs: Sequence) -> List[List[int]]:
    """Group config indices by shape signature (insertion order)."""
    groups = defaultdict(list)
    for i, c in enumerate(cfgs):
        groups[shape_signature(c)].append(i)
    return list(groups.values())


def lane_cfg(rep_cfg, hp_vec):
    """The representative config with its VALUE fields replaced by one
    lane's traced hyperparameters."""
    return rep_cfg.replace(**{f: hp_vec[i] for i, f in enumerate(HP_FIELDS)})


def hp_matrix(cfgs: Sequence, seeds_per_config: int) -> np.ndarray:
    """(K, n_hp) lane hyperparameters, lane = (config major, seed minor)."""
    rows = []
    for c in cfgs:
        row = [float(getattr(c, f)) for f in HP_FIELDS]
        rows.extend([row] * seeds_per_config)
    return np.asarray(rows, np.float32)


class ConfigBucketProgram:
    """Compiled K-lane epoch/eval/predict programs where each lane
    carries its own (dropout rates, loss weights) vector.

    All per-lane bookkeeping stays ON DEVICE: ``select`` keeps the
    stacked best-params tree updated with one masked-where dispatch per
    epoch (vs K per-lane host pulls — measured 58s/rung of pure
    dispatch latency through the TPU tunnel before this, see
    scripts/evolve_probe.py), and ``recycle`` re-initializes culled
    lanes (fresh params + opt_state scattered into the stacked state)
    as ONE compiled call."""

    def __init__(self, apply_fn, rep_cfg, optimizer, init_fn=None):
        self.rep_cfg = rep_cfg
        self._eval_fn = make_eval_fn(apply_fn, rep_cfg, "joint")

        def loss_fn(params, x, y, key, hp):
            # rebuild the joint loss with this lane's traced values —
            # closure construction happens at trace time, the math is
            # identical to the static path (tests/test_multiconfig.py)
            inner = make_loss_fn(apply_fn, lane_cfg(rep_cfg, hp), "joint")
            return inner(params, x, y, key)

        _init_lane_programs(self, apply_fn, rep_cfg, optimizer, loss_fn,
                            with_hps=True, init_fn=init_fn)

    run_epochs = MultiSeedProgram.run_epochs


def train_config_bucket(
    X_train, y_train, X_valid, y_valid, X_test, y_test, cfgs, *,
    seeds_per_config: int = 1,
    lr: Optional[float] = None,
    use_config_lr: bool = False,
    logger: Optional[RunLogger] = None,
    seed: int = 123,
    binary_threshold: float = 0.0,
    threshold_mode: str = "ge",
    valid_metric: str = "loss",
    mesh=None,
    state_in: Optional[dict] = None,
    return_state: bool = False,
    key_salt: int = 777,
    epoch_offset: int = 0,
    program: Optional["ConfigBucketProgram"] = None,
    prep: Optional[dict] = None,
    params_on_device: bool = False,
    defer_scoring: bool = False,
):
    """Train a BUCKET of same-shape configs — K = len(cfgs) *
    seeds_per_config lanes — as one vmapped program.

    All configs must share :func:`shape_signature`; they may differ in
    any :data:`HP_FIELDS` value and in ``lr``. ``use_config_lr=True``
    gives each lane its config's ``lr`` (the moud/you semantics,
    ``mfm_moud.py:466``); otherwise all lanes use ``lr`` (default 1e-3,
    the torch-Adam default the mosi trainers use, ``mfm_mosi.py:403``).

    ``mesh``: same options as ``train_mfm_multiseed`` — a 1-D 'seed'
    (or 'data') mesh shards the LANE axis (zero collectives, linear
    chip scaling); 2-D ('seed', 'batch') additionally data-parallelizes
    each lane.

    ``state_in`` / ``return_state`` chain rungs of the evolving search
    (:func:`train_evolving_search`): pass the previous rung's returned
    ``state`` to continue training the SAME lanes (params, opt_state,
    per-lane lr + scheduler internals, best-valid records) for another
    ``num_epochs``. ``key_salt`` varies the per-rung dropout/MMD key
    stream; ``epoch_offset`` makes logged epoch numbers absolute.
    ``prep``: pre-placed dataset from :func:`prepare_bucket_data` (must
    have been built with the same ``seed``/``mesh``) — rung drivers use
    it to upload the data once instead of once per call.

    Returns {"results": [per-lane {config_index, seed_index, metrics,
    best_valid}], "best_lane": int, "best_params": pytree} (+ "state"
    when ``return_state``).

    ``defer_scoring=True`` (requires ``return_state``): skip the
    end-of-call test-predict/score/rank for ALL K lanes — results carry
    only ``best_valid`` and ``best_lane``/``best_params`` are None. The
    evolving search uses this so intermediate rungs pay NO K-wide
    test-set forward: a trial is scored exactly once, when it finishes
    (culled or final rung), via :func:`score_bucket_lanes` — which also
    matches the reference protocol of one test score per trial at end
    of training (``mfm_mosi.py:481-499``).
    """
    logger = logger or RunLogger()
    if defer_scoring and not return_state:
        # pure argument validation: fail BEFORE training, not after the
        # whole loop has run and the work would be discarded
        raise ValueError(
            "defer_scoring=True requires return_state=True — the "
            "caller must score finished lanes from the returned "
            "state (score_bucket_lanes)")
    sigs = {shape_signature(c) for c in cfgs}
    if len(sigs) != 1:
        raise ValueError(
            f"train_config_bucket got {len(sigs)} distinct shape "
            "signatures; bucket configs with bucket_configs() first")
    rep = cfgs[0]
    if rep.model_type not in MULTISEED_TYPES:
        raise ValueError(
            f"config-bucketed search supports model types "
            f"{MULTISEED_TYPES}; got {rep.model_type!r}")
    name = rep.model_type
    K = len(cfgs) * seeds_per_config

    if prep is None:
        prep = prepare_bucket_data(X_train, y_train, X_valid, y_valid,
                                   X_test, y_test, rep, seed=seed,
                                   mesh=mesh)
    elif prep["seed"] != seed or prep["batchsize"] != rep.batchsize \
            or prep["task"] != rep.task:
        raise ValueError(
            "prep= was built for a different seed/batchsize/task than "
            "this bucket; rebuild it with prepare_bucket_data(...)")
    elif prep.get("fingerprint") is not None and prep["fingerprint"] \
            != data_fingerprint(X_train, X_valid, X_test, mesh,
                                y_train, y_valid, y_test):
        raise ValueError(
            "prep= was built from different dataset arrays (or a "
            "different mesh) than the ones passed positionally — the "
            "positional X/y args would be silently ignored. Rebuild it "
            "with prepare_bucket_data(...) on THESE tensors/mesh.")
    Xb, yb = prep["Xb"], prep["yb"]
    Xv_d, yv_d = prep["Xv"], prep["yv"]
    Xte_d, yte = prep["Xte"], prep["yte"]

    init, apply_fn = get_model(name)
    opt = make_optimizer("adam", lr, rep.momentum)
    base = jax.random.PRNGKey(seed)
    if state_in is None:
        keys = jax.random.split(base, K)
        params = jax.vmap(lambda k: init(k, rep))(keys)
        opt_state = jax.vmap(opt.init)(params)
    else:
        params, opt_state = state_in["params"], state_in["opt_state"]
    # a caller-supplied program (built for the SAME shape signature +
    # optimizer) skips re-tracing — the evolving search reuses one
    # compiled program across all rungs
    program = program or ConfigBucketProgram(apply_fn, rep, opt)
    hps = hp_matrix(cfgs, seeds_per_config)

    if state_in is None:
        if use_config_lr:
            lane_lr = np.repeat([float(c.lr) for c in cfgs],
                                seeds_per_config)
        else:
            lane_lr = np.full(K, 1e-3 if lr is None else lr)
        sched = plateau_init(lane_lr.astype(np.float32))
    else:
        sched = state_in["sched"]

    hps_d = jnp.asarray(hps)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        seed_ax = "seed" if "seed" in mesh.axis_names else "data"
        n_dev = mesh.shape[seed_ax]
        if K % n_dev:
            raise ValueError(
                f"lanes={K} (configs x seeds) must divide the mesh "
                f"{seed_ax!r} axis ({n_dev})")
        lane_sh = NamedSharding(mesh, P(seed_ax))
        params = jax.device_put(params, lane_sh)
        opt_state = jax.device_put(opt_state, lane_sh)
        hps_d = jax.device_put(hps_d, NamedSharding(
            mesh, P(seed_ax, None)))

    if state_in is None:
        best = jnp.full((K,), -jnp.inf if valid_metric == "accuracy"
                        else jnp.inf, jnp.float32)
        # stacked on-device per-lane best-params tree, gated by has_best
        # (content of a lane is meaningless until its mask bit is set)
        best_stack = jax.tree.map(jnp.zeros_like, params)
        has_best = jnp.zeros((K,), bool)
    else:
        best = jnp.asarray(state_in["best"], jnp.float32)
        best_stack = state_in["best_stack"]
        has_best = jnp.asarray(state_in["has_best"])
    if mesh is not None:
        best_stack = jax.device_put(best_stack, lane_sh)
        best = jax.device_put(best, lane_sh)
        has_best = jax.device_put(has_best, lane_sh)
        sched = {k: jax.device_put(v, lane_sh) for k, v in sched.items()}
    key = jax.random.fold_in(base, key_salt)

    # whole CHUNKS of epochs run as one device program (train + eval +
    # best-select + scheduler step in a lax.scan) — the host sees one
    # round-trip per chunk, not per epoch
    run = program.run_epochs(valid_metric)
    chunk = min(rep.num_epochs, DEFAULT_EPOCH_CHUNK) or 1
    history = []
    e = 0
    while e < rep.num_epochs:
        n = min(chunk - e % chunk, rep.num_epochs - e)
        (params, opt_state, best_stack, best, has_best, sched, key,
         trackeds, validss, _) = run(params, opt_state, best_stack, best,
                                     has_best, sched, Xb, yb, Xv_d, yv_d,
                                     key, hps_d, n)
        trackeds, validss = np.asarray(trackeds), np.asarray(validss)
        for j in range(n):
            ep = epoch_offset + e + j
            logger.text(ep, trackeds[j].round(4).tolist(),
                        validss[j].round(4).tolist())
            logger.record("epoch", epoch=ep,
                          train_loss=trackeds[j].tolist(),
                          valid_loss=validss[j].tolist())
            history.append({"epoch": ep, "valids": validss[j].tolist()})
        e += n

    state_out = {"params": params, "opt_state": opt_state,
                 "sched": sched, "best": best,
                 "best_stack": best_stack, "has_best": has_best}
    best_h = np.asarray(best)
    if defer_scoring:
        results = [{"config_index": k // seeds_per_config,
                    "seed_index": k % seeds_per_config,
                    "best_valid": float(best_h[k])} for k in range(K)]
        return {"results": results, "best_lane": None,
                "best_params": None, "params": None, "history": history,
                "state": state_out}
    # lanes that never recorded a best (possible only with 0 epochs or
    # right after a recycle) fall back to their live params
    eval_stack = program.select(jnp.asarray(has_best), best_stack, params)
    preds = np.asarray(program.predict(eval_stack, Xte_d))
    # keyed on output_dim (which sets the model's predict shape), not
    # on the label array's ndim — (n, 1)-shaped scalar labels must not
    # trip the multi-trait path
    multi = rep.output_dim > 1 and rep.task == "regression"
    results = []
    for k in range(K):
        m = _score_pred(preds[k], yte, rep, binary_threshold,
                        threshold_mode)
        results.append({
            "config_index": k // seeds_per_config,
            "seed_index": k % seeds_per_config,
            "metrics": m,
            "best_valid": float(best_h[k]),
        })
    key_metric = ("accuracy" if rep.task == "classification"
                  else "mae_mean" if multi else "mae")
    maximize = rep.task == "classification"

    def rank_val(k):
        # NaN-safe: a diverged lane (nan metrics) must never win the
        # pick — every x<nan / x>nan comparison is False, so a plain
        # min/max would keep a nan lane 0 over finite lanes
        v = results[k]["metrics"][key_metric]
        if not np.isfinite(v):
            return np.inf
        return -v if maximize else v

    pick = min(range(K), key=rank_val)
    # multi-trait: the best lane's per-trait lists also go top-level so
    # `check --multitrait` aggregates bucket/evolve logs like the
    # single-trainer ones (check.parse_jsonl_multitrait reads
    # top-level mae/corr/mult_acc lists)
    logger.record("final", per_lane=[r["metrics"] for r in results],
                  best_lane=pick,
                  best_config_index=results[pick]["config_index"],
                  **(results[pick]["metrics"] if multi else {}))
    # one lane-gather dispatch + (unless the caller keeps it on device)
    # one BATCHED pull — per-leaf np.asarray(a[pick]) cost a tunnel
    # round-trip per leaf and dominated the rung's fixed overhead
    pick_tree = program.take_lane(eval_stack, pick)
    if not params_on_device:
        pick_tree = jax.device_get(pick_tree)
    out = {"results": results, "best_lane": pick,
           "best_params": pick_tree,
           "params": pick_tree, "history": history}
    if return_state:
        out["state"] = state_out
    return out


def _score_pred(pred, yte, rep, binary_threshold, threshold_mode):
    """Score one lane's test predictions with the task-appropriate
    metric set (classification / multi-trait / scalar regression)."""
    if rep.task == "classification":
        return score_classification(pred, yte, out=_Null())
    if rep.output_dim > 1 and rep.task == "regression":
        # multi-trait (POM/IEMOCAP-style) vector labels: per-trait
        # lists plus a scalar mean-MAE the rankings use
        m = score_multitrait(pred, yte, out=_Null())
        return {**m, "mae_mean": float(np.mean(m["mae"]))}
    return score_regression(pred, yte, binary_threshold, threshold_mode,
                            out=_Null())


def score_bucket_lanes(program, state, lanes, Xte_d, yte, rep,
                       binary_threshold=0.0, threshold_mode="ge"):
    """Test-score a SUBSET of bucket lanes from a (possibly deferred)
    bucket ``state``: one gathered (len(lanes), ...) best-params stack,
    one vmapped predict at subset width, metrics per lane.

    Returns (metrics_list, sub_stack) where ``sub_stack`` is the
    gathered on-device params stack — ``program.take_lane(sub_stack,
    pos)`` pulls finished lane ``lanes[pos]``'s params without ever
    materializing the full K-wide stack. The evolving search calls this
    exactly once per FINISHED trial (cull time or final rung), so the
    per-rung eval cost is O(n_finished), not O(K)."""
    eval_stack = program.select(jnp.asarray(state["has_best"]),
                                state["best_stack"], state["params"])
    idxs = jnp.asarray(np.asarray(lanes, np.int32))
    sub = program.take_lanes(eval_stack, idxs)
    preds = np.asarray(program.predict(sub, Xte_d))
    metrics = [_score_pred(preds[i], yte, rep, binary_threshold,
                           threshold_mode) for i in range(len(lanes))]
    return metrics, sub


# ---- evolving (successive-halving-with-recycling) search ---------------


def resample_values(template, dataset: str, rng=None):
    """A fresh random-search draw of the VALUE fields (dropout rates,
    loss weights, lr — ``mfm_mosi.py:1311-1344``) grafted onto
    ``template``'s shape. The result shares ``template``'s
    :func:`shape_signature`, so it can replace a lane in a running
    bucket program without recompilation."""
    draw = sample_search_config(dataset, rng)
    vals = {f: getattr(draw, f) for f in HP_FIELDS}
    return template.replace(lr=draw.lr, **vals)


def recycle_lanes(state, lane_indices, *, cfg, init, opt, lrs_new,
                  seed: int, valid_metric: str = "loss", program=None):
    """Reset the given lanes of a bucket ``state`` to freshly
    initialized trials IN PLACE: new params (independent PRNG per
    lane), fresh opt_state, new lr + scheduler, cleared best-valid
    record. Surviving lanes' arrays are untouched (vmapped lanes are
    arithmetically independent, so their continued trajectories are
    identical to an un-culled run — tests/test_evolve.py).

    With ``program`` (a :class:`ConfigBucketProgram` built with
    ``init_fn``) the device update is ONE compiled dispatch; the
    fallback path issues one scatter per pytree leaf. Both derive lane
    k's init key as ``fold_in(PRNGKey(seed), k)``, so they produce
    identical lanes."""
    base = jax.random.PRNGKey(seed)
    lanes = jnp.asarray(np.asarray(lane_indices, np.int32))
    if program is not None and program.recycle is not None:
        state["params"], state["opt_state"] = program.recycle(
            state["params"], state["opt_state"], lanes, base)
    else:
        keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(lanes)
        fresh = jax.vmap(lambda k: init(k, cfg))(keys)
        fresh_opt = jax.vmap(opt.init)(fresh)
        state["params"] = jax.tree.map(
            lambda a, f: a.at[lanes].set(f), state["params"], fresh)
        state["opt_state"] = jax.tree.map(
            lambda a, f: a.at[lanes].set(f), state["opt_state"],
            fresh_opt)
    lrs_arr = jnp.asarray(np.asarray(lrs_new, np.float32))
    best_fill = jnp.asarray(
        -jnp.inf if valid_metric == "accuracy" else jnp.inf, jnp.float32)
    state["sched"], state["best"], state["has_best"] = _reset_books(
        state["sched"], state["best"], state["has_best"], lanes, lrs_arr,
        best_fill)
    return state


@jax.jit
def _reset_books(sched, best, has_best, lanes, lrs_arr, best_fill):
    """Scheduler/best-keeper lane resets as ONE dispatched program (six
    eager ``.at[].set`` ops each cost a tunnel dispatch per rung)."""
    sched = {"lr": sched["lr"].at[lanes].set(lrs_arr),
             "best": sched["best"].at[lanes].set(jnp.inf),
             "bad": sched["bad"].at[lanes].set(0),
             "cooldown": sched["cooldown"].at[lanes].set(0)}
    return (sched, best.at[lanes].set(best_fill),
            has_best.at[lanes].set(False))


def _rng_to_json(st):
    """``random.Random.getstate()`` -> JSON-able dict (and back via
    :func:`_rng_from_json`) so a resumed search draws the SAME future
    value samples as the uninterrupted run."""
    version, internal, gauss = st
    return {"version": version, "internal": list(internal), "gauss": gauss}


def _rng_from_json(d):
    return (d["version"], tuple(d["internal"]), d["gauss"])


def _evolve_snapshot(path, template, state, cfgs, rung_next, rng,
                     explored, overall, rung_logs, logger):
    """Persist the FULL evolving-search state at a rung boundary: live
    + per-lane-best + overall-best params, opt_state, per-lane configs
    / lr / scheduler internals / best-valid, the value-draw RNG state,
    and the search bookkeeping — so a killed search resumes at the next
    rung exactly (the reference's search has no resume at all,
    ``mfm_mosi.py:1302-1369``)."""
    from factorized_tpu.utils.checkpoint import save_checkpoint

    # ONE batched pull of all four trees (per-leaf np.asarray would
    # serialize a tunnel round-trip per leaf)
    live, best_stack, over, opt_host = jax.device_get(
        (state["params"], state["best_stack"], overall["params"],
         state["opt_state"]))
    tree = {"live": live, "best": best_stack, "overall": over}
    sched_json = sched_to_dicts(state["sched"])
    meta = template.to_dict()
    meta["_ev"] = {
        "rung_next": rung_next,
        "explored": explored,
        "cfgs": [c.to_dict() for c in cfgs],
        "lrs": [d["lr"] for d in sched_json],
        "best_valid": [float(b) for b in np.asarray(state["best"])],
        "has_best": [bool(b) for b in np.asarray(state["has_best"])],
        "sched": sched_json,
        "rng": _rng_to_json(rng.getstate()),
        "overall": {k: overall[k]
                    for k in ("metrics", "best_valid", "config", "rung")},
        "rung_logs": rung_logs,
    }
    save_checkpoint(path, tree, opt_state=opt_host,
                    step=rung_next, config=meta)
    logger.text(f"evolve snapshot -> {path} (next rung {rung_next})")


def _evolve_resume(resume_from, template, rng, params0, opt_state0,
                   K, valid_metric, logger):
    """Restore an :func:`_evolve_snapshot`. Returns (state, cfgs,
    start_rung, explored, overall, rung_logs); mutates ``rng``."""
    from factorized_tpu.config import MFMConfig
    from factorized_tpu.utils.checkpoint import restore_checkpoint

    host = jax.tree.map(np.asarray, params0)
    one = jax.tree.map(lambda a: a[0], host)
    target = {"params": {"live": host, "best": host, "overall": one},
              "opt_state": jax.tree.map(np.asarray, opt_state0)}
    st, meta = restore_checkpoint(resume_from, target=target)
    ev = meta.get("config", {}).get("_ev")
    if ev is None:
        raise ValueError(
            f"checkpoint at {resume_from} is not an evolving-search "
            "snapshot (no _ev metadata); --resume on --evolve needs a "
            "snapshot written by a previous --evolve run")
    if len(ev["lrs"]) != K:
        raise ValueError(
            f"checkpoint at {resume_from} holds {len(ev['lrs'])} lanes "
            f"but this run has {K} (--trials x --seeds); they must match")
    cfgs = [MFMConfig(**d) for d in ev["cfgs"]]
    if shape_signature(cfgs[0]) != shape_signature(template):
        raise ValueError(
            f"checkpoint at {resume_from} was taken at a different "
            "shape signature than this run's template; resume with the "
            "same --seed/--config so the template matches")
    state = {"params": st["params"]["live"],
             "opt_state": st["opt_state"],
             "sched": sched_from_dicts(ev["sched"]),
             "best": jnp.asarray(ev["best_valid"], jnp.float32),
             "best_stack": st["params"]["best"],
             "has_best": jnp.asarray(np.asarray(ev["has_best"], bool))}
    rng.setstate(_rng_from_json(ev["rng"]))
    overall = dict(ev["overall"])
    overall["params"] = st["params"]["overall"]
    logger.text(f"resumed evolving search from {resume_from} at rung "
                f"{ev['rung_next']} (explored {ev['explored']} configs)")
    return (state, cfgs, int(ev["rung_next"]), int(ev["explored"]),
            overall, list(ev["rung_logs"]))


def train_evolving_search(
    X_train, y_train, X_valid, y_valid, X_test, y_test, template,
    dataset: str, *,
    n_configs: int = 8,
    rungs: int = 4,
    cull_frac: float = 0.5,
    seeds_per_config: int = 1,
    rng=None,
    lr: Optional[float] = None,
    use_config_lr: bool = False,
    logger: Optional[RunLogger] = None,
    seed: int = 123,
    binary_threshold: float = 0.0,
    threshold_mode: str = "ge",
    valid_metric: str = "loss",
    mesh=None,
    program: Optional["ConfigBucketProgram"] = None,
    ckpt_dir: Optional[str] = None,
    resume_from: Optional[str] = None,
):
    """Successive-halving search over the VALUE subspace of one shape
    bucket, with culled lanes RECYCLED into fresh trials.

    The reference explores hyperparameters by unbounded random search,
    one full training run per draw (``mfm_mosi.py:1302-1369``). The
    TPU-shaped version: fix a shape signature (one compiled program),
    fill K = n_configs x seeds_per_config vmapped lanes with value
    draws, and every ``template.num_epochs``-epoch rung (a) rank
    configs by best validation metric, (b) keep the survivors training,
    (c) re-initialize the worst ``cull_frac`` of lanes with NEW value
    draws — possible without recompilation because every searched value
    field is traced (:data:`HP_FIELDS` + lr). Lanes therefore never
    idle: the program stays K-wide while bad trials die early, which is
    the whole point of ASHA-style halving on a SIMD machine.

    ``ckpt_dir``: snapshot the FULL search state at every rung boundary
    (:func:`_evolve_snapshot`); ``resume_from``: restore one and
    continue — the resumed run reproduces the uninterrupted run exactly
    (tests/test_evolve.py), because every rung's key stream
    (``key_salt``), recycle PRNG and value draws (restored RNG state)
    are rung-deterministic.

    Returns {"best": overall-best lane record (test metrics + config
    + rung), "rungs": per-rung summaries, "explored_configs": total
    distinct trials, "params": best params}.
    """
    logger = logger or RunLogger()
    rng = rng or random.Random(seed)
    rep = template
    cfgs = [template] + [resample_values(template, dataset, rng)
                         for _ in range(n_configs - 1)]
    if rep.model_type not in MULTISEED_TYPES:
        raise ValueError(
            f"the evolving search supports model types "
            f"{MULTISEED_TYPES}; got {rep.model_type!r}")
    init, apply_fn = get_model(rep.model_type)
    opt = make_optimizer("adam", lr, rep.momentum)
    # ONE compiled program for all rungs: value swaps never recompile
    program = program or ConfigBucketProgram(apply_fn, rep, opt,
                                             init_fn=init)
    multi = rep.output_dim > 1 and rep.task == "regression"
    key_metric = ("accuracy" if rep.task == "classification"
                  else "mae_mean" if multi else "mae")
    maximize = key_metric == "accuracy"

    def better(a, b):
        # NaN-safe: a diverged rung's nan record must never stick as
        # the overall best (finite < nan is False, so the plain
        # comparator could keep nan forever)
        if not np.isfinite(a):
            return False
        if not np.isfinite(b):
            return True
        return a > b if maximize else a < b

    data = (X_train, y_train, X_valid, y_valid, X_test, y_test)
    # upload the dataset ONCE for all rungs (re-uploading per rung
    # dominated the steady rung wall through the TPU tunnel)
    prep = prepare_bucket_data(*data, rep, seed=seed, mesh=mesh)
    K = n_configs * seeds_per_config
    state = None
    start_rung = 0
    explored = n_configs
    overall = None
    rung_logs = []
    if resume_from:
        keys = jax.random.split(jax.random.PRNGKey(seed), K)
        params0 = jax.vmap(lambda k: init(k, rep))(keys)
        (state, cfgs, start_rung, explored, overall,
         rung_logs) = _evolve_resume(resume_from, rep, rng, params0,
                                     jax.vmap(opt.init)(params0), K,
                                     valid_metric, logger)
        if start_rung >= rungs:
            raise ValueError(
                f"checkpoint at {resume_from} already completed "
                f"{start_rung} rungs; this run asks for {rungs} — "
                "raise --evolve to continue the search")
    else:
        # one "config" record per EXPLORED trial — check's per-file run
        # count then mirrors the reference's `tot` (one per sampled
        # config, check.py:186-190). On resume the initial draws were
        # already counted by the original run's log, so only fresh
        # recycle draws are recorded below.
        for c in cfgs:
            logger.record("config", **c.to_dict())
    for rung in range(start_rung, rungs):
        out = train_config_bucket(
            *data, list(cfgs), seeds_per_config=seeds_per_config, lr=lr,
            use_config_lr=use_config_lr, logger=logger, seed=seed,
            binary_threshold=binary_threshold,
            threshold_mode=threshold_mode, valid_metric=valid_metric,
            mesh=mesh, state_in=state, return_state=True,
            key_salt=777 + rung, epoch_offset=rung * rep.num_epochs,
            program=program, prep=prep, params_on_device=True,
            defer_scoring=True)
        state = out["state"]
        cfg_snapshot = [c.to_dict() for c in cfgs]

        bv = np.asarray([r["best_valid"] for r in out["results"]])
        per_cfg = bv.reshape(n_configs, seeds_per_config)
        scores = (per_cfg.max(1) if valid_metric == "accuracy"
                  else per_cfg.min(1))
        entry = {"rung": rung, "scores": scores.tolist(),
                 "culled": [], "configs": cfg_snapshot}
        # decide the culls FIRST (by the valid metric, like the keeper):
        # a trial is test-scored exactly ONCE — when it finishes, i.e.
        # when its lanes are about to be recycled or at the last rung —
        # so rung eval cost is O(finished), independent of K, and the
        # protocol matches the reference's one-test-score-per-trial-at-
        # end-of-training (mfm_mosi.py:481-499)
        culled = []
        if rung < rungs - 1:
            n_cull = int(cull_frac * n_configs)
            if n_cull:
                order = np.argsort(scores)
                culled = [int(c) for c in
                          (order[:n_cull] if valid_metric == "accuracy"
                           else order[-n_cull:])]
                entry["culled"] = culled
        finish_lanes = (list(range(K)) if rung == rungs - 1 else
                        [ci * seeds_per_config + s for ci in culled
                         for s in range(seeds_per_config)])
        if finish_lanes:
            metrics_list, sub = score_bucket_lanes(
                program, state, finish_lanes, prep["Xte"], prep["yte"],
                rep, binary_threshold, threshold_mode)

            def rank_pos(p):
                v = metrics_list[p][key_metric]
                if not np.isfinite(v):
                    return np.inf
                return -v if maximize else v

            pick_pos = min(range(len(finish_lanes)), key=rank_pos)
            # multi-trait: the best finished lane's per-trait lists go
            # top-level so `check --multitrait` aggregates evolve logs
            # like the single-trainer ones
            logger.record(
                "final", per_lane=metrics_list,
                lanes=finish_lanes,
                best_lane=finish_lanes[pick_pos],
                best_config_index=finish_lanes[pick_pos]
                // seeds_per_config,
                **(metrics_list[pick_pos] if multi else {}))
            for pos, (lane, m) in enumerate(zip(finish_lanes,
                                                metrics_list)):
                if overall is None or better(m[key_metric],
                                             overall["metrics"]
                                             [key_metric]):
                    overall = {
                        "metrics": m, "best_valid": float(bv[lane]),
                        "config": cfg_snapshot[lane // seeds_per_config],
                        "rung": rung,
                        "params": program.take_lane(
                            sub, jnp.asarray(pos, jnp.int32))}
        if culled:
            lanes, lrs_new = [], []
            for ci in culled:
                new_cfg = resample_values(template, dataset, rng)
                cfgs[ci] = new_cfg
                explored += 1
                logger.record("config", **new_cfg.to_dict())
                for s in range(seeds_per_config):
                    lanes.append(int(ci) * seeds_per_config + s)
                    lrs_new.append(
                        float(new_cfg.lr) if use_config_lr
                        else (1e-3 if lr is None else lr))
            recycle_lanes(state, lanes, cfg=rep, init=init, opt=opt,
                          lrs_new=lrs_new,
                          seed=seed + 1000 * (rung + 1),
                          valid_metric=valid_metric,
                          program=program)
        rung_logs.append(entry)
        logger.record("rung", **{k: v for k, v in entry.items()
                                 if k != "configs"})
        if ckpt_dir and rung < rungs - 1:
            _evolve_snapshot(ckpt_dir, rep, state, cfgs, rung + 1, rng,
                             explored, overall, rung_logs, logger)

    logger.record("evolve_final", explored_configs=explored,
                  best_rung=overall["rung"], best_metrics=overall["metrics"],
                  best_config=overall["config"])
    # the overall-best params lived on device across rungs (pulling a
    # lane per rung was pure fixed cost); materialize ONCE at the end
    overall["params"] = jax.device_get(overall["params"])
    return {"best": overall, "rungs": rung_logs,
            "explored_configs": explored, "params": overall["params"]}
