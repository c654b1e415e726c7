"""Command-line experiment surface — the rebuild of the reference's
entry-point scripts as subcommands of one CLI:

================================  =================================
command                           reference script
================================  =================================
``mosi``                          ``mfm_mosi.py`` (argparse at 33-38,
                                  driver loop at 1302-1369)
``mosi_acc``                      ``mfm_mosi_acc.py``
``moud`` / ``you`` / ``mmmo``     ``mfm_moud.py`` / ``mfm_you.py`` /
                                  ``mfm_mmmo.py``
``test_mosi``                     ``test_mosi.py`` (frozen-ckpt eval)
``test_attention``                ``test_attention.py``
``check``                         ``check.py``
================================  =================================

Modes replace the reference's infinite ``while True`` random search:
``--mode search --trials N`` (N=0 -> run forever, exactly like the
reference), ``--mode best`` (pinned known-good config,
``mfm_mosi.py:1227-1288``), ``--mode single`` (config file + flags).
"""

from __future__ import annotations

import argparse
import json
import random
import sys

from factorized_tpu import trainers
from factorized_tpu.config import (
    MFMConfig,
    best_acc_mosi_config,
    sample_search_config,
)
from factorized_tpu.utils.logging import RunLogger


DATASETS = {
    "mosi": dict(task="regression", threshold=0.0, mode="ge",
                 input_dims=[300, 5, 20], output_dim=1),
    "moud": dict(task="classification", threshold=None, mode="ge",
                 input_dims=[300, 74, 36], output_dim=2,
                 include_remainder=True),
    "you": dict(task="classification", threshold=None, mode="ge",
                input_dims=[300, 74, 36], output_dim=3,
                include_remainder=True),
    "mmmo": dict(task="regression", threshold=3.5, mode="gt",
                 input_dims=[300, 74, 36], output_dim=1),
    # MOSI rebuilt from the PUBLIC CMU-MultimodalSDK .csd releases
    # (the reference README's download pointer, README.md:28-30); the
    # audio/visual dims depend on the csd files, so input_dims are
    # patched after loading (data/mmsdk.py SdkSplits.input_dims)
    "mosi_sdk": dict(task="regression", threshold=0.0, mode="ge",
                     input_dims=[300, 74, 47], output_dim=1),
    # CMU-MOSEI sentiment regression from public .csd files (column 0
    # of the 7-column label sequence = the sentiment score; per-trait
    # training = `multitrait --style mosei_sdk`)
    "mosei_sdk": dict(task="regression", threshold=0.0, mode="ge",
                      input_dims=[300, 74, 35], output_dim=1),
}


def load_dataset(name, seqlength, data_root, split=None,
                 feature_selection=True, normalize_covarep=False):
    from factorized_tpu.data import mmmo, mmsdk, mosi, moud, youtube

    if not feature_selection or normalize_covarep:
        if name != "mosi":
            # the reference's -s/--feature_selection flag and the
            # get_data_missing covarep normalization exist only on the
            # MOSI lab-pickle pipeline (mfm_mosi.py:37,60-73,181-191)
            flag = ("--feature-selection 0" if not feature_selection
                    else "--normalize-covarep")
            raise SystemExit(
                f"{flag} only applies to the mosi dataset (reference "
                f"mfm_mosi.py:37,60-73); got dataset={name!r}")
    if name == "mosei_sdk":
        return mmsdk.get_data(seqlength, data_root=data_root,
                              files=mmsdk.MOSEI_FILES, split=split)
    if name == "mosi_sdk":
        return mmsdk.get_data(seqlength, data_root=data_root, split=split)
    if name == "mosi":
        return mosi.get_data(seqlength, data_root=data_root,
                             feature_selection=feature_selection,
                             normalize_covarep=normalize_covarep)
    mod = {"moud": moud, "you": youtube, "mmmo": mmmo}[name]
    return mod.get_data(seqlength, data_root=data_root)


def _load_mosi(args, seqlength=20):
    """MOSI load honoring the raw-feature flags
    (``--feature-selection``/``--normalize-covarep``)."""
    return load_dataset(
        "mosi", seqlength, args.data_root,
        feature_selection=bool(getattr(args, "feature_selection", 1)),
        normalize_covarep=getattr(args, "normalize_covarep", False))


def parse_split(arg):
    """``--split "52,10"`` -> (52, 10) (train/valid video counts; the
    remainder is test)."""
    if arg is None:
        return None
    try:
        n_tr, n_va = (int(p) for p in arg.split(","))
    except ValueError:
        raise SystemExit(
            f"--split must be N_TRAIN,N_VALID video counts, got {arg!r}")
    return (n_tr, n_va)


def _seed_parallel_mesh(n_seeds):
    """Mesh for --seed-parallel: 1-D over the seed axis, or 2-D
    ('seed', 'batch') when the slice has more devices than seeds (each
    seed then trains data-parallel over the spare devices)."""
    import jax

    from factorized_tpu.parallel import make_mesh

    n_dev = len(jax.devices())
    if n_dev > n_seeds and n_dev % n_seeds == 0:
        return make_mesh(n_dev, axes=("seed", "batch"),
                         shape=(n_seeds, n_dev // n_seeds))
    if n_seeds % n_dev:
        # lane counts are data-dependent (e.g. random shape buckets);
        # shard over the largest device count that divides the lanes
        # instead of letting the trainer's divisibility check abort a
        # search round mid-way
        d = max(k for k in range(1, min(n_seeds, n_dev) + 1)
                if n_seeds % k == 0)
        print(f"--seed-parallel: {n_seeds} lanes do not divide "
              f"{n_dev} devices; using {d} device(s) for this program",
              file=sys.stderr)
        return make_mesh(d)
    return make_mesh()


def _dataset_info(name, data=None, args=None):
    """DATASETS entry, with input_dims patched from the loaded data's
    actual feature widths when the loader reports them (the SDK csd
    loader returns an ``SdkSplits`` carrying ``input_dims``), or from
    the concatenated width on the raw MOSI path
    (``--feature-selection 0``: text 300 + covarep 34 + full FACET,
    mfm_mosi.py:60-73)."""
    info = DATASETS[name]
    dims = getattr(data, "input_dims", None)
    if dims:
        info = dict(info, input_dims=list(dims))
    elif (name == "mosi" and args is not None
          and not getattr(args, "feature_selection", 1)):
        import numpy as np

        w = int(np.asarray(data[0]).shape[2])
        info = dict(info, input_dims=[300, 34, w - 334])
    return info


def make_autosnapshot(out, tag, cfg, every):
    """Crash-resume auto-checkpointing (``--ckpt-every N``): every N
    epochs overwrite ``<out>/ckpt_auto_<tag>`` with the CURRENT
    (params, opt_state, absolute step, lr, best-valid) so an
    interrupted run continues with ``--resume`` — a capability the
    reference lacks entirely (SURVEY.md §5.4)."""
    if not every:
        return None
    import math

    from factorized_tpu.utils.checkpoint import save_checkpoint

    def snap(epoch, params, opt_state, lr, best_valid):
        if (epoch + 1) % every:
            return
        meta = cfg.to_dict()
        meta["_resume_lr"] = lr
        if best_valid is not None and math.isfinite(best_valid):
            meta["_resume_best_valid"] = best_valid
        save_checkpoint(f"{out}/ckpt_auto_{tag}", params,
                        opt_state=opt_state, step=epoch + 1, config=meta)

    # declared cadence: lets the chunked trainer loop align its chunk
    # boundaries to the checkpoint epochs (trainers._loop_chunked)
    snap.every = every
    return snap


def dispatch_trainer(data, cfg, info, *, lr, logger, seed,
                     resume_from=None, snapshot=None):
    """The reference's driver if-chain (``mfm_mosi.py:1358-1369``).
    Every trainer accepts ``resume_from`` (checkpoint dir) and the
    ``snapshot`` auto-checkpointing hook."""
    kw = dict(logger=logger, seed=seed, lr=lr, resume_from=resume_from,
              snapshot=snapshot)
    if info["threshold"] is not None:
        kw.update(binary_threshold=info["threshold"],
                  threshold_mode=info["mode"])
    if cfg.missing == 1 and cfg.model_type == "bm":
        return trainers.train_basic_missing(*data, cfg, **kw)
    if cfg.missing == 1 and cfg.model_type == "mfm":
        return trainers.train_mfm_missing(*data, cfg, **kw)
    if cfg.missing == 1 and cfg.model_type == "s2s":
        kw.pop("binary_threshold", None)
        kw.pop("threshold_mode", None)
        return trainers.train_seq2seq(*data, cfg, **kw)
    if cfg.zeros == 1 and cfg.model_type == "mfm":
        return trainers.train_mfm_test_zeros(*data, cfg, **kw)
    if cfg.model_type in ("mfm", "kl"):
        kw["include_remainder"] = info.get("include_remainder", False)
        return trainers.train_mfm(*data, cfg, **kw)
    if cfg.model_type == "kl_ef":
        kw["include_remainder"] = info.get("include_remainder", False)
        return trainers.train_beta_vae(*data, cfg, **kw)
    if cfg.model_type in ("m_a", "m_b", "m_c", "m_d"):
        return trainers.train_mfm_ablation(*data, cfg, **kw)
    raise ValueError(f"no trainer for type={cfg.model_type!r} "
                     f"missing={cfg.missing} zeros={cfg.zeros}")


def run_bucket_search(args, data, info, rng, sample_fn=None, prefix=None):
    """Shape-bucketed search: sample ``--trials`` configs, group them by
    compilation signature, and train each bucket as ONE vmapped program
    (x ``--seeds`` lanes per config) — the TPU-shaped form of the
    reference's one-model-at-a-time infinite search
    (``mfm_mosi.py:1302-1369``). See docs/scaling.md.

    ``sample_fn``/``prefix`` let non-DATASETS surfaces (multitrait)
    supply their own config draw and run-id prefix."""
    from factorized_tpu.parallel.multiconfig import (
        bucket_configs,
        train_config_bucket,
    )

    prefix = prefix or args.dataset
    if sample_fn is None:
        def sample_fn():
            cfg = sample_search_config(args.dataset, rng,
                                       model_type=args.type,
                                       missing=args.missing,
                                       zeros=args.zeros)
            return cfg.replace(input_dims=info["input_dims"])

    n = args.trials or 16  # --trials 0: run forever in rounds of 16
    round_i = 0
    while True:
        cfgs = []
        for _ in range(n):
            cfg = sample_fn()
            if args.epochs:
                cfg = cfg.replace(num_epochs=args.epochs)
            if args.batchsize:
                cfg = cfg.replace(batchsize=args.batchsize)
            cfgs.append(cfg)
        buckets = bucket_configs(cfgs)
        print(f"bucket search round {round_i}: {len(cfgs)} configs -> "
              f"{len(buckets)} shape buckets "
              f"(sizes {[len(b) for b in buckets]})")
        for bi, idxs in enumerate(buckets):
            bucket = [cfgs[i] for i in idxs]
            logger = RunLogger(args.out,
                               run_id=f"{prefix}_r{round_i}b{bi}")
            # one "config" record per trial so check's per-file run
            # count mirrors the reference's `tot` counter
            for c in bucket:
                logger.record("config", **c.to_dict())
            kw = dict(logger=logger, seed=args.seed + round_i,
                      seeds_per_config=max(args.seeds, 1))
            # moud/you ride config lr (mfm_moud.py:466); mosi/mmmo the
            # torch Adam default unless --lr given (mfm_mosi.py:403)
            if info["task"] == "classification":
                kw["use_config_lr"] = True
            else:
                kw["lr"] = args.lr
            if args.seed_parallel:
                kw["mesh"] = _seed_parallel_mesh(
                    len(bucket) * max(args.seeds, 1))
            if info["threshold"] is not None:
                kw.update(binary_threshold=info["threshold"],
                          threshold_mode=info["mode"])
            train_config_bucket(*data, bucket, **kw)
            logger.close()
        round_i += 1
        if args.trials:
            break
    return 0


def _evolve_rounds(args, data, dataset, rng, make_template, prefix,
                   best_str, extra_kw=None, meta_extra=None):
    """Shared round loop for every evolving-search CLI surface: draw a
    shape template per round, run ``--evolve`` rungs of
    train-rank-cull-resample on --trials lanes, print a summary.
    ``--trials 0``: new shape every round, forever — the reference's
    infinite search (``mfm_mosi.py:1302``) with early stopping of bad
    trials."""
    from factorized_tpu.parallel.multiconfig import train_evolving_search

    n = args.trials or 16
    round_i = 0
    while True:
        template = make_template()
        if args.epochs:
            template = template.replace(num_epochs=args.epochs)
        if args.batchsize:
            template = template.replace(batchsize=args.batchsize)
        logger = RunLogger(args.out, run_id=f"{prefix}_evolve{round_i}")
        # "search_meta", not "config": check counts "config" records as
        # trials (the reference's `tot`), and the evolving search logs
        # one per EXPLORED config (parallel/multiconfig.py)
        logger.record("search_meta", evolve_rungs=args.evolve,
                      cull_frac=args.cull_frac, n_configs=n,
                      template=template.to_dict(), **(meta_extra or {}))
        kw = dict(n_configs=n, rungs=args.evolve,
                  cull_frac=args.cull_frac, rng=rng, logger=logger,
                  seed=args.seed + round_i,
                  seeds_per_config=max(args.seeds, 1))
        if args.ckpt_every:
            # rung-boundary granularity: the evolve state is only
            # consistent between rungs (culled lanes swap configs there)
            kw["ckpt_dir"] = f"{args.out}/ckpt_auto_{prefix}_evolve{round_i}"
        if args.resume and round_i == 0:
            kw["resume_from"] = args.resume
        if args.seed_parallel:
            kw["mesh"] = _seed_parallel_mesh(n * max(args.seeds, 1))
        kw.update(extra_kw or {})
        res = train_evolving_search(*data, template, dataset, **kw)
        print(f"{prefix} evolve round {round_i}: explored "
              f"{res['explored_configs']} configs over {args.evolve} "
              f"rungs; best {best_str(res)} (rung {res['best']['rung']})")
        logger.close()
        round_i += 1
        if args.trials:
            break
    return 0


def run_evolve_search(args, data, info, rng):
    """Evolving (successive-halving with lane recycling) search over a
    dataset surface (parallel/multiconfig.py train_evolving_search)."""

    def make_template():
        t = sample_search_config(args.dataset, rng, model_type=args.type,
                                 missing=args.missing, zeros=args.zeros)
        return t.replace(input_dims=info["input_dims"])

    extra = ({"use_config_lr": True} if info["task"] == "classification"
             else {"lr": args.lr})
    if info["threshold"] is not None:
        extra.update(binary_threshold=info["threshold"],
                     threshold_mode=info["mode"])
    return _evolve_rounds(args, data, args.dataset, rng, make_template,
                          args.dataset,
                          lambda res: str(res["best"]["metrics"]),
                          extra_kw=extra)


def run_dataset(args):
    if args.mode != "search" and (args.evolve or args.bucket):
        # same loud-refusal policy as --resume/--seeds conflicts: the
        # user asked for a search strategy that this mode would
        # silently never run
        flag = "--evolve" if args.evolve else "--bucket"
        raise SystemExit(
            f"{flag} only applies to --mode search (got --mode "
            f"{args.mode}); add --mode search or drop {flag}")
    base = (MFMConfig.from_json(args.config) if args.config
            else MFMConfig(seqlength=20))
    data = load_dataset(
        args.dataset, base.seqlength, args.data_root,
        split=parse_split(args.split),
        feature_selection=bool(getattr(args, "feature_selection", 1)),
        normalize_covarep=getattr(args, "normalize_covarep", False))
    info = _dataset_info(args.dataset, data, args)
    rng = random.Random(args.seed)
    if args.mode == "search" and args.evolve:
        return run_evolve_search(args, data, info, rng)
    if args.mode == "search" and args.bucket:
        return run_bucket_search(args, data, info, rng)

    trial = 0
    while True:
        if args.mode == "search":
            cfg = sample_search_config(args.dataset, rng,
                                       model_type=args.type,
                                       missing=args.missing,
                                       zeros=args.zeros)
            # info carries the ACTUAL feature widths (sdk csd files /
            # raw --feature-selection 0 path); dataset dims are fixed
            # otherwise, so the replace is a no-op there
            cfg = cfg.replace(input_dims=info["input_dims"])
        elif args.mode == "best":
            cfg = best_acc_mosi_config(model_type=args.type,
                                       missing=args.missing,
                                       zeros=args.zeros)
            if args.dataset != "mosi":
                cfg = cfg.replace(input_dims=info["input_dims"],
                                  output_dim=info["output_dim"],
                                  task=info["task"])
            else:
                cfg = cfg.replace(input_dims=info["input_dims"])
        else:  # single
            cfg = base.replace(model_type=args.type, missing=args.missing,
                               zeros=args.zeros,
                               input_dims=info["input_dims"],
                               output_dim=info["output_dim"],
                               task=info["task"])
        if args.epochs:
            cfg = cfg.replace(num_epochs=args.epochs)
        if args.batchsize:
            cfg = cfg.replace(batchsize=args.batchsize)

        logger = RunLogger(args.out, run_id=f"{args.dataset}_{trial}")
        logger.text(json.dumps(cfg.to_legacy(), default=str))
        logger.record("config", **cfg.to_dict())
        # moud/you pass config lr to Adam (mfm_moud.py:466); mosi/mmmo
        # use the torch default (mfm_mosi.py:403)
        lr = cfg.lr if info["task"] == "classification" else args.lr
        if args.seeds > 1:
            from factorized_tpu.parallel.multiseed import (
                MULTISEED_TYPES,
                train_mfm_multiseed,
            )

            # kl_ef trains with the two-stage beta-VAE schedule and
            # missing/zeros with their 4-way losses, which the vmapped
            # multiseed path does not implement — REFUSE rather than
            # silently train one seed
            if cfg.model_type not in MULTISEED_TYPES or cfg.missing \
                    or cfg.zeros:
                raise SystemExit(
                    f"--seeds {args.seeds} is only supported for model "
                    f"types {'/'.join(MULTISEED_TYPES)} without "
                    f"--missing/--zeros; type {cfg.model_type!r} "
                    f"(missing={cfg.missing}, zeros={cfg.zeros}) would "
                    "otherwise silently train a single seed - drop "
                    "--seeds or switch types")
            kw = dict(logger=logger, seed=args.seed + trial, lr=lr,
                      n_seeds=args.seeds, resume_from=args.resume,
                      ckpt_every=args.ckpt_every)
            if args.ckpt_every:
                kw["ckpt_dir"] = (f"{args.out}/ckpt_auto_"
                                  f"{args.dataset}_{trial}")
            if args.seed_parallel:
                kw["mesh"] = _seed_parallel_mesh(args.seeds)
            if info["threshold"] is not None:
                kw.update(binary_threshold=info["threshold"],
                          threshold_mode=info["mode"])
            res = train_mfm_multiseed(*data, cfg, **kw)
        else:
            res = dispatch_trainer(
                data, cfg, info, lr=lr, logger=logger,
                seed=args.seed + trial, resume_from=args.resume,
                snapshot=make_autosnapshot(args.out,
                                           f"{args.dataset}_{trial}", cfg,
                                           args.ckpt_every))
        if args.save_ckpt and isinstance(res.get("params"), dict):
            from factorized_tpu.utils.checkpoint import save_checkpoint

            path = f"{args.out}/ckpt_{args.dataset}_{trial}"
            meta_cfg = cfg.to_dict()
            if res.get("history"):
                meta_cfg["_resume_lr"] = res["history"][-1].get("lr")
            if "best_valid" in res:
                meta_cfg["_resume_best_valid"] = res["best_valid"]
            save_checkpoint(path, res["params"],
                            opt_state=res.get("opt_state"),
                            step=res.get("step", cfg.num_epochs),
                            config=meta_cfg)
            logger.text(f"checkpoint saved to {path}")
        logger.close()
        trial += 1
        if args.mode != "search" or (args.trials and trial >= args.trials):
            break
    return 0


def run_mosi_acc(args):
    import numpy as np

    if args.evolve or args.bucket:
        flag = "--evolve" if args.evolve else "--bucket"
        raise SystemExit(
            f"{flag} is not wired to the mosi_acc surface; use the "
            "dataset subcommands (e.g. `mosi --mode search "
            f"{flag} ...`) or scripts/release_best.py --evolve for the "
            "classification search")
    data = list(_load_mosi(args))
    # binarize labels (mfm_mosi_acc.py:505-508)
    for i in (1, 3, 5):
        data[i] = (data[i] >= 0).astype(np.int64)
    raw_dims = _dataset_info("mosi", data, args)["input_dims"]
    rng = random.Random(args.seed)
    base = (MFMConfig.from_json(args.config) if args.config
            else best_acc_mosi_config())
    trial = 0
    while True:
        if args.mode == "search":
            cfg = sample_search_config("mosi", rng)
        elif args.mode == "best":
            cfg = best_acc_mosi_config()
        else:  # single: the provided config (or pinned default)
            cfg = base
        cfg = cfg.replace(input_dims=raw_dims)
        if args.epochs:
            cfg = cfg.replace(num_epochs=args.epochs)
        if args.batchsize:
            cfg = cfg.replace(batchsize=args.batchsize)
        logger = RunLogger(args.out, run_id=f"mosi_acc_{trial}")
        logger.record("config", **cfg.to_dict())
        if args.seeds > 1:
            from factorized_tpu.parallel.multiseed import train_mfm_multiseed

            kw = dict(resume_from=args.resume, ckpt_every=args.ckpt_every)
            if args.ckpt_every:
                kw["ckpt_dir"] = f"{args.out}/ckpt_auto_mosi_acc_{trial}"
            if args.seed_parallel:
                kw["mesh"] = _seed_parallel_mesh(args.seeds)
            train_mfm_multiseed(
                *data, cfg.replace(task="classification", output_dim=2),
                n_seeds=args.seeds, logger=logger, seed=args.seed + trial,
                valid_metric="accuracy", **kw,
            )
        else:
            res = trainers.train_mfm_acc(
                *data, cfg, logger=logger, seed=args.seed + trial,
                resume_from=args.resume,
                snapshot=make_autosnapshot(args.out, f"mosi_acc_{trial}",
                                           cfg, args.ckpt_every))
            if args.save_ckpt and isinstance(res.get("params"), dict):
                from factorized_tpu.utils.checkpoint import save_checkpoint

                path = f"{args.out}/ckpt_mosi_acc_{trial}"
                meta_cfg = cfg.to_dict()
                if res.get("history"):
                    meta_cfg["_resume_lr"] = res["history"][-1].get("lr")
                if "best_valid" in res:
                    meta_cfg["_resume_best_valid"] = res["best_valid"]
                save_checkpoint(path, res["params"],
                                opt_state=res.get("opt_state"),
                                step=res.get("step", cfg.num_epochs),
                                config=meta_cfg)
                logger.text(f"checkpoint saved to {path}")
        logger.close()
        trial += 1
        if args.mode != "search" or (args.trials and trial >= args.trials):
            break
    return 0


def run_test_mosi(args):
    """Frozen-checkpoint evaluation + latency probe
    (``test_mosi.py:484-525`` and the timing probe at 335-342)."""
    from factorized_tpu.serve import Predictor
    from factorized_tpu.utils.metrics import (
        score_classification,
        score_regression,
    )

    import numpy as np

    data = _load_mosi(args)
    _, _, _, _, X_test, y_test = data
    predictor = Predictor.from_checkpoint(args.checkpoint)
    if args.autotune:
        tuned = predictor.autotune(X_test)
        print("autotuned batch sizes:", json.dumps(tuned),
              "-> using", predictor.batch_size)
    y_hat = predictor.predict(X_test)
    if predictor.cfg.task == "regression":
        score_regression(y_hat, y_test)
    else:
        # acc-variant checkpoints classify binarized sentiment
        # (mfm_mosi_acc.py:505-508)
        score_classification(y_hat, (y_test >= 0).astype(np.int64))
    probe = predictor.probe(X_test)
    print("inference probe:", json.dumps(probe))
    dev = predictor.device_latency(X_test)
    print("on-device latency:", json.dumps(dev))
    return 0


def run_predictor(args):
    """EFLSTM / standalone-MFN / SelfAttention baseline trainers
    (``test_mosi.py`` searches, ``test_attention.py``)."""
    from factorized_tpu.config import best_mfn_mosi_config

    data = load_dataset(
        args.dataset, 20, args.data_root,
        feature_selection=bool(getattr(args, "feature_selection", 1)),
        normalize_covarep=getattr(args, "normalize_covarep", False))
    info = _dataset_info(args.dataset, data, args)
    rng = random.Random(args.seed)
    trial = 0
    while True:
        if args.mode == "search":
            cfg = sample_search_config(args.dataset, rng)
        elif args.mode == "best" and args.kind == "mfn":
            # the recorded best MFN-baseline configs
            # (test_mosi.py:537-547); lr rides the config (0.01 / 0.005)
            cfg = best_mfn_mosi_config(args.best)
        else:
            cfg = best_acc_mosi_config()
        cfg = cfg.replace(input_dims=info["input_dims"],
                          output_dim=info["output_dim"], task=info["task"])
        if args.epochs:
            cfg = cfg.replace(num_epochs=args.epochs)
        if args.batchsize:
            cfg = cfg.replace(batchsize=args.batchsize)
        logger = RunLogger(args.out, run_id=f"{args.kind}_{trial}")
        logger.record("config", predictor_kind=args.kind, **cfg.to_dict())
        if args.save_ckpt and args.kind != "mfn":
            raise SystemExit(
                "--save-ckpt is only supported for --kind mfn (the "
                "eflstm/self_attention param shapes are not derivable "
                "from a config alone); drop the flag")
        res = trainers.train_predictor(
            *data, args.kind, cfg, h=args.hidden, drop=args.drop,
            lr=args.lr or cfg.lr or 0.01, optimizer=args.optimizer,
            logger=logger, seed=args.seed + trial,
            binary_threshold=info["threshold"] or 0.0,
            threshold_mode=info["mode"], resume_from=args.resume,
            snapshot=make_autosnapshot(args.out, f"{args.kind}_{trial}",
                                       cfg, args.ckpt_every),
        )
        if args.save_ckpt and isinstance(res.get("params"), dict):
            from factorized_tpu.utils.checkpoint import save_checkpoint

            path = f"{args.out}/ckpt_mfn_{trial}"
            meta_cfg = dict(cfg.to_dict(), model_type="mfn")
            if res.get("history"):
                meta_cfg["_resume_lr"] = res["history"][-1].get("lr")
            save_checkpoint(path, res["params"],
                            opt_state=res.get("opt_state"),
                            step=res.get("step", cfg.num_epochs),
                            config=meta_cfg)
            logger.text(f"checkpoint saved to {path}")
        logger.close()
        trial += 1
        if args.mode != "search" or (args.trials and trial >= args.trials):
            break
    return 0


def run_serve(args):
    import numpy as np

    from factorized_tpu.serve import Predictor, serve_http

    if args.exported:
        if args.export:
            raise SystemExit(
                "--export only applies when loading from --checkpoint "
                "(the artifact is already exported)")
        predictor = Predictor.from_exported(args.exported)
        if args.autotune and not predictor._symbolic:
            raise SystemExit(
                "this artifact has a fixed batch shape "
                "(symbolic_batch=False at export time): --autotune "
                "needs a symbolic-batch artifact or --checkpoint")
    else:
        predictor = Predictor.from_checkpoint(args.checkpoint)
    if args.autotune:
        # tune on synthetic traffic shaped like the model's input
        d = sum(predictor.cfg.input_dims)
        X = np.random.default_rng(0).normal(
            size=(1024, predictor.cfg.seqlength, d)).astype(np.float32)
        tuned = predictor.autotune(X)
        print("autotuned batch sizes:", json.dumps(tuned),
              "-> using", predictor.batch_size)
    if args.export:
        out = predictor.export(args.export)
        print(f"exported AOT artifact to {out}")
        return 0
    serve_http(predictor, args.host, args.port,
               micro_batch=not args.no_microbatch,
               max_wait_ms=args.max_wait_ms)
    return 0


def run_test_attention(args):
    data = _load_mosi(args)
    cfg = MFMConfig(input_dims=_dataset_info("mosi", data,
                                             args)["input_dims"],
                    batchsize=args.batchsize or 128,
                    num_epochs=args.epochs or 100)
    logger = RunLogger(args.out, run_id="self_attention")
    trainers.train_predictor(*data, "self_attention", cfg,
                             h=args.hidden, drop=0.5, lr=args.lr or 0.01,
                             logger=logger, seed=args.seed)
    logger.close()
    return 0


def run_multitrait_evolve(args, data, input_dims, rng):
    """Evolving search over the multi-trait surface: the reference's
    POM/IEMOCAP-family random search (``mfm_mmmo.py:676-729`` space)
    run as successive halving with lane recycling, one vector-output
    MFM per lane (ranking by mean test MAE over traits)."""
    import numpy as np

    n_traits = int(np.asarray(data[1]).shape[1])

    def make_template():
        return sample_search_config("mmmo", rng,
                                    model_type=args.type).replace(
            input_dims=list(input_dims), task="regression",
            output_dim=n_traits)

    return _evolve_rounds(
        args, data, "mmmo", rng, make_template, args.style,
        lambda res: f"mean-MAE {res['best']['metrics']['mae_mean']:.4f}",
        extra_kw={"lr": args.lr}, meta_extra={"style": args.style})


def run_multitrait(args):
    """POM/IEMOCAP-style multi-trait regression (present in the
    reference only as check.py's aggregation modes), plus the PUBLIC
    .csd paths: ``--style mosei_sdk`` (sentiment + 6 emotion columns)
    and ``--style pom_sdk`` (the 17 POM speaker-trait columns,
    reference surface ``mfm_mmmo.py:33-345`` + ``check.py:226-250``)."""
    # flag validation BEFORE the (possibly multi-GB csd) data load
    if not args.feature_selection or args.normalize_covarep:
        raise SystemExit(
            "--feature-selection 0/--normalize-covarep only apply to "
            "the mosi dataset (reference mfm_mosi.py:37,60-73); the "
            "multitrait surface has no raw-feature path")
    if (args.evolve or args.bucket) and args.mode != "search":
        flag = "--evolve" if args.evolve else "--bucket"
        raise SystemExit(
            f"{flag} only applies to --mode search (got --mode "
            f"{args.mode}); add --mode search or drop {flag}")
    if args.seeds > 1 and not (args.mode == "search"
                               and (args.bucket or args.evolve)):
        # only the --bucket/--evolve search paths consume --seeds
        # (seeds_per_config); the single/best trainers AND the plain
        # --mode search trial loop train one seed per run — refuse
        # instead of silently training one seed
        raise SystemExit(
            f"--seeds {args.seeds} on the multitrait surface only "
            "applies to --mode search with --bucket or --evolve "
            "(those lanes run seeds_per_config); other modes train "
            "one seed - drop --seeds or add --bucket/--evolve")
    from factorized_tpu.data import multitrait

    base = (MFMConfig.from_json(args.config) if args.config
            else MFMConfig(seqlength=20))
    if args.style in ("mosei_sdk", "pom_sdk"):
        from factorized_tpu.data import mmsdk

        files = (mmsdk.MOSEI_FILES if args.style == "mosei_sdk"
                 else mmsdk.POM_FILES)
        data = mmsdk.get_data(base.seqlength, data_root=args.data_root,
                              files=files, label_mode="vector",
                              split=parse_split(args.split))
        input_dims = list(data.input_dims)
    else:
        data = multitrait.get_data(base.seqlength,
                                   data_root=args.data_root,
                                   style=args.style)
        input_dims = multitrait.INPUT_DIMS
    rng = random.Random(args.seed)
    if args.mode == "search" and args.evolve:
        return run_multitrait_evolve(args, data, input_dims, rng)
    if args.mode == "search" and args.bucket:
        # shape-bucketed vmapped search over the multi-trait surface
        # (reference POM/IEMOCAP search family, check.py:128-164):
        # sample from the mmmo space, pin the vector output head
        import numpy as np

        n_traits = int(np.asarray(data[1]).shape[1])
        info_mt = dict(task="regression", threshold=None, mode="ge",
                       input_dims=list(input_dims), output_dim=n_traits)

        def sample_mt():
            return sample_search_config("mmmo", rng,
                                        model_type=args.type).replace(
                input_dims=list(input_dims), task="regression",
                output_dim=n_traits)

        return run_bucket_search(args, data, info_mt, rng,
                                 sample_fn=sample_mt, prefix=args.style)
    trial = 0
    while True:
        if args.mode == "search":
            cfg = sample_search_config("mmmo", rng, model_type=args.type)
        elif args.mode == "best":
            cfg = best_acc_mosi_config(model_type=args.type)
        else:
            cfg = base.replace(model_type=args.type)
        cfg = cfg.replace(input_dims=input_dims, task="regression")
        if args.epochs:
            cfg = cfg.replace(num_epochs=args.epochs)
        if args.batchsize:
            cfg = cfg.replace(batchsize=args.batchsize)
        logger = RunLogger(args.out, run_id=f"{args.style}_{trial}")
        if args.style in ("mosei_sdk", "pom_sdk"):
            from factorized_tpu.data.mmsdk import MOSEI_TRAITS

            # trait names in the run record: the per-trait metric lists
            # (mae: [..]) are positional, this documents the columns
            traits = (MOSEI_TRAITS if args.style == "mosei_sdk"
                      else multitrait.POM_TRAITS)
            logger.record("config", style=args.style,
                          traits=traits, **cfg.to_dict())
        else:
            logger.record("config", style=args.style, **cfg.to_dict())
        res = trainers.train_mfm_multitrait(
            *data, cfg, logger=logger, seed=args.seed + trial, lr=args.lr,
            resume_from=args.resume,
            snapshot=make_autosnapshot(args.out, f"{args.style}_{trial}",
                                       cfg, args.ckpt_every))
        if args.save_ckpt and isinstance(res.get("params"), dict):
            from factorized_tpu.utils.checkpoint import save_checkpoint

            save_checkpoint(f"{args.out}/ckpt_{args.style}_{trial}",
                            res["params"], opt_state=res.get("opt_state"),
                            step=res.get("step", cfg.num_epochs),
                            config=cfg.to_dict())
        logger.close()
        trial += 1
        if args.mode != "search" or (args.trials and trial >= args.trials):
            break
    return 0


def run_check(args):
    from factorized_tpu.check import best_multitrait, check_dir

    if args.multitrait:
        best_multitrait(args.dir, style=args.style)
    else:
        check_dir(args.dir, condition=args.condition)
    return 0


def build_parser():
    p = argparse.ArgumentParser(
        prog="factorized_tpu",
        description="TPU-native factorized multimodal learning (MFM)",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--config", default=None,
                        help="JSON config (legacy schema accepted)")
        sp.add_argument("--type", default="mfm",
                        help="mfm|kl|kl_ef|m_a..m_d|s2s|bm")
        sp.add_argument("--mode", default="single",
                        choices=["single", "best", "search"])
        sp.add_argument("--trials", type=int, default=1,
                        help="search trials (0 = run forever)")
        sp.add_argument("--missing", type=int, default=0)
        sp.add_argument("--zeros", type=int, default=0)
        sp.add_argument("--epochs", type=int, default=None)
        sp.add_argument("--batchsize", type=int, default=None)
        sp.add_argument("--lr", type=float, default=None)
        sp.add_argument("--seed", type=int, default=123)
        sp.add_argument("--data-root", default=None)
        sp.add_argument("--feature-selection", type=int, choices=(0, 1),
                        default=1, metavar="{0,1}",
                        help="mosi only: 1 = fs_mask-selected covarep/"
                             "facet columns (default, reference -s 1); "
                             "0 = raw covarep cols 1:35 + full FACET "
                             "(mfm_mosi.py:37,60-73)")
        sp.add_argument("--normalize-covarep", action="store_true",
                        help="mosi only: max-abs normalize covarep by "
                             "train stats like the reference's "
                             "get_data_missing (mfm_mosi.py:181-191)")
        sp.add_argument("--split", default=None, metavar="N_TRAIN,N_VALID",
                        help="video-count split for the SDK csd "
                             "datasets (default: MOSI's 52,10 when the "
                             "set has exactly 93 videos, proportional "
                             "56%%/11%% otherwise)")
        sp.add_argument("--out", default="runs",
                        help="JSONL metrics directory")
        sp.add_argument("--save-ckpt", action="store_true",
                        help="save the best-params checkpoint under --out")
        sp.add_argument("--resume", default=None,
                        help="checkpoint dir to resume training from")
        sp.add_argument("--ckpt-every", type=int, default=0,
                        help="auto-save a crash-resume checkpoint "
                             "(params+opt_state+step) every N epochs "
                             "under --out")
        sp.add_argument("--seeds", type=int, default=1,
                        help=">1: train K seeds simultaneously (vmapped)")
        sp.add_argument("--bucket", action="store_true",
                        help="with --mode search: group sampled configs "
                             "by shape signature and train each bucket "
                             "as ONE vmapped program (per-lane dropout/"
                             "loss-weight/lr traced); x --seeds lanes "
                             "per config")
        sp.add_argument("--evolve", type=int, default=0, metavar="RUNGS",
                        help="with --mode search: successive-halving "
                             "search — one shape signature per round, "
                             "--trials vmapped value-draw lanes, RUNGS "
                             "train/rank/cull/resample rungs of --epochs "
                             "each (culled lanes recycled into fresh "
                             "trials without recompiling)")
        sp.add_argument("--cull-frac", type=float, default=0.5,
                        help="fraction of configs re-drawn per evolve "
                             "rung (default 0.5)")
        sp.add_argument("--profile", default=None, metavar="DIR",
                        help="capture a jax.profiler trace of the whole "
                             "run into DIR (TensorBoard-loadable)")
        sp.add_argument("--seed-parallel", action="store_true",
                        help="with --seeds>1: shard the seed axis over "
                             "all visible devices (linear multi-chip "
                             "scaling, zero collectives)")
        sp.add_argument("--multihost", action="store_true",
                        help="initialize the multi-host runtime "
                             "(jax.distributed) before training; "
                             "coordinator from JAX_COORDINATOR_ADDRESS/"
                             "JAX_NUM_PROCESSES/JAX_PROCESS_ID or TPU "
                             "metadata auto-detection")

    for name in DATASETS:
        sp = sub.add_parser(name)
        common(sp)
        sp.set_defaults(func=run_dataset, dataset=name)

    sp = sub.add_parser("mosi_acc")
    common(sp)
    sp.set_defaults(func=run_mosi_acc)

    sp = sub.add_parser("test_mosi")
    common(sp)
    sp.add_argument("--checkpoint", required=True)
    sp.add_argument("--autotune", action="store_true",
                    help="pick the serving batch size by throughput")
    sp.set_defaults(func=run_test_mosi)

    sp = sub.add_parser("test_attention")
    common(sp)
    sp.add_argument("--hidden", type=int, default=128)
    sp.set_defaults(func=run_test_attention)

    sp = sub.add_parser("predictor",
                        help="EFLSTM / MFN / SelfAttention baselines")
    common(sp)
    sp.add_argument("--kind", default="mfn",
                    choices=["eflstm", "mfn", "self_attention"])
    sp.add_argument("--dataset", default="mosi", choices=list(DATASETS))
    sp.add_argument("--hidden", type=int, default=128)
    sp.add_argument("--drop", type=float, default=0.5)
    sp.add_argument("--optimizer", default="adam", choices=["adam", "sgd"],
                    help="reference's acc variant trained with "
                         "SGD+momentum (test_mosi_acc.py:285)")
    sp.add_argument("--best", default="mae", choices=["mae", "acc"],
                    help="which pinned MFN config --mode best uses")
    sp.set_defaults(func=run_predictor)

    sp = sub.add_parser("serve", help="JSON-over-HTTP inference endpoint")
    group = sp.add_mutually_exclusive_group(required=True)
    group.add_argument("--checkpoint")
    group.add_argument("--exported",
                       help="serve from a Predictor.export AOT artifact "
                            "(no model code / checkpoint needed)")
    sp.add_argument("--export", default=None, metavar="DIR",
                    help="compile + serialize the forward (weights "
                         "embedded) to DIR via jax.export, then exit; "
                         "combine with --autotune to bake the tuned "
                         "batch size into the artifact")
    sp.add_argument("--host", default="127.0.0.1")
    sp.add_argument("--port", type=int, default=8787)
    sp.add_argument("--autotune", action="store_true",
                    help="pick the serving batch size by throughput "
                         "before accepting traffic")
    sp.add_argument("--no-microbatch", action="store_true",
                    help="disable dynamic request coalescing (serialize "
                         "requests behind a device lock instead)")
    sp.add_argument("--max-wait-ms", type=float, default=3.0,
                    help="micro-batch window after the first queued "
                         "request")
    sp.set_defaults(func=run_serve)

    sp = sub.add_parser("multitrait",
                        help="POM/IEMOCAP-style multi-trait regression")
    common(sp)
    sp.add_argument("--style", default="pom",
                    choices=["pom", "iemocap", "mosei_sdk", "pom_sdk"])
    sp.set_defaults(func=run_multitrait)

    sp = sub.add_parser("check")
    sp.add_argument("--dir", default="runs")
    sp.add_argument("--condition", default=None, choices=["l", "a", "v"])
    sp.add_argument("--multitrait", action="store_true",
                    help="per-trait aggregation (reference pom/ie2 modes)")
    sp.add_argument("--style", default=None, choices=["pom", "ie2"],
                    help="multitrait report style: pom = directory-wide "
                         "with x100 acc row; ie2 = per-file reset")
    sp.set_defaults(func=run_check)

    sp = sub.add_parser(
        "warmup",
        help="pre-populate the persistent XLA compile cache with the "
             "production programs (bench epoch/chunk/scale, trainer "
             "loop, K=8 multiseed, released-checkpoint serving) so "
             "later process-cold runs start in seconds")
    sp.set_defaults(func=_run_warmup)

    return p


def _run_warmup(args):
    from factorized_tpu.warmup import run_warmup

    return run_warmup(args)


def main(argv=None):
    from factorized_tpu.utils.compilation_cache import enable

    enable()
    args = build_parser().parse_args(argv)
    if getattr(args, "multihost", False):
        # must precede any backend use so jax.devices() is global
        from factorized_tpu.parallel import init_distributed

        init_distributed()
    if getattr(args, "profile", None):
        # SURVEY.md §5.1: the reference's only profiling is an ad-hoc
        # time.time() probe (test_mosi.py:335-342); here the whole run
        # is wrapped in a jax.profiler trace
        from factorized_tpu.utils.profiling import trace

        with trace(args.profile):
            return args.func(args)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
