"""Refresh the released checkpoints (best/mfn_mae, best/mfn_acc).

Trains K seeds of the pinned best-acc MOSI config simultaneously (one
vmapped TPU program), picks each task's best seed, and overwrites the
shipped checkpoint ONLY if it beats the currently shipped one on the
same synthetic test set (same provenance as the round-1 release:
seed-123 synthetic fixtures, best-valid checkpointing per seed).

Usage: python scripts/release_best.py [--epochs 100] [--seeds 16]
       [--dry-run]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def evaluate_shipped(path, X_test, y_test, task):
    from factorized_tpu.serve import Predictor

    if not os.path.isdir(path):
        return None
    p = Predictor.from_checkpoint(path)
    y_hat = p.predict(np.asarray(X_test, np.float32))
    if task == "regression":
        return float(np.mean(np.abs(y_hat - y_test)))
    return float((np.argmax(y_hat, axis=1) == y_test).mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=100,
                    help="total epochs (multiseed mode) or epochs PER "
                         "RUNG (--evolve mode)")
    ap.add_argument("--seeds", type=int, default=16,
                    help="vmapped seeds (multiseed) / lanes (--evolve: "
                         "n_configs, 1 seed per config)")
    ap.add_argument("--evolve", type=int, default=0, metavar="RUNGS",
                    help="search VALUE hyperparameters around the pinned "
                         "shape with the successive-halving evolving "
                         "search instead of re-seeding the pinned config")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    from factorized_tpu.config import best_acc_mosi_config
    from factorized_tpu.data import mosi
    from factorized_tpu.parallel.multiconfig import train_evolving_search
    from factorized_tpu.parallel.multiseed import train_mfm_multiseed
    from factorized_tpu.utils.checkpoint import save_checkpoint
    from factorized_tpu.utils.logging import RunLogger

    data = list(mosi.get_data(seqlength=20))
    quiet = RunLogger(echo=False)

    def run(task_data, cfg, valid_metric):
        """One search: either K re-seeds of the pinned config, or an
        evolving VALUE search around its shape (lr + dropouts + loss
        weights traced per lane; ``parallel/multiconfig.py``)."""
        if args.evolve:
            res = train_evolving_search(
                *task_data, cfg, "mosi", n_configs=args.seeds,
                rungs=args.evolve, seeds_per_config=1,
                use_config_lr=True, valid_metric=valid_metric,
                logger=quiet, seed=123)
            # the winner trained (rung+1) rungs of args.epochs each;
            # record its real provenance, not just one rung's length
            step = (res["best"]["rung"] + 1) * args.epochs
            meta = dict(res["best"]["config"])
            meta["_release"] = {
                "mode": "evolve", "rungs": args.evolve,
                "epochs_per_rung": args.epochs,
                "winning_rung": res["best"]["rung"],
                "explored_configs": res["explored_configs"],
            }
            return (res["best"]["metrics"], res["params"], meta, step,
                    f"evolve rungs={args.evolve} x {args.epochs} epochs, "
                    f"{res['explored_configs']} configs explored")
        res = train_mfm_multiseed(*task_data, cfg, n_seeds=args.seeds,
                                  logger=quiet, valid_metric=valid_metric)
        return (res["results"][res["best_seed"]]["metrics"],
                res["best_params"], cfg.to_dict(), args.epochs,
                f"epochs={args.epochs}, seeds={args.seeds}")

    # --- regression (mfn_mae) ---
    cfg = best_acc_mosi_config(num_epochs=args.epochs)
    new, best_params, best_cfg, step, how = run(data, cfg, "loss")
    shipped = evaluate_shipped(f"{REPO}/best/mfn_mae", data[4], data[5],
                               "regression")
    print(f"mfn_mae: new best MAE {new['mae']:.4f} "
          f"(acc {new['binary_accuracy']:.4f}) vs shipped "
          f"{shipped if shipped is None else round(shipped, 4)}")
    if not args.dry_run and (shipped is None or new["mae"] < shipped):
        save_checkpoint(f"{REPO}/best/mfn_mae", best_params,
                        step=step, config=dict(best_cfg))
        print(f"  -> RELEASED ({how})")

    # --- classification (mfn_acc) ---
    acc_cfg = cfg.replace(task="classification", output_dim=2)
    acc_data = list(data)
    for i in (1, 3, 5):
        acc_data[i] = (np.asarray(acc_data[i]) >= 0).astype(np.int64)
    new_a, best_params_a, best_cfg_a, step_a, how_a = run(acc_data, acc_cfg,
                                                          "accuracy")
    shipped_a = evaluate_shipped(f"{REPO}/best/mfn_acc", acc_data[4],
                                 acc_data[5], "classification")
    print(f"mfn_acc: new best acc {new_a['accuracy']:.4f} vs shipped "
          f"{shipped_a if shipped_a is None else round(shipped_a, 4)}")
    if not args.dry_run and (shipped_a is None
                             or new_a["accuracy"] > shipped_a):
        save_checkpoint(f"{REPO}/best/mfn_acc", best_params_a,
                        step=step_a, config=dict(best_cfg_a))
        print(f"  -> RELEASED ({how_a})")

    print(json.dumps({"mae": new["mae"], "mae_shipped": shipped,
                      "acc": new_a["accuracy"], "acc_shipped": shipped_a}))


if __name__ == "__main__":
    main()
