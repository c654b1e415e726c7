"""Training-dynamics parity check: train the SAME MFM architecture on
the SAME synthetic MOSI data with (a) this framework and (b) a
PyTorch-CPU implementation of the reference math (bench.py's model),
then compare test metrics.

Real CMU-MOSI features are unavailable outside the original lab
storage (SURVEY.md §7 "data availability"), so this validates the
north-star's "MAE / binary-acc within 1%" criterion on the synthetic
fixtures — same architecture, loss, optimizer (Adam 1e-3), schedule
(ReduceLROnPlateau, best-valid checkpointing) on both sides.

Both sides run K seeds (init/dropout/MMD RNG varies; data order fixed)
at the full epoch budget and report mean +- std per metric plus the gap
of means — the evidence for BASELINE.md's "within 1%" criterion
(VERDICT r1 item 4; reference eval protocol ``mfm_mosi.py:483-499``).

Usage: python scripts/validate_training_parity.py [--epochs 50]
       [--seeds 5]
Writes a markdown summary to stdout.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_ours(data, cfg, epochs):
    from factorized_tpu import trainers
    from factorized_tpu.utils.logging import RunLogger

    t0 = time.time()
    res = trainers.train_mfm(*data, cfg.replace(num_epochs=epochs),
                             logger=RunLogger(echo=False))
    return res["metrics"], time.time() - t0


def run_ours_multiseed(data, cfg, epochs, n_seeds):
    """K seeds in ONE vmapped program — per-seed test metrics."""
    from factorized_tpu.parallel.multiseed import train_mfm_multiseed
    from factorized_tpu.utils.logging import RunLogger

    t0 = time.time()
    res = train_mfm_multiseed(*data, cfg.replace(num_epochs=epochs),
                              n_seeds=n_seeds, logger=RunLogger(echo=False))
    return [r["metrics"] for r in res["results"]], time.time() - t0


def run_torch(data, cfg, epochs, seed=123):
    import torch
    import torch.nn.functional as F

    import bench
    from factorized_tpu.utils.metrics import regression_metrics
    from factorized_tpu.utils.scheduler import ReduceLROnPlateau

    X_train, y_train, X_valid, y_valid, X_test, y_test = data
    torch.manual_seed(seed)  # varies init + dropout draws per seed
    torch.set_num_threads(os.cpu_count() or 8)
    model = bench._torch_mfm(cfg)
    opt = torch.optim.Adam(model.parameters())
    sched = ReduceLROnPlateau(1e-3)

    rng = np.random.RandomState(123)
    p = rng.permutation(X_train.shape[0])
    Xtr = torch.tensor(X_train[p].swapaxes(0, 1))
    ytr = torch.tensor(y_train[p])
    Xv = torch.tensor(np.ascontiguousarray(X_valid.swapaxes(0, 1)))
    yv = torch.tensor(y_valid)
    Xte = torch.tensor(np.ascontiguousarray(X_test.swapaxes(0, 1)))

    d_l, d_a, _ = cfg.input_dims
    B = cfg.batchsize
    nb = Xtr.shape[1] // B
    best_valid, best_state = float("inf"), None
    t0 = time.time()
    for epoch in range(epochs):
        model.train()
        for b in range(nb):
            opt.zero_grad()
            x = Xtr[:, b * B:(b + 1) * B]
            y = ytr[b * B:(b + 1) * B]
            hats, y_hat, mmd = model(x)
            gen = (cfg.lda_xl * F.mse_loss(hats[0], x[..., :d_l])
                   + cfg.lda_xa * F.mse_loss(hats[1], x[..., d_l:d_l + d_a])
                   + cfg.lda_xv * F.mse_loss(hats[2], x[..., d_l + d_a:]))
            disc = F.l1_loss(y_hat.squeeze(1), y)
            (disc + gen + cfg.lda_mmd * mmd).backward()
            opt.step()
        model.eval()
        with torch.no_grad():
            _, yv_hat, _ = model(Xv)
            valid = float(F.l1_loss(yv_hat.squeeze(1), yv))
        lr = sched.step(valid)
        for g in opt.param_groups:
            g["lr"] = lr
        if valid <= best_valid:
            best_valid = valid
            best_state = {k: v.clone() for k, v in model.state_dict().items()}
        if epoch % 10 == 0 or epoch == epochs - 1:
            print(f"  torch[{seed}] epoch {epoch}: valid {valid:.4f}",
                  file=sys.stderr)
    if best_state:
        model.load_state_dict(best_state)
    model.eval()
    with torch.no_grad():
        _, yte_hat, _ = model(Xte)
    m = regression_metrics(yte_hat.squeeze(1).numpy(), y_test)
    return m, time.time() - t0


METRICS = ("mae", "corr", "mult_acc", "binary_accuracy")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=50,
                    help="full budget = best-acc config's 50")
    ap.add_argument("--seeds", type=int, default=5,
                    help="torch seeds (>=5 for the parity evidence)")
    ap.add_argument("--ours-seeds", type=int, default=None,
                    help="our seeds (default: same as --seeds; the "
                         "vmapped program makes extra seeds nearly free)")
    args = ap.parse_args()
    ours_k = args.ours_seeds or args.seeds

    from factorized_tpu.config import best_acc_mosi_config
    from factorized_tpu.data import mosi

    data = mosi.get_data(seqlength=20)
    cfg = best_acc_mosi_config()

    ours, t_ours = run_ours_multiseed(data, cfg, args.epochs, ours_k)
    theirs = []
    t_torch = 0.0
    for s in range(args.seeds):
        m, dt = run_torch(data, cfg, args.epochs, seed=123 + 1000 * s)
        theirs.append(m)
        t_torch += dt
        print(f"  torch seed {s}: " + " ".join(
            f"{k}={m[k]:.4f}" for k in METRICS), file=sys.stderr)

    print("\n## Training-dynamics parity (synthetic MOSI, "
          f"{args.epochs} epochs, best-acc config, "
          f"{ours_k} ours / {args.seeds} torch seeds)\n")
    print("| metric | ours mean+-std | torch mean+-std | gap of means "
          "| gap % | ours best-of-K | torch best-of-K | best gap % |")
    print("|---|---|---|---|---|---|---|---|")
    for k in METRICS:
        a = np.array([m[k] for m in ours], np.float64)
        b = np.array([m[k] for m in theirs], np.float64)
        gap = a.mean() - b.mean()
        rel = 100.0 * abs(gap) / max(abs(b.mean()), 1e-9)
        # the reference's actual protocol is best-over-runs: check.py
        # nanmin (mae) / nanmax (everything else) across a directory
        best = np.min if k == "mae" else np.max
        ab, bb = best(a), best(b)
        brel = 100.0 * abs(ab - bb) / max(abs(bb), 1e-9)
        print(f"| {k} | {a.mean():.4f} +- {a.std():.4f} "
              f"| {b.mean():.4f} +- {b.std():.4f} "
              f"| {gap:+.4f} | {rel:.1f}% "
              f"| {ab:.4f} | {bb:.4f} | {brel:.1f}% |")
    print(f"| wall time (s) | {t_ours:.1f} ({ours_k} seeds vmapped) "
          f"| {t_torch:.1f} | | | | | |")
    print("\nper-seed ours:  " + "; ".join(
        " ".join(f"{k}={m[k]:.3f}" for k in METRICS) for m in ours))
    print("per-seed torch: " + "; ".join(
        " ".join(f"{k}={m[k]:.3f}" for k in METRICS) for m in theirs))


if __name__ == "__main__":
    main()
