"""Training-dynamics parity check: train the SAME MFM architecture on
the SAME synthetic MOSI data with (a) this framework and (b) a
PyTorch-CPU implementation of the reference math (bench.py's model),
then compare test metrics.

Real CMU-MOSI features are unavailable outside the original lab
storage (SURVEY.md §7 "data availability"), so this validates the
north-star's "MAE / binary-acc within 1%" criterion on the synthetic
fixtures — same architecture, loss, optimizer (Adam 1e-3), schedule
(ReduceLROnPlateau, best-valid checkpointing) on both sides.

Usage: python scripts/validate_training_parity.py [--epochs 20]
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


def run_torch(data, cfg, epochs):
    import torch
    import torch.nn.functional as F

    import bench
    from factorized_tpu.utils.metrics import regression_metrics
    from factorized_tpu.utils.scheduler import ReduceLROnPlateau

    X_train, y_train, X_valid, y_valid, X_test, y_test = data
    torch.manual_seed(123)
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
        print(f"  torch epoch {epoch}: valid {valid:.4f}", file=sys.stderr)
    if best_state:
        model.load_state_dict(best_state)
    model.eval()
    with torch.no_grad():
        _, yte_hat, _ = model(Xte)
    m = regression_metrics(yte_hat.squeeze(1).numpy(), y_test)
    return m, time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    args = ap.parse_args()

    from factorized_tpu.config import best_acc_mosi_config
    from factorized_tpu.data import mosi

    data = mosi.get_data(seqlength=20)
    cfg = best_acc_mosi_config()

    ours, t_ours = run_ours(data, cfg, args.epochs)
    theirs, t_torch = run_torch(data, cfg, args.epochs)

    print("\n## Training-dynamics parity (synthetic MOSI, "
          f"{args.epochs} epochs, best-acc config)\n")
    print("| metric | factorized_tpu | torch-CPU reference math | delta |")
    print("|---|---|---|---|")
    for k in ("mae", "corr", "mult_acc", "binary_accuracy"):
        d = abs(ours[k] - theirs[k])
        print(f"| {k} | {ours[k]:.4f} | {theirs[k]:.4f} | {d:.4f} |")
    print(f"| wall time (s) | {t_ours:.1f} | {t_torch:.1f} | "
          f"{t_torch / max(t_ours, 1e-9):.1f}x |")


if __name__ == "__main__":
    main()
