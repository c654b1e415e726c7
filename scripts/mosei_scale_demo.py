"""MOSEI-scale throughput demo over the public .csd path.

Generates a realistic-size synthetic CMU-MOSEI-shaped .csd release
(default 3228 videos / ~22k segments — the real dataset's video count,
reference ``README.md:28-30``), runs it through the SAME adapter a user
would point at a real SDK download (``data/mmsdk.py``: word alignment,
proportional 56/11/rest split, train-stat normalization), and times

- host prep (csd read + interval alignment + split/stack), and
- sustained TPU training throughput of the multitrait (sentiment + 6
  emotions) MFM at that scale (whole-epoch scan program, steady state).

Prints ONE JSON line. The .csd set is cached at --root across runs.

Run on the TPU host:  python scripts/mosei_scale_demo.py
Smaller smoke:        python scripts/mosei_scale_demo.py --videos 200
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TEXT_D, COV_D, FAC_D = 300, 74, 35


def generate(root, n_videos, seed):
    """Write a MOSEI-shaped 4-file .csd set: per segment, timestamped
    word vectors plus covarep/facet rows at their own (higher) rates
    over the same span, labels (1, 7)."""
    import h5py

    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    names = {
        "text": "CMU_MOSEI_TimestampedWordVectors.csd",
        "audio": "CMU_MOSEI_COVAREP.csd",
        "visual": "CMU_MOSEI_VisualFacet42.csd",
        "labels": "CMU_MOSEI_Labels.csd",
    }
    files = {k: h5py.File(os.path.join(root, v), "w") for k, v in
             names.items()}
    grps = {k: f.create_group(k).create_group("data")
            for k, f in files.items()}

    n_segments = 0
    for vi in range(n_videos):
        vid = f"synth{vi:05d}"
        for si in range(int(rng.integers(2, 13))):
            seg = f"{vid}[{si}]"
            n_words = int(rng.integers(4, 31))
            # word timeline: ~0.3 s/word with jitter
            durs = rng.uniform(0.15, 0.5, n_words)
            ends = np.cumsum(durs)
            w_iv = np.stack([ends - durs, ends], axis=1)
            span = float(ends[-1])

            def rows(rate, d):
                n = max(1, int(span * rate))
                e = np.linspace(0, span, n + 1)
                iv = np.stack([e[:-1], e[1:]], axis=1)
                return rng.standard_normal((n, d)).astype(np.float32), iv

            g = grps["text"].create_group(seg)
            g.create_dataset(
                "features",
                data=rng.standard_normal((n_words, TEXT_D)).astype(
                    np.float32))
            g.create_dataset("intervals", data=w_iv)
            for kind, rate, d in (("audio", 10.0, COV_D),
                                  ("visual", 5.0, FAC_D)):
                f, iv = rows(rate, d)
                g = grps[kind].create_group(seg)
                g.create_dataset("features", data=f)
                g.create_dataset("intervals", data=iv)
            g = grps["labels"].create_group(seg)
            g.create_dataset(
                "features",
                data=rng.uniform(-3, 3, (1, 7)).astype(np.float32))
            g.create_dataset("intervals",
                             data=np.array([[0.0, span]]))
            n_segments += 1
    for f in files.values():
        f.close()
    return n_segments


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/mosei_synth")
    ap.add_argument("--videos", type=int, default=3228)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--batchsize", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=3,
                    help="timed steady-state epochs (after 1 warmup)")
    args = ap.parse_args()

    marker = os.path.join(args.root, f"generated_{args.videos}.json")
    if not os.path.exists(marker):
        t0 = time.perf_counter()
        n_seg = generate(args.root, args.videos, args.seed)
        gen_s = time.perf_counter() - t0
        with open(marker, "w") as f:
            json.dump({"videos": args.videos, "segments": n_seg,
                       "gen_s": gen_s}, f)
        print(f"generated {args.videos} videos / {n_seg} segments "
              f"in {gen_s:.1f}s", file=sys.stderr)
    with open(marker) as f:
        gen_meta = json.load(f)

    from factorized_tpu.utils.compilation_cache import enable

    enable()
    import jax
    import jax.numpy as jnp

    from factorized_tpu.config import MFMConfig
    from factorized_tpu.data import mmsdk
    from factorized_tpu.models import get_model
    from factorized_tpu.train import TrainProgram, make_optimizer
    from factorized_tpu.trainers import _prep_data, make_batches

    t0 = time.perf_counter()
    data = mmsdk.get_data(20, data_root=args.root,
                          files=mmsdk.MOSEI_FILES, label_mode="vector")
    prep_s = time.perf_counter() - t0
    X_train, y_train = data[0], data[1]
    print(f"host prep (csd read + align + split/stack): {prep_s:.1f}s "
          f"-> train X {X_train.shape}", file=sys.stderr)

    n_traits = int(np.asarray(y_train).shape[1])
    cfg = MFMConfig(seqlength=20).replace(
        input_dims=list(data.input_dims), task="regression",
        output_dim=n_traits, batchsize=args.batchsize)
    Xtr, ytr, _, _, _, _ = _prep_data(*data, args.seed)

    init, apply_fn = get_model("mfm")
    params = init(jax.random.PRNGKey(args.seed), cfg)
    opt = make_optimizer("adam", 1e-3)
    opt_state = opt.init(params)
    program = TrainProgram(apply_fn, cfg, "joint", opt)
    Xb, yb, _ = make_batches(Xtr, ytr.astype(np.float32), cfg.batchsize,
                             False)
    t0 = time.perf_counter()
    Xb, yb = jax.device_put((jnp.asarray(Xb), jnp.asarray(yb)))
    jax.block_until_ready((Xb, yb))
    upload_s = time.perf_counter() - t0
    nb = Xb.shape[0]
    lr = jnp.asarray(1e-3, jnp.float32)

    t0 = time.perf_counter()
    params, opt_state, acc = program.epoch(params, opt_state, Xb, yb,
                                           jax.random.PRNGKey(1), lr)
    float(acc)
    print(f"compile+first epoch: {time.perf_counter() - t0:.1f}s "
          f"({nb} steps/epoch)", file=sys.stderr)
    t0 = time.perf_counter()
    for e in range(args.epochs):
        params, opt_state, acc = program.epoch(
            params, opt_state, Xb, yb,
            jax.random.fold_in(jax.random.PRNGKey(2), e), lr)
    float(acc)
    ep_s = (time.perf_counter() - t0) / args.epochs

    print(json.dumps({
        "videos": gen_meta["videos"],
        "segments": gen_meta["segments"],
        "train_segments": int(Xtr.shape[1]),  # _prep_data is time-major
        "steps_per_epoch": int(nb),
        "batchsize": args.batchsize,
        "host_prep_s": round(prep_s, 1),
        "device_upload_s": round(upload_s, 2),
        "epoch_s": round(ep_s, 3),
        "steps_per_sec": round(nb / ep_s, 1),
        "segments_per_sec": round(nb * args.batchsize / ep_s, 1),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
