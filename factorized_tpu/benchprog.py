"""Shared builders for the bench/production JAX programs.

``bench.py`` (repo root) and ``python -m factorized_tpu warmup`` must
compile BYTE-IDENTICAL programs: the warmup command's whole point is
populating the persistent XLA compile cache (utils/compilation_cache)
with exactly the executables a later process-cold bench.py / CLI run
will ask for. Keeping one builder here is what guarantees the cache
keys match.

The pinned shapes mirror the reference MOSI workload the bench measures
(``mfm_mosi.py:1227-1288``: batch 32, t=20, best-acc dims; NB=39 full
batches = 1248 shuffled train segments).
"""

from __future__ import annotations

import numpy as np

BATCH = 32
T = 20
NB = 39  # MOSI: 1248 shuffled train samples / batch 32
E = 20   # bench sweet spot (docs/performance.md E sweep)


def build_cfg():
    from factorized_tpu.config import best_acc_mosi_config

    return best_acc_mosi_config()


def build_train_state(cfg, seed: int = 123):
    """(program, params, opt_state) for the flagship MFM train program."""
    import jax

    from factorized_tpu.models import get_model
    from factorized_tpu.train import TrainProgram, make_optimizer

    init, apply_fn = get_model("mfm")
    params = init(jax.random.PRNGKey(seed), cfg)
    opt = make_optimizer("adam", 1e-3)
    opt_state = opt.init(params)
    program = TrainProgram(apply_fn, cfg, "joint", opt)
    return program, params, opt_state


def epoch_inputs(cfg, nb: int = NB, batch: int = BATCH, t: int = T,
                 seed: int = 0):
    """Device-resident (Xb, yb) epoch tensors at the pinned shapes."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    Xb = jnp.asarray(rng.normal(size=(nb, t, batch, cfg.d_total)),
                     jnp.float32)
    yb = jnp.asarray(rng.normal(size=(nb, batch)), jnp.float32)
    return Xb, yb


# -- compute-bound "scale" config ------------------------------------
# MOSEI-like input dims (glove 300 / covarep 74 / facet 35), hidden
# dims scaled until the epoch program is MXU-dominated rather than
# launch-latency-bound (candidate sweep: scripts/scale_mfu_probe.py;
# chosen = best MFU on the v5e). Dropout 0: the big-data regime choice
# — no mask PRNG or mask traffic in the hot loop.
SCALE_NB = 4   # batches per epoch in the scale bench (keeps HBM modest)
SCALE_E = 3    # epochs per chunk program


def scale_cfg():
    from factorized_tpu.config import best_acc_mosi_config

    return best_acc_mosi_config(
        input_dims=[300, 74, 35], batchsize=2048,
        h_dims=[512, 256, 256], zy_size=512, zl_size=512, za_size=256,
        zv_size=256, fy_size=512, fl_size=512, fa_size=256, fv_size=256,
        memsize=512, att1_shape=1024, att2_shape=1024, gamma1_shape=1024,
        gamma2_shape=1024,
        zy_to_fy_dropout=0.0, zl_to_fl_dropout=0.0, za_to_fa_dropout=0.0,
        zv_to_fv_dropout=0.0, fy_to_y_dropout=0.0, att1_drop=0.0,
        att2_drop=0.0, gamma1_drop=0.0, gamma2_drop=0.0, out_drop=0.0)


def active_paths(cfg):
    """Which compute path runs in TRAIN mode at this config. The Pallas
    mega-kernels gate on a VMEM-fit ledger (encode_fits/decoder_fits),
    and the block-diag fusion gates on step compute (models/mfm.py::
    fused_active) — attest which path is ACTIVE, never assume
    (CLAUDE.md rule)."""
    from factorized_tpu.models.mfm import fused_active
    from factorized_tpu.ops import pallas_lstm, pallas_mfn

    if not fused_active(cfg):
        # modular per-module path: separate scans, no block-diag
        # assembly, no Pallas mega-kernels (those live in the fused path)
        return {"fused_blockdiag": False, "encode_pallas": False,
                "decoder_pallas": False}

    t, n = cfg.seqlength, cfg.batchsize
    h_all = cfg.zl_size + cfg.za_size + cfg.zv_size + sum(cfg.h_dims)
    att_in = 2 * sum(cfg.h_dims)
    widths = [att_in * cfg.att1_shape, att_in * cfg.att2_shape,
              (att_in + cfg.memsize) * (cfg.gamma1_shape
                                        + cfg.gamma2_shape)]
    sum_sites = (cfg.att1_shape + cfg.att2_shape + cfg.gamma1_shape
                 + cfg.gamma2_shape)
    drops = (cfg.att1_drop, cfg.att2_drop, cfg.gamma1_drop,
             cfg.gamma2_drop)
    mask_words = t * n * sum_sites if any(d > 0 for d in drops) else 0
    enc = pallas_mfn.encode_fits(t, n, h_all, cfg.memsize, att_in,
                                 widths, mask_words)
    dec_h = cfg.fy_size + max(cfg.fl_size, cfg.fa_size, cfg.fv_size)
    dec = pallas_lstm.decoder_fits(t, n, dec_h)
    return {"fused_blockdiag": True, "encode_pallas": bool(enc),
            "decoder_pallas": bool(dec)}


def make_chunk(program, e: int = E):
    """The bench's E-epoch chunk closure (unjitted): the pure-train
    analogue of ``trainers._loop_chunked``'s per-chunk program."""
    import jax

    epoch_raw = program._raw[0]

    def chunk(params, opt_state, Xb, yb, key, lr):
        def body(carry, _):
            params, opt_state, key = carry
            key, ek = jax.random.split(key)
            params, opt_state, tr = epoch_raw(params, opt_state, Xb, yb,
                                              ek, lr)
            return (params, opt_state, key), tr

        (params, opt_state, key), trs = jax.lax.scan(
            body, (params, opt_state, key), None, length=e)
        return params, opt_state, trs

    return chunk
