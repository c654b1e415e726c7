"""Measure the per-train-step cost of block-diagonal weight assembly +
its gradient scatter (the work fused-parameter-space training would
eliminate).

Chains ITERS fwd+grad evaluations of exactly the packing ops one MFM
train step performs (encode wh block-diag, xproj gate-major repack,
decoder wx/wsum block-diags, output-projection pack) inside one XLA
program, so tunnel RTT amortizes away.

The probe also measures an EMPTY chained loop: the per-iteration
fori_loop dispatch floor must be subtracted or the result is pure
loop latency.

Measured 2026-08-16 on v5e (best-acc config, batch 32, t=20):
raw 0.175 ms/iter MINUS the 0.145 ms/iter empty-loop floor =
~0.03 ms/step true assembly+scatter cost = ~1.8% of the 1.64 ms train
step. CONCLUSION: fused-parameter-space training is NOT worth its
refactor; the sequential-loop dispatch floor dominates, consistent
with every other micro-lever measuring neutral. (If it were ever
revisited: training in packed space is exactly equivalent when
packed-matrix grads are masked to the block structure before the Adam
moment update — Adam is elementwise, masked entries keep zero moments.)
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from factorized_tpu.config import best_acc_mosi_config
from factorized_tpu.models import get_model
from factorized_tpu.ops import fused
from factorized_tpu.utils.compilation_cache import enable
enable()

cfg = best_acc_mosi_config()
init, _ = get_model("mfm")
params = init(jax.random.PRNGKey(0), cfg)
t, n = cfg.seqlength, cfg.batchsize
enc = [params["enc"][f"encoder_{m}"]["lstm"] for m in "lav"]
mfn = [params["mfn_enc"]["mfn"][f"lstm_{m}"] for m in "lav"]
dec = [params["dec"][f"decoder_{m}"] for m in "lav"]
h_enc = [c["wh"].shape[0] for c in enc + mfn]
h_dec = [p["lstm"]["wh"].shape[0] for p in dec]
d_dims = [p["fc1"]["w"].shape[1] for p in dec]
xp_in = [jnp.full((t, n, 4 * h), 0.1, jnp.float32) for h in h_enc]

def assemble(leaves):
    enc_, mfn_, dec_, xp_ = leaves
    cells = enc_ + mfn_
    wh_bd = fused.gate_major_blockdiag([c["wh"] for c in cells], h_enc)
    xp = fused.repack_gate_major(xp_, h_enc)
    dcells = [p["lstm"] for p in dec_]
    wx_bd = fused.gate_major_blockdiag([c["wx"] for c in dcells], h_dec)
    wsum_bd = fused.gate_major_blockdiag(
        [c["wx"] + c["wh"] for c in dcells], h_dec)
    b_cat = fused.gate_major_bias([c["b"] for c in dcells], h_dec)
    w_out = jnp.zeros((sum(h_dec), sum(d_dims)), jnp.float32)
    ro = co = 0
    for p, h, d in zip(dec_, h_dec, d_dims):
        w_out = jax.lax.dynamic_update_slice(w_out, p["fc1"]["w"], (ro, co))
        ro += h; co += d
    s = jnp.float32(0)
    for a in (wh_bd, xp, wx_bd, wsum_bd, b_cat, w_out):
        s = s + (a * 1e-3).sum()
    return s

g = jax.grad(assemble)
ITERS = 200

@jax.jit
def chained(enc_, mfn_, dec_, xp_):
    def body(i, state):
        bump, acc = state
        e0 = dict(enc_[0]); e0["wh"] = e0["wh"] + bump
        grads = g(([e0] + list(enc_[1:]), mfn_, dec_, xp_))
        gs = grads[0][0]["wh"].mean() + grads[3][0].mean()
        return (gs * 1e-30, acc + gs)
    _, acc = jax.lax.fori_loop(0, ITERS, body, (jnp.float32(0), jnp.float32(0)))
    return acc

def empty(leaves):
    enc_, _, _, _ = leaves
    return (enc_[0]["wh"] * 1e-3).sum()


args = (enc, mfn, dec, xp_in)
args = jax.device_put(args)
print("backend:", jax.default_backend())
t0 = time.perf_counter()
float(np.asarray(chained(*args)))
print(f"compile+first: {time.perf_counter()-t0:.1f}s")
best = min(
    (lambda s: (float(np.asarray(chained(*args))), time.perf_counter()-s)[1])(time.perf_counter())
    for _ in range(3)
)
print(f"raw chained loop: {best/ITERS*1000:.4f} ms/iter")

g = jax.grad(empty)

@jax.jit
def floor_loop(enc_, mfn_, dec_, xp_):
    def body(i, state):
        bump, acc = state
        e0 = dict(enc_[0]); e0["wh"] = e0["wh"] + bump
        grads = g(([e0] + list(enc_[1:]), mfn_, dec_, xp_))
        gs = grads[0][0]["wh"].mean()
        return (gs * 1e-30, acc + gs)
    _, acc = jax.lax.fori_loop(0, ITERS, body,
                               (jnp.float32(0), jnp.float32(0)))
    return acc

float(np.asarray(floor_loop(*args)))
floor = min(
    (lambda s: (float(np.asarray(floor_loop(*args))), time.perf_counter()-s)[1])(time.perf_counter())
    for _ in range(3)
)
print(f"empty-loop floor: {floor/ITERS*1000:.4f} ms/iter")
print(f"assembly+scatter per step: {(best-floor)/ITERS*1000:.4f} ms "
      f"(train step is ~1.64 ms)")
