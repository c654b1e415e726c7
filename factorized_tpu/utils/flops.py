"""Analytic GEMM-FLOPs accounting for the training programs.

Why this exists: XLA's ``Compiled.cost_analysis()`` does NOT multiply a
``while``-loop body's FLOPs by its trip count, so every scan-heavy
program here (whole-epoch scans of per-timestep LSTM/MFN steps) is
undercounted by orders of magnitude — two r5 probe runs of the same
chunk program at different (NB, E) returned the *same* "flops" figure.
The MFU numbers the roofline needs must instead come from a static
traversal of the jaxpr, where ``lax.scan`` carries its trip count as
the ``length`` parameter.

``count_gemm_flops`` walks a ClosedJaxpr and sums ``2*M*N*K`` (times
batch dims, times scan lengths) over every ``dot_general``.  Only
matmul FLOPs are counted — the MFU convention (elementwise work is
neither MXU work nor, at these shapes, material).

``model_train_flops_per_step`` traces the REAL train step (fwd + bwd +
Adam) for a model/config on the **modular** path (``models.mfm.FUSED``
forced off) so block-diagonal padding waste is excluded: the result is
*model* FLOPs — useful math the reference's own layers
(``mfm_model.py:469-555``) would do — which is the honest MFU
numerator. ``fused=True`` keeps the production fused path instead,
giving *executed* GEMM FLOPs (incl. block-diag zero-padding the MXU
still multiplies); the ratio of the two is the fusion's FLOP-waste
factor, reported by ``scripts/scale_mfu_probe.py``.
"""

from __future__ import annotations

import math

# primitives that wrap an inner jaxpr in params["jaxpr"] / branches
_CALL_JAXPR_PARAMS = ("jaxpr", "call_jaxpr", "fun_jaxpr")


def _dot_general_flops(eqn) -> float:
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    batch = math.prod(lhs.shape[d] for d in lb)
    m = math.prod(s for d, s in enumerate(lhs.shape)
                  if d not in lc and d not in lb)
    n = math.prod(s for d, s in enumerate(rhs.shape)
                  if d not in rc and d not in rb)
    k = math.prod(lhs.shape[d] for d in lc)
    return 2.0 * batch * m * n * k


def _conv_flops(eqn) -> float:
    # 2 * output_elements * (input_channels/groups) * kernel_spatial
    out = eqn.outvars[0].aval
    rhs = eqn.invars[1].aval  # kernel: spatial... but layout varies;
    groups = eqn.params.get("feature_group_count", 1)
    kernel_elems = math.prod(rhs.shape)  # includes in_ch*out_ch*spatial
    out_spatial_batch = math.prod(out.shape) / max(out.shape[-1], 1)
    # kernel_elems / out_ch = in_ch*spatial per output channel
    return 2.0 * out_spatial_batch * kernel_elems / max(groups, 1)


def count_gemm_flops(jaxpr) -> float:
    """Sum matmul FLOPs over a (Closed)Jaxpr, statically.

    scan multiplies by ``length``; cond takes the max branch; while
    bodies are counted ONCE (none of the production programs use
    while_loop with data-dependent trips — jit-level while loops only
    appear after lowering, which this never sees).
    """
    if hasattr(jaxpr, "jaxpr"):  # ClosedJaxpr
        jaxpr = jaxpr.jaxpr
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_general_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "scan":
            total += eqn.params["length"] * count_gemm_flops(
                eqn.params["jaxpr"])
        elif name == "while":
            total += count_gemm_flops(eqn.params["body_jaxpr"])
        elif name == "cond":
            total += max((count_gemm_flops(b)
                          for b in eqn.params["branches"]), default=0.0)
        else:
            for p in _CALL_JAXPR_PARAMS:
                inner = eqn.params.get(p) if eqn.params else None
                if inner is not None and (hasattr(inner, "eqns")
                                          or hasattr(inner, "jaxpr")):
                    total += count_gemm_flops(inner)
                    break
    return total


def _trace_step_flops(cfg, model: str, composition: str) -> float:
    import jax
    import jax.numpy as jnp

    from factorized_tpu.models import get_model
    from factorized_tpu.train import TrainProgram, make_optimizer

    init, apply_fn = get_model(model)
    params = jax.eval_shape(lambda k: init(k, cfg), jax.random.PRNGKey(0))
    opt = make_optimizer("adam", 1e-3)
    opt_state = jax.eval_shape(opt.init, params)
    program = TrainProgram(apply_fn, cfg, composition, opt)
    step = program._raw[1]
    x = jax.ShapeDtypeStruct((cfg.seqlength, cfg.batchsize, cfg.d_total),
                             jnp.float32)
    y = jax.ShapeDtypeStruct((cfg.batchsize,), jnp.float32)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    lr = jax.ShapeDtypeStruct((), jnp.float32)
    jaxpr = jax.make_jaxpr(step)(params, opt_state, x, y, key, lr)
    return count_gemm_flops(jaxpr)


def model_train_flops_per_step(cfg, model: str = "mfm",
                               composition: str = "joint",
                               fused: bool = False) -> float:
    """Matmul FLOPs of ONE train step (fwd + bwd + update) at ``cfg``.

    fused=False (default): modular path — *model* FLOPs, the MFU
    numerator. fused=True: the production block-diag path — *executed*
    GEMM FLOPs (the Pallas kernels compute the same per-block math as
    the fused XLA scan, so this figure covers both).
    """
    from factorized_tpu.models import mfm

    prev = mfm.FUSED
    mfm.FUSED = fused
    try:
        return _trace_step_flops(cfg, model, composition)
    finally:
        mfm.FUSED = prev
