"""Multi-chip scaling via jax.sharding — data parallelism over a device
mesh (the reference is strictly single-GPU; SURVEY.md §2 parallelism
note: DP is the only strategy this workload can exploit — models are
~1M params — TP/PP/EP documented N/A-by-design, with an optional
demonstrative TP axis on the widest projections)."""

from factorized_tpu.parallel.sharding import (  # noqa: F401
    DataParallel,
    init_distributed,
    make_mesh,
)
