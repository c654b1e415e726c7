"""factorized_tpu — a TPU-native framework for factorized multimodal
representation learning (MFM, ICLR 2019).

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``pliang279/factorized``: factorized multimodal sequence models (shared
discriminative factor ``zy`` + per-modality generative factors
``zl/za/zv``), MMD/KL prior matching, missing-modality machinery,
ablations, and the four dataset experiment surfaces (MOSI, MOUD,
YouTube, MMMO) — redesigned TPU-first:

- LSTM recurrences are ``jax.lax.scan`` programs with all input
  projections hoisted into single large MXU matmuls (optionally a fused
  Pallas cell), instead of python-level per-timestep cell calls
  (reference: ``mfm_model.py:47-62``).
- Training steps (forward + losses + grads + optimizer) fuse into one
  XLA program; whole epochs run as a scan over minibatches on-device.
- Data parallelism is first-class via ``jax.sharding.Mesh`` + ``jit``
  with batch-axis sharding (the reference has no distributed story).
- Randomness (MMD resampling, dropout) uses explicit, reproducible
  PRNG-key threading (reference: global torch seed, ``mfm_model.py:26``).
"""

__version__ = "0.1.0"
