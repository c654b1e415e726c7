"""Model zoo: the MFM family (MFM, MFM_KL, MFM_KL_EF, MFM_missing), the
M_A..M_D ablations, and the baselines (seq2seq, basic_missing, EFLSTM,
the standalone MFN predictor, SelfAttention).

Every model is a pure ``init(key, cfg) -> params`` /
``apply(params, x, cfg, *, key, train) -> outputs`` pair. Inputs are
time-major ``(t, n, d_total)`` with modalities concatenated on the
feature axis, exactly like the reference's batch layout
(``mfm_mosi.py:230-232``).
"""

from factorized_tpu.models.registry import get_model, MODELS  # noqa: F401
