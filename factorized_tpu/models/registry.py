"""Model registry: string dispatch on ``cfg.model_type``, replacing the
reference's inline if-chains (``mfm_mosi.py:398-401``, ``651-658``,
``1358-1369``).
"""

from __future__ import annotations

from factorized_tpu.models import ablations, baselines, mfm

# name -> (init, apply). Apply signatures:
#   MFM family / ablations: (decoded, reg_loss, missing_loss)
#   missing:                (decoded, nol, noa, nov, mmd, missing_loss)
#   s2s:                    (nol, noa, nov, mmd)
#   bm:                     (y_nol, y_noa, y_nov, mmd)
MODELS = {
    "mfm": (mfm.mfm_init, mfm.mfm_apply),
    "kl": (mfm.mfm_kl_init, mfm.mfm_kl_apply),
    "kl_ef": (mfm.mfm_kl_ef_init, mfm.mfm_kl_ef_apply),
    "missing": (mfm.mfm_missing_init, mfm.mfm_missing_apply),
    "m_a": (ablations.m_a_init, ablations.m_a_apply),
    "m_b": (ablations.m_b_init, ablations.m_b_apply),
    "m_c": (ablations.m_c_init, ablations.m_c_apply),
    "m_d": (ablations.m_d_init, ablations.m_d_apply),
    "s2s": (baselines.seq2seq_init, baselines.seq2seq_apply),
    "bm": (baselines.basic_missing_init, baselines.basic_missing_apply),
    "mfn": (baselines.mfn_predictor_init, baselines.mfn_predictor_apply),
}


def get_model(name: str):
    try:
        return MODELS[name]
    except KeyError:
        raise ValueError(
            f"unknown model type {name!r}; known: {sorted(MODELS)}"
        ) from None
