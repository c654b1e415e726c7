"""Core compute primitives: linear/MLP layers, LSTM scans, MFN fusion,
MMD/KLD losses. All are pure ``init``/``apply`` function pairs operating
on parameter pytrees (plain dicts) — no module system, no hidden state.
"""

from factorized_tpu.ops.core import (  # noqa: F401
    linear_init,
    linear_apply,
    mlp2_init,
    mlp2_apply,
    dropout,
    uniform_fan_in,
)
from factorized_tpu.ops.lstm import (  # noqa: F401
    lstm_cell_init,
    lstm_step,
    encoder_init,
    encoder_apply,
    decoder_init,
    decoder_apply,
)
from factorized_tpu.ops.mfn import mfn_init, mfn_apply  # noqa: F401
from factorized_tpu.ops.losses import (  # noqa: F401
    compute_kernel,
    loss_mmd,
    loss_kld,
    l1_loss,
    l2_loss,
    cross_entropy_loss,
)
