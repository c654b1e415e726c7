"""LR schedulers: host-side class + on-device vectorized functional form.

``ReduceLROnPlateau`` reproduces ``torch.optim.lr_scheduler.
ReduceLROnPlateau(optimizer, 'min')`` with torch defaults
(factor=0.1, patience=10, rel threshold=1e-4, cooldown=0) as used by
every reference trainer (``mfm_mosi.py:253``). The LR lives OUTSIDE the
jitted epoch program — it is passed to the epoch as a traced scalar
argument (``train.py`` scales updates by lr inside the step), so
changing it never triggers recompilation. Do NOT reintroduce
``optax.inject_hyperparams`` for this: measured 4x runtime regression
(see train.py make_optimizer notes).

``plateau_init``/``plateau_step`` are the SAME schedule as a pure
function over a (K,)-vector state pytree, usable INSIDE jit — the
multilane trainers (``parallel/multiseed.py``, ``parallel/
multiconfig.py``) scan whole epoch chunks on device and step the
scheduler in-program, so the search loop never round-trips the host
per epoch (the round-trip through the TPU tunnel dominated the search
loop; see scripts/evolve_probe.py). Parity with the host class is
asserted in tests/test_multiconfig.py.
"""

from __future__ import annotations


def plateau_init(lrs, mode: str = "min"):
    """Vectorized scheduler state for K lanes: dict of (K,) arrays."""
    import jax.numpy as jnp

    assert mode in ("min", "max")
    lrs = jnp.asarray(lrs, jnp.float32).reshape(-1)
    k = lrs.shape[0]
    best0 = jnp.full((k,), jnp.inf if mode == "min" else -jnp.inf,
                     jnp.float32)
    return {"lr": lrs, "best": best0,
            "bad": jnp.zeros((k,), jnp.int32),
            "cooldown": jnp.zeros((k,), jnp.int32)}


def plateau_step(state, metric, *, mode: str = "min", factor: float = 0.1,
                 patience: int = 10, threshold: float = 1e-4,
                 cooldown: int = 0, min_lr: float = 0.0):
    """One scheduler step for all K lanes; pure, jit-safe.

    Update order mirrors :meth:`ReduceLROnPlateau.step` exactly:
    is-better test against the pre-update best, cooldown decrement
    clears the bad-epoch counter, patience overrun reduces lr and arms
    the cooldown."""
    import jax.numpy as jnp

    metric = jnp.asarray(metric, jnp.float32)
    if mode == "min":
        is_better = metric < state["best"] * (1.0 - threshold)
    else:
        is_better = metric > state["best"] * (1.0 + threshold)
    best = jnp.where(is_better, metric, state["best"])
    bad = jnp.where(is_better, 0, state["bad"] + 1)
    in_cd = state["cooldown"] > 0
    cd = jnp.where(in_cd, state["cooldown"] - 1, state["cooldown"])
    bad = jnp.where(in_cd, 0, bad)
    reduce_ = bad > patience
    lr = jnp.where(reduce_, jnp.maximum(state["lr"] * factor, min_lr),
                   state["lr"])
    cd = jnp.where(reduce_, cooldown, cd)
    bad = jnp.where(reduce_, 0, bad)
    return {"lr": lr, "best": best, "bad": bad, "cooldown": cd}


class ReduceLROnPlateau:
    def __init__(
        self,
        lr: float,
        mode: str = "min",
        factor: float = 0.1,
        patience: int = 10,
        threshold: float = 1e-4,
        cooldown: int = 0,
        min_lr: float = 0.0,
    ):
        assert mode in ("min", "max")
        self.lr = lr
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.cooldown = cooldown
        self.min_lr = min_lr
        self.best = float("inf") if mode == "min" else float("-inf")
        self.num_bad_epochs = 0
        self.cooldown_counter = 0

    def _is_better(self, current: float) -> bool:
        # f32 arithmetic, in plateau_step's exact op order, so the host
        # class and the on-device scheduler stay BITWISE interchangeable
        # (the chunked trainer loop runs plateau_step; the host loop is
        # its A/B fallback — tests/test_chunked_loop.py)
        import numpy as np

        cur = np.float32(current)
        if self.mode == "min":
            return bool(cur < np.float32(self.best)
                        * np.float32(1.0 - self.threshold))
        return bool(cur > np.float32(self.best)
                    * np.float32(1.0 + self.threshold))

    def step(self, metric: float) -> float:
        """Feed this epoch's metric; returns the (possibly reduced) lr."""
        import numpy as np

        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        if self.num_bad_epochs > self.patience:
            # f32 multiply-then-max, matching plateau_step bitwise
            self.lr = float(np.maximum(
                np.float32(self.lr) * np.float32(self.factor),
                np.float32(self.min_lr)))
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
        return self.lr
