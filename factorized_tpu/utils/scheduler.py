"""Host-side LR schedulers.

``ReduceLROnPlateau`` reproduces ``torch.optim.lr_scheduler.
ReduceLROnPlateau(optimizer, 'min')`` with torch defaults
(factor=0.1, patience=10, rel threshold=1e-4, cooldown=0) as used by
every reference trainer (``mfm_mosi.py:253``). The LR lives OUTSIDE the
jitted epoch program — it is passed to the epoch as a traced scalar
argument (``train.py`` scales updates by lr inside the step), so
changing it never triggers recompilation. Do NOT reintroduce
``optax.inject_hyperparams`` for this: measured 4x runtime regression
(see train.py make_optimizer notes).
"""

from __future__ import annotations


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
        if self.mode == "min":
            return current < self.best * (1.0 - self.threshold)
        return current > self.best * (1.0 + self.threshold)

    def step(self, metric: float) -> float:
        """Feed this epoch's metric; returns the (possibly reduced) lr."""
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        if self.num_bad_epochs > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
        return self.lr
