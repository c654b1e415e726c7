"""Support subsystems: metrics/scoring, LR scheduling, checkpointing,
structured logging."""
