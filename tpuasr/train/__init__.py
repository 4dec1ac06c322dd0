"""Training loops (reference: batch_train.py + per-model train.py, SURVEY.md
sections 2.1/3.1): jitted train step, mesh data-parallelism, checkpointing
with --continue-from semantics."""

from tpuasr.train.loop import TrainConfig, Trainer, TrainState

__all__ = ["TrainConfig", "Trainer", "TrainState"]
