from tensornetworkforml_tpu.train.sweep import (
    SweepConfig,
    sweep_once,
    train_batch,
)
from tensornetworkforml_tpu.train.trainer import Trainer, train_model

__all__ = ["SweepConfig", "sweep_once", "train_batch", "Trainer", "train_model"]
