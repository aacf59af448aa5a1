from tensornetworkforml_tpu.train.sweep import (
    SweepConfig,
    sweep_once,
    train_batch,
    two_site_update,
)
from tensornetworkforml_tpu.train.trainer import Trainer, train_model

__all__ = ["SweepConfig", "sweep_once", "train_batch", "two_site_update", "Trainer", "train_model"]
