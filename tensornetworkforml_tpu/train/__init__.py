from tensornetworkforml_tpu.train.sweep import (
    SweepConfig,
    sweep_once,
    train_batch,
    two_site_update,
)
from tensornetworkforml_tpu.train.epoch import fused_epoch
from tensornetworkforml_tpu.train.factored_step import (
    two_site_update_factored,
)
from tensornetworkforml_tpu.train.trainer import (
    Trainer,
    evaluate_accuracy,
    train_model,
)
from tensornetworkforml_tpu.train.autodiff import (
    AutodiffConfig,
    AutodiffTrainer,
    BoundaryAutodiffTrainer,
)
from tensornetworkforml_tpu.train.onesite import (
    OneSiteConfig,
    onesite_sweep,
    train_boundary_model,
)
from tensornetworkforml_tpu.train.brickwall import (
    BrickConfig,
    brick_sweep,
    train_brickwall,
)

__all__ = [
    "SweepConfig",
    "sweep_once",
    "train_batch",
    "two_site_update",
    "fused_epoch",
    "two_site_update_factored",
    "Trainer",
    "evaluate_accuracy",
    "train_model",
    "AutodiffConfig",
    "AutodiffTrainer",
    "BoundaryAutodiffTrainer",
    "OneSiteConfig",
    "onesite_sweep",
    "train_boundary_model",
    "BrickConfig",
    "brick_sweep",
    "train_brickwall",
]
