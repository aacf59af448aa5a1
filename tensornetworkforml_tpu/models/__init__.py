from tensornetworkforml_tpu.models.mps import (
    MPS,
    mps_init,
    mps_forward,
    apply_act_fn,
    loss_derivative,
    accuracy_from_scores,
)
from tensornetworkforml_tpu.models.network import Network

__all__ = [
    "MPS",
    "mps_init",
    "mps_forward",
    "apply_act_fn",
    "loss_derivative",
    "accuracy_from_scores",
    "Network",
]
