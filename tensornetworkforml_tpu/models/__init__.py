from tensornetworkforml_tpu.models.mps import (
    MPS,
    mps_init,
    mps_forward,
    apply_act_fn,
    loss_derivative,
    accuracy_from_scores,
)
from tensornetworkforml_tpu.models.network import Network
from tensornetworkforml_tpu.models.canonical import (
    canonical_init,
    canonicalize,
    left_canonicalize,
    normalize_label,
    right_canonicalize,
)

__all__ = [
    "canonical_init",
    "canonicalize",
    "left_canonicalize",
    "normalize_label",
    "right_canonicalize",
    "MPS",
    "mps_init",
    "mps_forward",
    "apply_act_fn",
    "loss_derivative",
    "accuracy_from_scores",
    "Network",
]
