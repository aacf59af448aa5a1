from tensornetworkforml_tpu.utils.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    save_boundary_checkpoint,
    load_boundary_checkpoint,
    save_training_state,
    load_training_state,
    load_reference_pickle,
    mps_from_reference_pickle,
    mps_from_reference_net,
    save_reference_pickle,
)
from tensornetworkforml_tpu.utils.profiling import (
    Timer,
    device_trace,
    profile_model,
)

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "save_boundary_checkpoint",
    "load_boundary_checkpoint",
    "save_training_state",
    "load_training_state",
    "load_reference_pickle",
    "mps_from_reference_pickle",
    "mps_from_reference_net",
    "save_reference_pickle",
    "Timer",
    "device_trace",
    "profile_model",
]
