from tensornetworkforml_tpu.utils.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    load_reference_pickle,
    mps_from_reference_pickle,
    mps_from_reference_net,
)

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "load_reference_pickle",
    "mps_from_reference_pickle",
    "mps_from_reference_net",
]
