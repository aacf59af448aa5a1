from tensornetworkforml_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    replicate_params,
    replicated,
    shard_batch,
    site_sharding,
)
from tensornetworkforml_tpu.parallel.dp import (
    ShardedTrainer,
    make_sharded_train_step,
)
from tensornetworkforml_tpu.parallel.dist_split import (
    distributed_cholqr_split,
    distributed_polar_split,
    shard_bmat_columns,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "make_mesh",
    "replicate_params",
    "replicated",
    "shard_batch",
    "site_sharding",
    "ShardedTrainer",
    "make_sharded_train_step",
    "distributed_cholqr_split",
    "distributed_polar_split",
    "shard_bmat_columns",
]
