from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    create_mesh,
    initialize_distributed,
    param_partition_spec,
    replicated,
    shard_batch,
    shard_params,
)

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "batch_sharding", "create_mesh",
    "initialize_distributed",
    "param_partition_spec", "replicated", "shard_batch", "shard_params",
]
