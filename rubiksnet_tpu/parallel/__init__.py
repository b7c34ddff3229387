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
from .temporal import (
    TIME_AXIS,
    halo_exchange_time,
    temporal_attention_shift,
    temporal_rubiks_shift_3d,
    time_shard_clip,
)

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "TIME_AXIS", "batch_sharding", "create_mesh",
    "halo_exchange_time", "initialize_distributed", "param_partition_spec",
    "replicated", "shard_batch", "shard_params", "temporal_attention_shift",
    "temporal_rubiks_shift_3d", "time_shard_clip",
]
