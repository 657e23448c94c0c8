from .mesh import (
    DATA_AXIS,
    batch_sharding,
    create_mesh,
    global_batch_from_local,
    initialize_multihost,
    staged_global_batch_from_local,
    replicate,
    replicated_sharding,
    shard_batch,
)
from .tensor import (
    MODEL_AXIS,
    create_mesh_2d,
    shard_state_tp,
    tp_shardings,
)
from .fsdp import (
    fsdp_shardings,
    shard_state_fsdp,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "create_mesh",
    "create_mesh_2d",
    "fsdp_shardings",
    "global_batch_from_local",
    "initialize_multihost",
    "replicate",
    "replicated_sharding",
    "shard_batch",
    "shard_state_fsdp",
    "shard_state_tp",
    "staged_global_batch_from_local",
    "tp_shardings",
]
