from .mesh import (
    DATA_AXIS,
    batch_sharding,
    create_mesh,
    global_batch_from_local,
    initialize_multihost,
    replicate,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "batch_sharding",
    "create_mesh",
    "global_batch_from_local",
    "initialize_multihost",
    "replicate",
    "replicated_sharding",
    "shard_batch",
]
