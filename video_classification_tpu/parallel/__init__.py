from .mesh import (
    make_mesh,
    data_sharding,
    replicated,
    shard_batch,
    replicate,
    pad_batch_for_mesh,
    pad_to_multiple,
    visible_device_count,
)
from .multihost import (
    assemble_fake_multihost,
    global_batch_from_local,
    host_batch_indices,
    initialize_distributed,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "shard_batch",
    "replicate",
    "pad_batch_for_mesh",
    "pad_to_multiple",
    "visible_device_count",
    "assemble_fake_multihost",
    "global_batch_from_local",
    "host_batch_indices",
    "initialize_distributed",
]
