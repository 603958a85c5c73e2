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

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "shard_batch",
    "replicate",
    "pad_batch_for_mesh",
    "pad_to_multiple",
    "visible_device_count",
]
