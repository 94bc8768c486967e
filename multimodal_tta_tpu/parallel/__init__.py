from .mesh import (  # noqa: F401
    DATA_AXIS,
    SPACE_AXIS,
    batch_sharding,
    make_mesh,
    mesh_from_config,
    pad_batch_to_multiple,
    replicated,
    select_devices,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "SPACE_AXIS",
    "batch_sharding",
    "make_mesh",
    "mesh_from_config",
    "pad_batch_to_multiple",
    "replicated",
    "select_devices",
    "shard_batch",
]
