from .distributed import is_primary_host, maybe_initialize_distributed  # noqa: F401
from .mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
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
    "is_primary_host",
    "maybe_initialize_distributed",
    "DATA_AXIS",
    "MODEL_AXIS",
    "SPACE_AXIS",
    "batch_sharding",
    "make_mesh",
    "mesh_from_config",
    "pad_batch_to_multiple",
    "replicated",
    "select_devices",
    "shard_batch",
]
