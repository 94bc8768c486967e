from .distributed import is_primary_host, maybe_initialize_distributed  # noqa: F401
from .mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    SPACE_AXIS,
    STAGE_AXIS,
    batch_sharding,
    make_mesh,
    mesh_from_config,
    pad_batch_to_multiple,
    replicated,
    select_devices,
    shard_batch,
)
from .pipeline import (  # noqa: F401
    make_pipeline_train_step,
    pipeline_apply,
    pipeline_value_and_grad,
    stack_layer_params,
    vit_forward_pipelined,
)

__all__ = [
    "is_primary_host",
    "maybe_initialize_distributed",
    "DATA_AXIS",
    "MODEL_AXIS",
    "SPACE_AXIS",
    "STAGE_AXIS",
    "pipeline_apply",
    "pipeline_value_and_grad",
    "make_pipeline_train_step",
    "stack_layer_params",
    "vit_forward_pipelined",
    "batch_sharding",
    "make_mesh",
    "mesh_from_config",
    "pad_batch_to_multiple",
    "replicated",
    "select_devices",
    "shard_batch",
]
