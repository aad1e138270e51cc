from attngan_tpu.parallel.mesh import (
    DATA_AXIS,
    SLICE_AXIS,
    batch_axes,
    batch_sharding,
    make_mesh,
    make_mesh_for_batch,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "SLICE_AXIS",
    "batch_axes",
    "batch_sharding",
    "make_mesh",
    "make_mesh_for_batch",
    "replicate",
    "replicated",
    "shard_batch",
]
