"""Parallelism: device meshes, shardings, data-parallel training."""
from .mesh import (
    DATA_AXIS,
    batch_sharded,
    make_mesh,
    pad_to_multiple,
    replicated,
    shard_batch,
)
