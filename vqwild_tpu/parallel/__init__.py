from vqwild_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    pad_to_multiple,
    replicated_sharding,
    shard_batch_arrays,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "pad_to_multiple",
    "replicated_sharding",
    "shard_batch_arrays",
]
