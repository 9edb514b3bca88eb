from .mesh import (
    data_sharding,
    make_mesh,
    replicate,
    shard_batch,
)

__all__ = ["make_mesh", "data_sharding", "shard_batch", "replicate"]
