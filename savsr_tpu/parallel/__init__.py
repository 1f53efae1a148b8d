from .mesh import (
    get_data_mesh,
    replicate,
    shard_batch,
    shard_or_replicate_batch,
)

__all__ = ["get_data_mesh", "replicate", "shard_batch", "shard_or_replicate_batch"]
