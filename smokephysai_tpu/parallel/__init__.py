from .mesh import make_mesh
from .sharding import (
    batch_sharding,
    param_sharding_specs,
    shard_batch,
    shard_params,
)

__all__ = [
    "make_mesh",
    "param_sharding_specs",
    "batch_sharding",
    "shard_params",
    "shard_batch",
]
