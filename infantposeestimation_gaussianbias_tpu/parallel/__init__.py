"""Device mesh and sharding layer."""

from .mesh import (
    batch_sharding,
    create_mesh,
    initialize_multihost,
    param_sharding_rules,
    replicated,
    shard_batch,
    shard_params,
    sharding_table,
)

__all__ = [
    "batch_sharding",
    "create_mesh",
    "initialize_multihost",
    "param_sharding_rules",
    "replicated",
    "shard_batch",
    "shard_params",
    "sharding_table",
]
