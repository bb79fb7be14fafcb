"""Device mesh and sharding layer."""

from .mesh import (
    allgather_host_values,
    batch_sharding,
    create_mesh,
    host_local_rows,
    initialize_multihost,
    maybe_initialize_multihost,
    param_sharding_rules,
    process_shard,
    replicated,
    shard_batch,
    shard_params,
    sharding_table,
)

__all__ = [
    "allgather_host_values",
    "batch_sharding",
    "create_mesh",
    "host_local_rows",
    "initialize_multihost",
    "maybe_initialize_multihost",
    "param_sharding_rules",
    "process_shard",
    "replicated",
    "shard_batch",
    "shard_params",
    "sharding_table",
]
