"""Device mesh + sharding rules — the TPU-native distribution layer.

The reference is strictly single-device (SURVEY.md section 2.4: no DDP, no
process groups, /root/reference/train.py:395).  Here distribution is
first-class and GSPMD-style: build a ('data', 'model') Mesh, annotate the
batch as sharded on 'data' and parameters as replicated (or sharded on
'model' for tensor parallelism of the head hidden dims), and let XLA insert
the collectives (gradient psum rides ICI; cross-slice traffic over DCN is
config-only via jax.distributed.initialize).

BatchNorm needs no special handling under this scheme: reductions over the
batch axis of a 'data'-sharded global array are computed globally by XLA —
the data-parallel batch statistics ARE the global statistics.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host init (no-op single-host). Call before create_mesh on pods."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def create_mesh(data_axis: int = 0, model_axis: int = 1,
                devices: Optional[Sequence] = None) -> Mesh:
    """Create a ('data', 'model') mesh.

    data_axis <= 0 means "all remaining devices" (devices // model_axis).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = max(1, model_axis)
    if data_axis <= 0:
        data = n // model
    else:
        data = data_axis
    if data * model != n:
        raise ValueError(
            f"mesh {data}x{model} does not cover {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the 'data' mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a host pytree of arrays with batch-axis sharding."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def param_sharding_rules(path: tuple, value, mesh: Mesh,
                         tensor_parallel: bool = False) -> NamedSharding:
    """Per-parameter sharding: replicated by default; with tensor_parallel,
    the fusion-head hidden convs and MSA qkv/proj kernels shard their output
    features over 'model'.

    The models here are small (<=64M params); TP is a demonstration axis
    (SURVEY.md section 2.4) — rules live in one place so they can widen.
    """
    if not tensor_parallel:
        return replicated(mesh)
    names = "/".join(
        str(getattr(p, "key", getattr(p, "name", p))) for p in path)
    model_size = mesh.shape.get("model", 1)
    is_matmul_kernel = (names.endswith("kernel") and hasattr(value, "ndim")
                        and value.ndim >= 2)
    if (is_matmul_kernel
            and any(t in names for t in
                    ("shared", "qkv", "proj", "mlp", "fc"))
            and value.shape[-1] % model_size == 0):
        spec = [None] * value.ndim
        spec[-1] = "model"
        return NamedSharding(mesh, P(*spec))
    return replicated(mesh)


def shard_params(variables, mesh: Mesh, tensor_parallel: bool = False):
    """Apply param_sharding_rules across a variables pytree."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(variables)
    out = []
    for path, value in flat:
        sh = param_sharding_rules(path, value, mesh, tensor_parallel)
        out.append(jax.device_put(value, sh))
    return jax.tree_util.tree_unflatten(treedef, out)


def sharding_table(tree) -> dict:
    """Map param path -> PartitionSpec for every non-replicated leaf.

    The documentation artifact for tensor parallelism: which kernels are
    actually partitioned (inspectable in tests via addressable_shards)."""
    table = {}
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    for path, value in flat:
        sharding = getattr(value, "sharding", None)
        spec = getattr(sharding, "spec", None)
        if spec and any(axis is not None for axis in spec):
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            table[name] = tuple(spec)
    return table
