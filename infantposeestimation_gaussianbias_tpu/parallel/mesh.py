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
    """Multi-host init. Call before any other jax use on pods.

    With all-None arguments jax.distributed.initialize() auto-detects the
    topology on TPU pods; explicit (coordinator, num_processes, process_id)
    are for other launchers."""
    if coordinator is None and num_processes is None:
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def maybe_initialize_multihost(cfg) -> None:
    """Config-driven multi-host init (the cli/train entry hook).

    Launch recipe (one process per TPU-VM host, same command everywhere):
        python -m infantposeestimation_gaussianbias_tpu.cli.train \
            --set parallel.multihost=true ...
    On TPU pods nothing else is needed; elsewhere also set
    parallel.coordinator=host:port parallel.num_processes=N
    parallel.process_id=$RANK."""
    p = cfg.parallel
    if getattr(p, "multihost", False):
        initialize_multihost(p.coordinator, p.num_processes, p.process_id)


def process_shard(records: Sequence, process_index: Optional[int] = None,
                  process_count: Optional[int] = None,
                  equalize: str = "truncate") -> list:
    """Per-host slice of the record list: records[pi::pc] (identity on a
    single host).

    Because every jit'd step over a global mesh is a collective, all hosts
    MUST iterate the same number of batches; shards are therefore
    equalized: 'truncate' drops the ragged tail (training — it reappears
    next epoch under shuffling), 'pad' repeats the shard's last record
    flagged `_pad: True` so the loader can mask it out (validation — no
    sample may be dropped, none may be double-counted)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    recs = list(records)[pi::pc]
    if pc == 1:
        return recs
    n = len(records)
    if equalize == "truncate":
        return recs[: n // pc]
    if equalize == "pad":
        target = -(-n // pc)
        while len(recs) < target:
            pad = dict(recs[-1])
            pad["_pad"] = True
            recs.append(pad)
        return recs
    raise ValueError(f"Unknown equalize mode {equalize!r}")


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
    """Place a host pytree of arrays with batch-axis sharding.

    Single host: a plain device_put of the full array.  Multi-host: each
    process contributes its LOCAL rows (1/process_count of the global
    batch, from its process_shard'd loader) and the result is a global
    jax.Array assembled across hosts."""
    sh = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sh, np.asarray(x)), batch)


def host_local_rows(x) -> np.ndarray:
    """Rows of a batch-sharded device array owned by this process, in
    ascending global-row order (the full array on a single host)."""
    if jax.process_count() == 1:
        return np.asarray(x)
    shards = sorted(x.addressable_shards,
                    key=lambda s: (s.index[0].start or 0))
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def allgather_host_values(tree):
    """All-gather a pytree of per-process numpy arrays; returns the pytree
    with each leaf concatenated over processes (identity on one host)."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(tree)
    return jax.tree_util.tree_map(
        lambda g: np.concatenate(list(np.asarray(g)), axis=0), gathered)


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
