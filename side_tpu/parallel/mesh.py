"""SPMD data parallelism over a device mesh.

TPU-native replacement for the reference's chunked torch DataParallel
(/root/reference/src/lib/models/data_parallel.py:44-128 and
scatter_gather.py): the batch is sharded over a 1-D `jax.sharding.Mesh`
axis "data", parameters are replicated, and XLA inserts the gradient
all-reduce (`psum`) over ICI during `jit` partitioning — no scatter/gather
machinery, no uneven master-GPU chunking (TPU shards are uniform).

Multi-host: `init_distributed(cfg)` (wired behind `--distributed` in
tools/train.py) calls `jax.distributed.initialize` so `jax.devices()` spans
all hosts; `make_mesh` then builds the global mesh and `shard_batch` turns
each host's local batch shard into one global array via
`jax.make_array_from_process_local_data` — the same training step code runs
unchanged, with gradient all-reduce over ICI within a slice and DCN across
slices.  Exercised by tests/test_multihost.py on a 2-process CPU cluster.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: str = "", num_processes: int = -1,
                     process_id: int = -1) -> None:
    """Join a multi-host JAX cluster (no-op defaults: single process).

    Must run before the first backend use.  With no arguments JAX
    auto-detects the cluster environment (TPU pod metadata / env vars);
    explicit values support manual CPU/GPU clusters."""
    kw = {}
    if coordinator_address:
        kw["coordinator_address"] = coordinator_address
    if num_processes > 0:
        kw["num_processes"] = num_processes
    if process_id >= 0:
        kw["process_id"] = process_id
    jax.distributed.initialize(**kw)


def make_mesh(num_devices: int = 0, devices=None) -> Mesh:
    """A 1-D data-parallel mesh over the first `num_devices` devices
    (0 = all)."""
    if devices is None:
        devices = jax.devices()
    if num_devices and num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    """Shard a host batch with the leading axis split over "data".

    Single-process: a plain sharded device_put.  Multi-process: each host
    holds only its local examples; `make_array_from_process_local_data`
    assembles the global array (local batch x process_count total)."""
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(sh, np.asarray(v))
                for k, v in batch.items() if k != "meta"}
    return {k: jax.device_put(v, sh) for k, v in batch.items()
            if k != "meta"}


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sh = replicated(mesh)
    return jax.device_put(tree, sh)
