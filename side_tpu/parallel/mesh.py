"""SPMD data parallelism over a device mesh.

TPU-native replacement for the reference's chunked torch DataParallel
(/root/reference/src/lib/models/data_parallel.py:44-128 and
scatter_gather.py): the batch is sharded over a 1-D `jax.sharding.Mesh`
axis "data", parameters are replicated, and XLA inserts the gradient
all-reduce (`psum`) over ICI during `jit` partitioning — no scatter/gather
machinery, no uneven master-GPU chunking (TPU shards are uniform).

Multi-host extension: initialise `jax.distributed` before calling
`make_mesh`; the same code then spans hosts with DCN between slices.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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
    """Device-put a host batch with the leading axis split over "data"."""
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()
            if k != "meta"}


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sh = replicated(mesh)
    return jax.device_put(tree, sh)
