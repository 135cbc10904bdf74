"""Device mesh + sharding helpers.

The reference's only parallelism is single-process multi-GPU data parallelism with a
kvstore 'device' gradient reduce (reference core/DataParallelExecutorGroup.py:64-597,
core/module.py:473-518). The TPU-native equivalent: a 1-D ``data`` mesh axis, batch
sharded along it, params replicated, and the gradient all-reduce emitted by XLA over
ICI when jit differentiates the batch-mean loss (SURVEY.md §2.7).

A second (currently size-1) ``model`` axis is plumbed through so tensor-parallel
sharding of the heads can be enabled without API changes.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device_put a host batch pytree with the batch axis sharded on 'data'."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)
