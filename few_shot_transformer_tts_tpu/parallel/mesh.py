"""Device mesh + sharding layout.

The reference scales with NCCL DistributedDataParallel (reference
train.py:34-41,122-127): one process per GPU, implicit gradient allreduce in
backward.  The TPU-native equivalent is a single jitted program over a
``jax.sharding.Mesh``: the batch is sharded over the ``data`` axis, parameters
and optimizer state are replicated (optionally sharded over a ``model`` axis
for scaled configs), and XLA inserts the gradient psum over ICI/DCN.  The data
loader shards metadata per host exactly like the reference's
``[rank::world_size]``.

Multi-host entry: call ``jax.distributed.initialize()`` before ``make_mesh``;
``jax.devices()`` then spans all hosts and each host feeds its local shard via
``shard_batch``.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def host_device_count() -> int:
    return jax.local_device_count()


def make_mesh(data: int = -1, model: int = 1,
              devices: Optional[list] = None) -> Mesh:
    """Build a (data, model) mesh.  data=-1 uses all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, (data, model, n)
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over 'data'."""
    return NamedSharding(mesh, P("data"))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict onto the mesh with the batch axis sharded over
    'data'.  Non-array entries (names, counts) pass through."""
    sharding = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            out[k] = jax.device_put(v, sharding)
        else:
            out[k] = v
    return out


def pad_batch_to_devices(batch: dict, n_devices: int) -> dict:
    """Ensure the batch axis divides the data-parallel degree by appending
    zero-length rows (which drop out of the masked loss)."""
    b = batch["inputs"].shape[0]
    if b % n_devices == 0:
        return batch
    b_pad = ((b + n_devices - 1) // n_devices) * n_devices
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.ndim >= 1 and v.shape[0] == b:
            pad = np.zeros((b_pad - b,) + v.shape[1:], dtype=v.dtype)
            out[k] = np.concatenate([v, pad], axis=0)
        else:
            out[k] = v
    return out
