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
``assemble_global_batch``.  Hosts pack batches independently (the reference
shards metadata ``[rank::world_size]``, reference dataloader.py:62-64, and so
do we), which means the per-host padded shapes differ step to step; a tiny
per-step shape allgather agrees on the global lattice shape before each host
pads its shard and the global array is built with
``jax.make_array_from_process_local_data`` — no host ever materializes the
global batch.
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


def _pad_axis(arr: np.ndarray, axis: int, size: int) -> np.ndarray:
    if arr.shape[axis] >= size:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, size - arr.shape[axis])
    return np.pad(arr, widths)


# batch keys with a time axis at dim 1, and which shape slot bounds it
_TIME_AXES = {"inputs": 1, "mel_targets": 2}


def agree_global_shape(batch: dict) -> np.ndarray:
    """Per-step cross-host shape agreement: allgather the local padded shape
    triple (batch, t_in, t_out) and return the elementwise max.

    Hosts pack independently, so each host's lattice shape differs; the max
    over hosts is the global padded shape every shard must meet.  The
    allgather is 3 int32s — negligible next to the step, and it overlaps the
    device step because batches are prefetched.
    """
    from jax.experimental import multihost_utils
    local = np.asarray([
        batch["inputs"].shape[0],
        batch["inputs"].shape[1],
        batch["mel_targets"].shape[1] if "mel_targets" in batch else 0,
    ], np.int32)
    gathered = np.asarray(multihost_utils.process_allgather(local))
    return gathered.max(axis=0)


def assemble_global_batch(batch: dict, mesh: Mesh) -> dict:
    """Build the global (all-host) batch from this process's local batch.

    Single-process: a plain ``device_put`` to the 'data' sharding.
    Multi-process: agree on the global padded shape (``agree_global_shape``),
    zero-pad the local shard to it (padded rows carry zero lengths and drop
    out of every masked loss term), and construct the global array with
    ``jax.make_array_from_process_local_data`` so each host only ever touches
    its own rows.  Replaces the reference's implicit per-rank batching under
    DDP (reference train.py:122-125 + dataloader.py:62-64).
    """
    if jax.process_count() == 1:
        return shard_batch(batch, mesh)

    n_proc = jax.process_count()
    data_size = mesh.shape["data"]
    assert data_size % n_proc == 0, (
        "data mesh axis (%d) must be divisible by process count (%d)"
        % (data_size, n_proc))
    rows_mult = data_size // n_proc

    b_max, t_in, t_out = (int(x) for x in agree_global_shape(batch))
    rows = _round_up(b_max, rows_mult)

    sharding = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if not isinstance(v, np.ndarray):
            out[k] = v
            continue
        local = _pad_axis(v, 0, rows)
        if k in _TIME_AXES:
            local = _pad_axis(local, 1, (t_in, t_out)[_TIME_AXES[k] - 1])
        global_shape = (rows * n_proc,) + local.shape[1:]
        out[k] = jax.make_array_from_process_local_data(
            sharding, np.ascontiguousarray(local), global_shape)
    return out


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


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
