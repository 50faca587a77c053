"""Tensor-parallel sharding rules for the scaled configs.

The base model (~30-40M params) trains replicated + data-parallel
(SURVEY.md section 2.2); for scaled configs (e.g. the 2x-deep variant) the
'model' mesh axis shards the megatron-style pairs:

  attention qkv/q/kv projections   kernel [in, out]  -> shard out (head dim)
  attention output projection      kernel [in, out]  -> shard in
  FFN input_layer                  kernel [in, 4H]   -> shard out
  FFN output_layer                 kernel [4H, out]  -> shard in

Everything else (embeddings, norms, prenet/postnet/heads) stays replicated;
optimizer moments follow their parameters.  XLA inserts the all-reduces after
the row-parallel projections.  Column sharding of the fused QKV kernel is
valid because the kernel splits as [q|k|v] along the output dim and each part
splits evenly over heads (sizes are multiples of head count, which the
model-axis size must divide).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COL_PARALLEL = ("qkv_transform", "q_transform", "kv_transform",
                 "input_layer")           # shard kernel dim 1 (output)
_ROW_PARALLEL = ("output_transform", "output_layer")  # shard kernel dim 0


def param_pspec(path_keys: tuple) -> P:
    """PartitionSpec for one parameter, from its dict-key path."""
    if len(path_keys) >= 2 and path_keys[-1] == "kernel":
        owner = path_keys[-2]
        if owner in _COL_PARALLEL:
            return P(None, "model")
        if owner in _ROW_PARALLEL:
            return P("model", None)
    return P()


def state_shardings(state: Any, mesh: Mesh, tensor_parallel: bool = False):
    """NamedSharding tree matching a TrainState.

    Replicated throughout unless tensor_parallel and the mesh has a non-trivial
    'model' axis; then kernels (and their optimizer moments, whose tree paths
    mirror the params) shard per param_pspec, falling back to replication for
    any dim the axis does not divide."""
    repl = NamedSharding(mesh, P())
    model_size = dict(mesh.shape).get("model", 1)
    if not tensor_parallel or model_size == 1:
        return jax.tree_util.tree_map(lambda _: repl, state)

    def leaf_sharding(path, leaf):
        keys = tuple(k.key for k in path
                     if isinstance(k, jax.tree_util.DictKey))
        spec = param_pspec(keys)
        for dim, axis in enumerate(spec):
            if axis == "model" and (leaf.ndim <= dim or
                                    leaf.shape[dim] % model_size != 0):
                return repl
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf_sharding, state)
