"""Reference-checkpoint converter: torch state dicts -> flax variable trees.

Maps the reference's parameter names/layouts (reference transformer/tacotron.py
state dict, e.g. ``encoder.encoder.self_attentions.0.qkv_transform.weight``)
onto this framework's variable tree (``params/encoder/encoder/
self_attentions_0/qkv_transform/kernel``), handling the layout differences:

  torch Linear weight [out, in]      -> flax Dense kernel [in, out]  (transpose)
  torch Embedding weight             -> flax Embed 'embedding'       (as-is)
  torch Conv1d weight [out, in, k]   -> flax Conv kernel [k, in, out]
  torch LayerNorm/BatchNorm weight   -> 'scale'
  BatchNorm running_mean/var         -> batch_stats collection

Needed for loading published reference checkpoints into the TPU model
(SURVEY.md section 2.1 Checkpointing row) and for oracle parity tests.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

try:
    from flax.core import freeze
    from flax.traverse_util import unflatten_dict
except ImportError:  # pragma: no cover
    freeze = None


_NORM_LAYERS = ("attn_layer_norms", "ffn_layer_norms", "encdec_layer_norms",
                "output_layer_norm", "batchnorm_layers")
_EMBED_LAYERS = ("embed", "speaker_embed")


def _to_numpy(t):
    if isinstance(t, np.ndarray):
        return t
    try:  # torch tensor
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def convert_torch_state_dict(state_dict: Dict[str, "np.ndarray"]):
    """Convert a reference model state dict to {'params': ..., 'batch_stats': ...}.

    Accepts torch tensors or numpy arrays; 'module.' (DataParallel/DDP)
    prefixes are stripped, matching reference utils/checkpoint.py:21-26.
    """
    params = {}
    batch_stats = {}
    for name, tensor in state_dict.items():
        arr = _to_numpy(tensor)
        if name.startswith("module."):
            name = name[len("module."):]
        parts = name.split(".")
        # merge list indices: self_attentions.0.x -> self_attentions_0.x
        merged = []
        for p in parts:
            if p.isdigit() and merged:
                merged[-1] = merged[-1] + "_" + p
            else:
                merged.append(p)
        leaf = merged[-1]
        owner = merged[-2] if len(merged) >= 2 else ""
        owner_base = owner.rsplit("_", 1)[0] if owner and owner[-1].isdigit() \
            else owner
        path = merged[:-1]

        if leaf == "num_batches_tracked":
            continue
        if leaf in ("running_mean", "running_var"):
            key = "mean" if leaf == "running_mean" else "var"
            batch_stats[tuple(path) + (key,)] = arr
            continue
        if leaf == "pe_scale":
            # torch stores a 0-d tensor; flax param is a 0-d array
            params[tuple(merged)] = np.asarray(arr).reshape(())
            continue
        if leaf == "weight":
            if owner_base in _NORM_LAYERS:
                params[tuple(path) + ("scale",)] = arr
            elif owner_base in _EMBED_LAYERS:
                params[tuple(path) + ("embedding",)] = arr
            elif owner_base == "conv_layers":
                params[tuple(path) + ("kernel",)] = arr.transpose(2, 1, 0)
            else:  # Linear
                params[tuple(path) + ("kernel",)] = arr.T
            continue
        if leaf == "bias":
            params[tuple(path) + ("bias",)] = arr
            continue
        raise ValueError("Unrecognized reference parameter: %s" % name)

    out = {"params": unflatten_dict(params)}
    if batch_stats:
        out["batch_stats"] = unflatten_dict(batch_stats)
    return out


def load_reference_checkpoint(path: str):
    """Load a reference ``model.ckpt-<step>`` file (torch.save dict with keys
    model/optim/sched/step — reference utils/checkpoint.py:19-34) and convert
    the model weights.  Returns (variables, step)."""
    import torch
    state = torch.load(path, map_location="cpu", weights_only=False)
    model_sd = state.get("model", state)
    variables = convert_torch_state_dict(model_sd)
    return variables, state.get("step", None)
