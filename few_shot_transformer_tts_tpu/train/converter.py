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

Also imports the reference's **Adam optimizer state** (``state['optim']``,
reference utils/checkpoint.py:28-34): the tier warm-start protocol T1->T2->T3
restores optim + sched along with the model (reference train.py:134-148), and
dropping the moments perturbs the first thousands of warm-started steps.  The
exp_avg/exp_avg_sq moments live in the same layout as their parameters, so
the identical transforms apply; torch's per-parameter step counts collapse to
optax's single ``count`` (they are all equal in the reference: one optimizer
over all parameters, stepped once per global step).

Needed for loading published reference checkpoints into the TPU model
(SURVEY.md section 2.1 Checkpointing row) and for oracle parity tests.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

try:
    from flax.traverse_util import unflatten_dict
except ImportError:  # pragma: no cover
    unflatten_dict = None


_NORM_LAYERS = ("attn_layer_norms", "ffn_layer_norms", "encdec_layer_norms",
                "output_layer_norm", "batchnorm_layers")
_EMBED_LAYERS = ("embed", "speaker_embed")
_BUFFER_LEAVES = ("running_mean", "running_var", "num_batches_tracked")


def _to_numpy(t):
    if isinstance(t, np.ndarray):
        return t
    try:  # torch tensor
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _strip_module(name: str) -> str:
    """Strip DataParallel/DDP prefixes (reference utils/checkpoint.py:21-26)."""
    return name[len("module."):] if name.startswith("module.") else name


def _merge_indices(name: str) -> List[str]:
    """``self_attentions.0.x`` -> ``['self_attentions_0', 'x']``."""
    merged: List[str] = []
    for p in name.split("."):
        if p.isdigit() and merged:
            merged[-1] = merged[-1] + "_" + p
        else:
            merged.append(p)
    return merged


def _classify(name: str):
    """-> (kind, path) for a reference parameter/buffer name.

    kind: 'skip' | 'batch_stat' | 'pe_scale' | 'scale' | 'embedding'
          | 'conv_kernel' | 'kernel' | 'bias'.  path is the flax tree path
    (tuple of str) the converted array lands at.
    """
    merged = _merge_indices(_strip_module(name))
    leaf = merged[-1]
    path = tuple(merged[:-1])
    owner = merged[-2] if len(merged) >= 2 else ""
    owner_base = owner.rsplit("_", 1)[0] if owner and owner[-1].isdigit() \
        else owner

    if leaf == "num_batches_tracked":
        return "skip", ()
    if leaf in ("running_mean", "running_var"):
        key = "mean" if leaf == "running_mean" else "var"
        return "batch_stat", path + (key,)
    if leaf == "pe_scale":
        return "pe_scale", tuple(merged)
    if leaf == "weight":
        if owner_base in _NORM_LAYERS:
            return "scale", path + ("scale",)
        if owner_base in _EMBED_LAYERS:
            return "embedding", path + ("embedding",)
        if owner_base == "conv_layers":
            return "conv_kernel", path + ("kernel",)
        return "kernel", path + ("kernel",)
    if leaf == "bias":
        return "bias", path + ("bias",)
    raise ValueError("Unrecognized reference parameter: %s" % name)


def _transform(kind: str, arr: np.ndarray) -> np.ndarray:
    """Layout-only transform torch -> flax; applies equally to a parameter
    and to its Adam moments (elementwise state shares the param layout)."""
    if kind == "pe_scale":
        return np.asarray(arr).reshape(())
    if kind == "conv_kernel":
        return arr.transpose(2, 1, 0)
    if kind == "kernel":
        return arr.T
    return arr


def convert_torch_state_dict(state_dict: Dict[str, "np.ndarray"]):
    """Convert a reference model state dict to {'params': ..., 'batch_stats': ...}.

    Accepts torch tensors or numpy arrays; 'module.' (DataParallel/DDP)
    prefixes are stripped, matching reference utils/checkpoint.py:21-26.
    """
    params = {}
    batch_stats = {}
    for name, tensor in state_dict.items():
        kind, path = _classify(name)
        if kind == "skip":
            continue
        arr = _transform(kind, _to_numpy(tensor))
        (batch_stats if kind == "batch_stat" else params)[path] = arr
    out = {"params": unflatten_dict(params)}
    if batch_stats:
        out["batch_stats"] = unflatten_dict(batch_stats)
    return out


def _param_names_in_order(model_sd: Dict) -> List[str]:
    """Parameter names in ``model.parameters()`` order.

    torch builds both ``state_dict()`` and ``named_parameters()`` module-major
    with per-module registration order, so filtering the buffers out of the
    state-dict keys reconstructs the parameters() order — which is the order
    ``torch.optim.Adam(m.parameters())`` indexes its per-parameter state by
    (reference train.py:130).
    """
    return [k for k in model_sd
            if k.split(".")[-1] not in _BUFFER_LEAVES]


def convert_optimizer_state(model_sd: Dict, optim_sd: Dict
                            ) -> Tuple[Dict, Dict, int]:
    """Convert a torch Adam state dict to (mu_tree, nu_tree, count).

    ``optim_sd`` is ``torch.optim.Adam.state_dict()``: ``{'state': {idx:
    {'step', 'exp_avg', 'exp_avg_sq'}}, 'param_groups': [...]}`` with ``idx``
    positional over the concatenated param_groups.  Parameters that have no
    state yet (torch Adam initializes lazily at the first step touching them)
    get zero moments, matching optax's init.
    """
    names = _param_names_in_order(model_sd)
    positions = [i for g in optim_sd.get("param_groups", [])
                 for i in g.get("params", [])]
    if len(positions) != len(names):
        raise ValueError(
            "Optimizer state covers %d params but the model has %d"
            % (len(positions), len(names)))
    opt_state = optim_sd.get("state", {})
    mu, nu = {}, {}
    count = 0
    for pos, name in zip(positions, names):
        kind, path = _classify(name)
        if kind in ("skip", "batch_stat"):
            raise ValueError("Non-parameter %s in optimizer order" % name)
        st = opt_state.get(pos)
        shape = _to_numpy(model_sd[name]).shape
        if st is None:
            m = np.zeros(shape, np.float32)
            v = np.zeros(shape, np.float32)
        else:
            m = _to_numpy(st["exp_avg"]).astype(np.float32)
            v = _to_numpy(st["exp_avg_sq"]).astype(np.float32)
            count = max(count, int(_to_numpy(st.get("step", 0)).item()
                                   if hasattr(_to_numpy(st.get("step", 0)),
                                              "item")
                                   else int(st.get("step", 0))))
        mu[path] = _transform(kind, m)
        nu[path] = _transform(kind, v)
    return unflatten_dict(mu), unflatten_dict(nu), count


def import_opt_state(opt_template, mu_tree, nu_tree, step: int):
    """Graft converted Adam moments into an optax state pytree.

    The template comes from ``tx.init(params)`` (make_optimizer:
    ``(ScaleByAdamState, ScaleByScheduleState)``); mu/nu leaves are cast to
    the template's dtypes and every ``count`` is set to ``step`` so the LR
    schedule and bias correction resume where the reference left off
    (reference restores optim + sched together, train.py:134-148).
    """
    import jax
    import jax.numpy as jnp
    import optax

    def cast_like(template_tree, new_tree):
        # host-side numpy casts: jnp.asarray would device_put ~1 GB of
        # moments leaf-by-leaf through the TPU tunnel here; the first jitted
        # step transfers the whole state once instead
        return jax.tree.map(lambda t, n: np.asarray(n, dtype=t.dtype),
                            template_tree, new_tree)

    def fix(s):
        if isinstance(s, optax.ScaleByAdamState):
            return s._replace(count=jnp.asarray(step, s.count.dtype),
                              mu=cast_like(s.mu, mu_tree),
                              nu=cast_like(s.nu, nu_tree))
        if isinstance(s, optax.ScaleByScheduleState):
            return s._replace(count=jnp.asarray(step, s.count.dtype))
        return s

    if isinstance(opt_template, tuple):
        return type(opt_template)(fix(s) for s in opt_template)
    return fix(opt_template)


def load_reference_checkpoint(path: str, tx=None, params_template=None):
    """Load a reference ``model.ckpt-<step>`` file (torch.save dict with keys
    model/optim/sched/step — reference utils/checkpoint.py:19-34) and convert
    the model weights.

    Returns ``(variables, step)``; with ``tx`` (an optax transformation and a
    ``params_template`` pytree to init it over — pass the freshly created
    state's params) returns ``(variables, opt_state, step)`` with the Adam
    moments imported when present, zero-initialized otherwise.
    """
    import torch
    state = torch.load(path, map_location="cpu", weights_only=False)
    model_sd = state.get("model", state)
    model_sd = {(_strip_module(k)): v for k, v in model_sd.items()}
    variables = convert_torch_state_dict(model_sd)
    step = state.get("step", None)
    if step is None and isinstance(state.get("sched"), dict):
        step = state["sched"].get("last_epoch")  # reference checkpoint.py:53-57
    if tx is None:
        return variables, step
    template = tx.init(params_template if params_template is not None
                       else variables["params"])
    if isinstance(state.get("optim"), dict):
        mu, nu, opt_count = convert_optimizer_state(model_sd, state["optim"])
        opt_state = import_opt_state(template, mu, nu,
                                     step if step is not None else opt_count)
    elif isinstance(template, tuple) and len(template) > 0 and \
            hasattr(template[0], "mu"):
        # no optimizer in the file: keep the zero-init moments, but advance
        # the counts so the LR schedule resumes at the checkpoint step
        opt_state = import_opt_state(template, template[0].mu,
                                     template[0].nu, step or 0)
    else:
        opt_state = template
    return variables, opt_state, step


def is_reference_checkpoint(path: str) -> bool:
    """Sniff a torch.save file (zip 'PK' magic, or a legacy pickle protocol
    byte) vs this framework's msgpack checkpoints."""
    with open(path, "rb") as f:
        head = f.read(2)
    return head[:2] == b"PK" or head[:1] == b"\x80"
