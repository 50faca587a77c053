"""Fused Adam update kernel (Pallas TPU).

The reference trains with ``torch.optim.Adam(eps=5e-8)`` under its LR
schedule (reference train.py:130-131).  The optax.adam equivalent lowers to
one XLA fusion per parameter tensor; on a v5e chip those fusions stream
p/g/m/v at ~300 GB/s and cost ~3.7 ms of a 27 ms step over the 41M-param
tree (tools/profile_step.py).  This kernel performs the whole update --
moment decay, bias correction, parameter write -- in a single pass per
tensor with ~1 MB row blocks, and is numerically the same recurrence.

MEASURED RESULT (v5e, flagship bench, 2026-08-18): the kernel makes the step
SLOWER (29.0 -> 30.1 ms restricted to large 2D leaves; 31.3 ms when >=3D
leaves were reshaped, which forces retiling copies under TPU tiled layouts).
XLA fuses the optax update into the weight-gradient matmul epilogues -- the
update is effectively free there, and an opaque custom call forecloses that
fusion.  Hence ``Config.use_fused_adam`` defaults to False; the module stays
as a tested option for backends/configs where the epilogue fusion does not
materialize:

    m' = b1 m + (1-b1) g
    v' = b2 v + (1-b2) g**2
    p' = p - a * m' / (r * sqrt(v') + eps)

with a = lr/(1-b1**t), r = (1-b2**t)**-1/2, t the post-increment step count
(exactly optax.adam's bias correction; eps outside the sqrt like torch).

``fused_adam_step`` keeps the optax state tuple
``(ScaleByAdamState, ScaleByScheduleState)`` bit-compatible so checkpoints
are interchangeable with the optax path.  On non-TPU backends it falls back
to the plain optax update (bitwise-identical to the previous code path);
FSTTS_PALLAS_INTERPRET=1 forces the kernel through the Pallas interpreter
for CPU testing.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# leaves smaller than this stay in plain jnp: kernel-launch overhead would
# exceed the memory traffic (layer-norm scales, biases, the stop head)
_MIN_FUSED_SIZE = 1 << 20
_BLOCK_BYTES = 1 << 20  # per-buffer block target; 7 buffers stay under VMEM


def _adam_kernel(sc_ref, p_ref, g_ref, m_ref, v_ref, po_ref, mo_ref, vo_ref,
                 *, b1: float, b2: float, eps: float):
    g = g_ref[...]
    m = b1 * m_ref[...] + (1.0 - b1) * g
    v = b2 * v_ref[...] + (1.0 - b2) * (g * g)
    a = sc_ref[0]
    r = sc_ref[1]
    mo_ref[...] = m
    vo_ref[...] = v
    po_ref[...] = p_ref[...] - a * m / (r * jnp.sqrt(v) + eps)


def _block_rows(r: int, c: int) -> int:
    by_bytes = max(1, _BLOCK_BYTES // (4 * c))
    rows = min(r, by_bytes)
    # very wide minor dims (> _BLOCK_BYTES/32 elements) can't fit 8 rows in
    # the per-buffer budget; keep the unrounded row count rather than falling
    # back to the full array (which would blow the 7-buffer VMEM budget)
    return max(8, rows // 8 * 8) if rows >= 8 else max(1, rows)


@functools.partial(jax.jit, static_argnames=("b1", "b2", "eps", "interpret"))
def _adam_leaf_pallas(p, g, m, v, scalars, *, b1: float, b2: float,
                      eps: float, interpret: bool):
    shape = p.shape
    c = shape[-1] if p.ndim >= 1 and shape[-1] >= 128 else p.size
    r = p.size // c
    p2, g2, m2, v2 = (x.reshape(r, c) for x in (p, g, m, v))
    br = _block_rows(r, c)
    nr = (r + br - 1) // br
    kernel = functools.partial(_adam_kernel, b1=b1, b2=b2, eps=eps)
    spec = pl.BlockSpec((br, c), lambda i, *_: (i, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nr,),
        in_specs=[spec] * 4, out_specs=[spec] * 3)
    po, mo, vo = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((r, c), jnp.float32)] * 3,
        interpret=interpret,
    )(scalars, p2, g2, m2, v2)
    return po.reshape(shape), mo.reshape(shape), vo.reshape(shape)


def _adam_leaf_jnp(p, g, m, v, a, r, b1, b2, eps):
    m2 = b1 * m + (1.0 - b1) * g
    v2 = b2 * v + (1.0 - b2) * (g * g)
    return p - a * m2 / (r * jnp.sqrt(v2) + eps), m2, v2


def _kernel_ok() -> bool:
    return (jax.default_backend() == "tpu"
            or os.environ.get("FSTTS_PALLAS_INTERPRET") == "1")


def fused_adam_step(grads, opt_state, params, hp) -> Tuple[Any, Any]:
    """One Adam step; returns (new_params, new_opt_state).

    Drop-in replacement for ``tx.update`` + ``optax.apply_updates`` with
    ``tx = make_optimizer(hp)`` (train/loop.py); the state tuple layout and
    the count/schedule semantics are identical, so checkpoints saved under
    either path restore under the other.
    """
    from ..models.tacotron import learning_rate_schedule

    adam_state, sched_state = opt_state
    if not _kernel_ok():
        # exact previous behavior on CPU backends
        tx = optax.adam(
            learning_rate=lambda c: learning_rate_schedule(c, hp),
            b1=hp.adam_beta1, b2=hp.adam_beta2, eps=hp.adam_eps)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt_state

    b1, b2, eps = float(hp.adam_beta1), float(hp.adam_beta2), float(hp.adam_eps)
    interpret = jax.default_backend() != "tpu"
    count_inc = optax.safe_int32_increment(adam_state.count)
    t = count_inc.astype(jnp.float32)
    bc1 = 1.0 - jnp.power(b1, t)
    bc2 = 1.0 - jnp.power(b2, t)
    # scale_by_schedule consumes the pre-increment count (optax semantics)
    lr = learning_rate_schedule(sched_state.count, hp)
    a = (lr / bc1).astype(jnp.float32)
    r = jax.lax.rsqrt(bc2).astype(jnp.float32)
    scalars = jnp.stack([a, r])

    leaves_p, treedef = jax.tree.flatten(params)
    leaves_g = treedef.flatten_up_to(grads)
    leaves_m = treedef.flatten_up_to(adam_state.mu)
    leaves_v = treedef.flatten_up_to(adam_state.nu)
    out_p, out_m, out_v = [], [], []
    for p, g, m, v in zip(leaves_p, leaves_g, leaves_m, leaves_v):
        # 2D-only: merging leading dims of a TPU-tiled >=3D layout (e.g. the
        # postnet [5,80,512] conv kernels) is a real retiling copy, not a view
        if (p.size >= _MIN_FUSED_SIZE and p.dtype == jnp.float32
                and p.ndim == 2 and p.shape[-1] % 128 == 0):
            po, mo, vo = _adam_leaf_pallas(p, g, m, v, scalars, b1=b1, b2=b2,
                                           eps=eps, interpret=interpret)
        else:
            po, mo, vo = _adam_leaf_jnp(p, g, m, v, a, r, b1, b2, eps)
        out_p.append(po)
        out_m.append(mo)
        out_v.append(vo)
    new_params = jax.tree.unflatten(treedef, out_p)
    new_adam = adam_state._replace(count=count_inc,
                                   mu=jax.tree.unflatten(treedef, out_m),
                                   nu=jax.tree.unflatten(treedef, out_v))
    new_sched = sched_state._replace(
        count=optax.safe_int32_increment(sched_state.count))
    return new_params, (new_adam, new_sched)
