"""Fused Adam kernel (ops/fused_adam.py) vs the optax.adam chain.

The optimizer recurrence must match torch.optim.Adam as used by the
reference (train.py:130-131), which optax.adam reproduces; the kernel is
checked against optax over several steps, including the count/schedule
bookkeeping and the checkpoint-compatible state tuple.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from few_shot_transformer_tts_tpu.config import default_config
from few_shot_transformer_tts_tpu.models.tacotron import (
    learning_rate_schedule)
from few_shot_transformer_tts_tpu.ops.fused_adam import fused_adam_step
from few_shot_transformer_tts_tpu.train.loop import make_optimizer

HP = default_config(warmup_steps=2, max_lr=1e-3, min_lr=1e-5,
                    lr_decay_step=10, lr_decay_rate=0.5)


def _tree(seed):
    rng = np.random.RandomState(seed)
    return {
        # >= _MIN_FUSED_SIZE with a 128-multiple minor dim -> kernel path
        "big": jnp.asarray(rng.randn(512, 128), jnp.float32),
        "wide": jnp.asarray(rng.randn(300, 256), jnp.float32),  # ragged rows
        "small": {"w": jnp.asarray(rng.randn(40, 80), jnp.float32),
                  "b": jnp.asarray(rng.randn(80), jnp.float32)},
    }


def _run_optax(params, grad_trees):
    tx = make_optimizer(HP)
    state = tx.init(params)
    for g in grad_trees:
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)
    return params, state


def _run_fused(params, grad_trees):
    tx = make_optimizer(HP)
    state = tx.init(params)
    os.environ["FSTTS_PALLAS_INTERPRET"] = "1"
    try:
        for g in grad_trees:
            params, state = fused_adam_step(g, state, params, HP)
    finally:
        del os.environ["FSTTS_PALLAS_INTERPRET"]
    return params, state


def test_fused_matches_optax_over_steps():
    params = _tree(0)
    grads = [_tree(s) for s in range(1, 4)]
    p_ref, s_ref = _run_optax(params, grads)
    p_fused, s_fused = _run_fused(params, grads)
    assert int(s_fused[0].count) == int(s_ref[0].count) == 3
    assert int(s_fused[1].count) == int(s_ref[1].count) == 3
    assert jax.tree_util.tree_structure(s_fused) == \
        jax.tree_util.tree_structure(s_ref)
    for name, tref, tnew in (("params", p_ref, p_fused),
                             ("mu", s_ref[0].mu, s_fused[0].mu),
                             ("nu", s_ref[0].nu, s_fused[0].nu)):
        for lr_, ln_ in zip(jax.tree.leaves(tref), jax.tree.leaves(tnew)):
            np.testing.assert_allclose(np.asarray(lr_), np.asarray(ln_),
                                       rtol=2e-5, atol=2e-6, err_msg=name)


@pytest.mark.skipif(jax.default_backend() == "tpu",
                    reason="bitwise-equality check is CPU-fallback-only; on "
                           "TPU the kernel path is taken")
def test_cpu_fallback_is_exact_optax():
    # without FSTTS_PALLAS_INTERPRET a CPU backend uses the optax chain
    params = _tree(0)
    grads = [_tree(9)]
    p_ref, s_ref = _run_optax(params, grads)
    tx = make_optimizer(HP)
    state = tx.init(params)
    p_new, s_new = fused_adam_step(grads[0], state, params, HP)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_new)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(s_new[0].count) == 1


def test_lr_consumed_matches_schedule():
    # the schedule must be evaluated at the pre-increment count: after k
    # steps the (k+1)-th update uses lr(k), mirroring optax.scale_by_schedule
    params = {"w": jnp.ones((512, 128), jnp.float32)}
    g = {"w": jnp.full((512, 128), 0.5, jnp.float32)}
    tx = make_optimizer(HP)
    state = tx.init(params)
    os.environ["FSTTS_PALLAS_INTERPRET"] = "1"
    try:
        p1, s1 = fused_adam_step(g, state, params, HP)
        p2, _ = fused_adam_step(g, s1, p1, HP)
    finally:
        del os.environ["FSTTS_PALLAS_INTERPRET"]
    # step 1: constant-magnitude grad, bias-corrected Adam moves ~lr(0)
    lr0 = float(learning_rate_schedule(jnp.asarray(0), HP))
    delta1 = float(jnp.max(jnp.abs(p1["w"] - params["w"])))
    assert delta1 == pytest.approx(lr0, rel=1e-3)
