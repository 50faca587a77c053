"""Parity tests for the fused AR-decode kernel (ops/pallas_decode.py).

Runs the Pallas kernel through the interpreter on the CPU mesh
(FSTTS_PALLAS_INTERPRET=1) in an fp32 config, so the fused path must match
the XLA decode_step path almost exactly — the only divergence is the fp32
residual stream (documented in the kernel module docstring).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from few_shot_transformer_tts_tpu.config import small_test_config
from few_shot_transformer_tts_tpu.models import ByteToMel
from few_shot_transformer_tts_tpu.infer import synthesize_batch

HP = small_test_config()


@pytest.fixture(scope="module")
def model_and_vars():
    m = ByteToMel(HP)
    rng = np.random.RandomState(0)
    batch = dict(
        inputs=jnp.asarray(rng.randint(3, 255, (2, 10)), jnp.int32),
        input_lengths=jnp.asarray([10, 7], jnp.int32),
        mel_targets=jnp.zeros((2, 12, HP.num_mels), jnp.float32),
        target_lengths=jnp.asarray([12, 9], jnp.int32),
        input_spk_ids=jnp.asarray([0, 1], jnp.int32),
        input_language_vecs=jax.nn.one_hot(jnp.asarray([0, 1]),
                                           HP.max_num_language),
    )
    variables = m.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)}, **batch, train=True)
    return m, variables


def _input_batch(B=3, Tin=11, seed=5):
    rng = np.random.RandomState(seed)
    return dict(
        inputs=rng.randint(3, 255, (B, Tin)).astype(np.int32),
        input_lengths=np.asarray([Tin, Tin - 4, Tin - 2][:B], np.int32),
        input_spk_ids=np.arange(B, dtype=np.int32),
        input_language_vecs=np.eye(HP.max_num_language, dtype=np.float32)[:B],
        names=["s%d" % i for i in range(B)],
    )


def _synthesize(m, variables, batch, use_fused):
    env = {} if not use_fused else {"FSTTS_PALLAS_INTERPRET": "1"}
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        hp = HP.replace(use_pallas_decode=use_fused)
        return synthesize_batch(ByteToMel(hp), variables, batch, hp,
                                deterministic=True, max_frames=24,
                                collect_alignments=True)
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def test_fused_decode_matches_xla_path(model_and_vars):
    m, variables = model_and_vars
    batch = _input_batch()
    ref = _synthesize(m, variables, batch, use_fused=False)
    got = _synthesize(m, variables, batch, use_fused=True)

    assert got["generated_lengths"] == ref["generated_lengths"]
    np.testing.assert_allclose(got["mel_pre"], ref["mel_pre"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got["mel_aft"], ref["mel_aft"],
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(got["alignments"]["encdec"], ref["alignments"]["encdec"]):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_fused_decode_respects_padding_rows(model_and_vars):
    """Lattice row padding (B padded up to batch_size_multiple) must not
    change the real rows' outputs."""
    m, variables = model_and_vars
    b2 = _input_batch(B=2)
    b3 = _input_batch(B=3)
    for k in b2:
        if k != "names":
            b2[k] = np.asarray(b3[k])[:2]
    b2["names"] = b3["names"][:2]
    out2 = _synthesize(m, variables, b2, use_fused=True)
    out3 = _synthesize(m, variables, b3, use_fused=True)
    n = min(out2["mel_pre"].shape[1], out3["mel_pre"].shape[1])
    for i in range(2):
        gl = min(out2["generated_lengths"][i], n)
        np.testing.assert_allclose(out2["mel_pre"][i][:gl],
                                   out3["mel_pre"][i][:gl],
                                   rtol=1e-4, atol=1e-4)
