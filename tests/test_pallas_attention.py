"""Flash-attention kernel parity vs the jnp softmax path (interpret mode on
CPU; the same kernel compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from few_shot_transformer_tts_tpu.ops.pallas_attention import flash_attention
from few_shot_transformer_tts_tpu.models.common import (
    padding_bias, causal_bias, length_mask)


def reference_attention(q, k, v, bias):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    if bias is not None:
        logits = logits + bias
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


def make_qkv(b=2, h=4, tq=50, tk=70, d=64, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(b, h, tq, d), jnp.float32) * 0.3
    k = jnp.asarray(rng.randn(b, h, tk, d), jnp.float32) * 0.3
    v = jnp.asarray(rng.randn(b, h, tk, d), jnp.float32)
    return q, k, v


def test_no_bias():
    q, k, v = make_qkv()
    out = flash_attention(q, k, v, interpret=True)
    ref = reference_attention(q, k, v, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_padding_bias():
    q, k, v = make_qkv()
    lengths = jnp.asarray([70, 33])
    bias = padding_bias(length_mask(lengths, 70))
    out = flash_attention(q, k, v, bias, interpret=True)
    ref = reference_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_causal_from_bias_tensor():
    q, k, v = make_qkv(tq=40, tk=40)
    bias = causal_bias(40)
    out = flash_attention(q, k, v, bias, interpret=True)
    ref = reference_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_causal_flag():
    q, k, v = make_qkv(tq=40, tk=40)
    out = flash_attention(q, k, v, causal=True, interpret=True)
    ref = reference_attention(q, k, v, causal_bias(40))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_non_tile_multiple_lengths_and_head96():
    # decoder head dim is 96 (768/8); lengths straddle tile boundaries
    q, k, v = make_qkv(tq=129, tk=257, d=96, seed=1)
    lengths = jnp.asarray([200, 129])
    bias = padding_bias(length_mask(lengths, 257))
    out = flash_attention(q, k, v, bias, interpret=True)
    ref = reference_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_fully_masked_rows_match_softmax_semantics():
    # zero-length samples (lattice padding) -> uniform attention in both paths
    q, k, v = make_qkv()
    lengths = jnp.asarray([0, 70])
    bias = padding_bias(length_mask(lengths, 70))
    out = flash_attention(q, k, v, bias, interpret=True)
    ref = reference_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_bf16_inputs():
    q, k, v = make_qkv()
    out = flash_attention(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                          v.astype(jnp.bfloat16), interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = reference_attention(q, k, v, None)
    np.testing.assert_allclose(np.asarray(out.astype(jnp.float32)),
                               np.asarray(ref), atol=3e-2)


def test_long_sequence_blocked_path():
    # tk > 2048 exercises the online-softmax blocked kernel
    q, k, v = make_qkv(b=1, h=2, tq=64, tk=2100, d=64, seed=2)
    lengths = jnp.asarray([2050])
    bias = padding_bias(length_mask(lengths, 2100))
    out = flash_attention(q, k, v, bias, interpret=True)
    ref = reference_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)
