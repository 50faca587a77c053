"""Fused training attention kernel (interpret mode): exact parity and grad
correctness at rate=0; dropout-specific behavior is validated on TPU by the
bench harness (mask fwd/bwd consistency via linearity in v)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from few_shot_transformer_tts_tpu.ops.pallas_attention_train import mha_train


H, D = 3, 64


def split(x):
    b, t, c = x.shape
    return x.reshape(b, t, H, D).transpose(0, 2, 1, 3)


def ref_attention(q, k, v, bias, scale=1.0):
    qh, kh, vh = split(q) * scale, split(k), split(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh).astype(jnp.float32)
    logits = logits + bias[:, None, None, :]
    w = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
    b, h, t, d = o.shape
    return o.transpose(0, 2, 1, 3).reshape(b, t, h * d)


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.RandomState(0)
    B, TQ, TK = 2, 50, 70
    q = jnp.asarray(rng.randn(B, TQ, H * D), jnp.float32) * 0.3
    k = jnp.asarray(rng.randn(B, TK, H * D), jnp.float32) * 0.3
    v = jnp.asarray(rng.randn(B, TK, H * D), jnp.float32)
    lengths = jnp.asarray([70, 40])
    bias = jnp.where(jnp.arange(TK)[None, :] < lengths[:, None], 0.0, -1e20)
    seed = jnp.zeros((1, 1), jnp.int32)
    return q, k, v, bias, seed


def test_forward_parity_rate0(qkv):
    q, k, v, bias, seed = qkv
    out = mha_train(q, k, v, bias, seed, H, 0.0, False, 1.0, True)
    ref = ref_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_grads_match_autodiff_rate0(qkv):
    q, k, v, bias, seed = qkv

    def loss_kernel(q, k, v):
        return (mha_train(q, k, v, bias, seed, H, 0.0, False, 1.0, True) ** 2).sum()

    def loss_ref(q, k, v):
        return (ref_attention(q, k, v, bias) ** 2).sum()

    g1 = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   err_msg="d" + name)


def test_causal_grads_match_autodiff(qkv):
    q, k, v, _, seed = qkv
    q = q[:, :40]
    k = k[:, :40]
    v = v[:, :40]
    zero_bias = jnp.zeros((2, 40), jnp.float32)
    causal = jnp.where(jnp.arange(40)[None, :] <= jnp.arange(40)[:, None],
                       0.0, -1e20)

    def loss_kernel(q, k, v):
        return (mha_train(q, k, v, zero_bias, seed, H, 0.0, True, 0.125, True) ** 2).sum()

    def loss_ref(q, k, v):
        qh, kh, vh = split(q) * 0.125, split(k), split(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) + causal[None, None]
        w = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
        return (o ** 2).sum()

    g1 = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   err_msg="d" + name)


def test_multi_tile_q_parity_rate0():
    # tq > 512 takes the multi-tile branch of _block_q_for (block_q=512,
    # padded tq); below 512 a single whole-Tq tile rounded to 8 is used
    rng = np.random.RandomState(1)
    B, TQ, TK = 1, 600, 600
    q = jnp.asarray(rng.randn(B, TQ, H * D), jnp.float32) * 0.3
    k = jnp.asarray(rng.randn(B, TK, H * D), jnp.float32) * 0.3
    v = jnp.asarray(rng.randn(B, TK, H * D), jnp.float32)
    bias = jnp.where(jnp.arange(TK)[None, :] < 570, 0.0, -1e20)
    seed = jnp.zeros((1, 1), jnp.int32)
    out = mha_train(q, k, v, bias, seed, H, 0.0, False, 0.125, True)
    ref = ref_attention(q, k, v, bias, scale=0.125)
    assert out.shape == (B, TQ, H * D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_jit_and_seed_plumbing(qkv):
    q, k, v, bias, seed = qkv
    f = jax.jit(lambda q, k, v, s: mha_train(q, k, v, bias, s, H, 0.0, False,
                                             1.0, True))
    o1 = f(q, k, v, seed)
    o2 = f(q, k, v, jnp.asarray([[42]], jnp.int32))
    # rate=0: seed must not matter
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


def test_block_b_equivalence():
    """block_b (batch rows per grid program) is a pure scheduling knob: the
    dropout streams are seeded by GLOBAL batch row, so outputs and grads are
    identical for any block_b that divides B.  rate=0 here (interpret mode
    cannot lower pltpu.prng_*); the dropout-on equivalence is asserted
    on-chip by tools/attn_fixed_cost.py --parity."""
    rng = np.random.RandomState(2)
    B, T = 4, 40
    q = jnp.asarray(rng.randn(B, T, H * D), jnp.float32) * 0.3
    k = jnp.asarray(rng.randn(B, T, H * D), jnp.float32) * 0.3
    v = jnp.asarray(rng.randn(B, T, H * D), jnp.float32)
    bias = jnp.zeros((B, T), jnp.float32)
    seed = jnp.asarray([[7]], jnp.int32)

    def loss(q, k, v, block_b, rate):
        o = mha_train(q, k, v, bias, seed, H, rate, False, 0.125, True,
                      None, True, block_b)
        return jnp.sum(o * (1.0 + 0.01 * jnp.arange(H * D))), o

    for rate in (0.0,):
        outs = {}
        for bb in (1, 2, 4):
            (l, o), g = jax.value_and_grad(
                lambda *a: loss(*a, bb, rate), argnums=(0, 1, 2),
                has_aux=True)(q, k, v)
            outs[bb] = (np.asarray(o), [np.asarray(x) for x in g])
        for bb in (2, 4):
            np.testing.assert_allclose(outs[1][0], outs[bb][0], atol=1e-6,
                                       err_msg="o block_b=%d rate=%s"
                                               % (bb, rate))
            for gr, gb, nm in zip(outs[1][1], outs[bb][1], "qkv"):
                np.testing.assert_allclose(gr, gb, atol=1e-6,
                                           err_msg="d%s block_b=%d rate=%s"
                                                   % (nm, bb, rate))
