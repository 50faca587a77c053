"""Transformer primitives shared by encoder/decoder.

Semantics match reference transformer/common.py:4-124 exactly (the PE uses the
[sin | cos] concatenated layout, NOT interleaved, with min/max timescale
1/1e4 and log increment over ``channels//2 - 1`` steps; attention biases are
additive with -1e20; ``impute`` zeroes elements beyond each sequence length;
``mask_reduce`` is a length-masked mean) — this layout parity is required for
reference-checkpoint conversion.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e20


@functools.lru_cache(maxsize=64)
def _sinusoid_table_np(length: int, channels: int,
                       min_timescale: float = 1.0,
                       max_timescale: float = 1e4) -> np.ndarray:
    position = np.arange(length)
    num_timescales = channels // 2
    log_timescale_increment = (
        np.log(float(max_timescale) / float(min_timescale)) / (num_timescales - 1))
    inv_timescales = min_timescale * np.exp(
        np.arange(num_timescales) * -log_timescale_increment)
    scaled_time = position[:, None] * inv_timescales[None, :]
    signal = np.concatenate([np.sin(scaled_time), np.cos(scaled_time)], axis=1)
    signal = np.pad(signal, [[0, 0], [0, channels % 2]])
    return signal.astype(np.float32)


def sinusoid_position_encoding(length: int, channels: int) -> jnp.ndarray:
    """[length, channels] sinusoidal PE (reference transformer/common.py:4-29)."""
    return jnp.asarray(_sinusoid_table_np(length, channels))


def causal_bias(length: int) -> jnp.ndarray:
    """[1, 1, T, T] additive causal bias (reference transformer/common.py:41-43)."""
    mask = np.triu(np.ones((length, length), dtype=np.float32), k=1) * NEG_INF
    return jnp.asarray(mask[None, None, :, :])


def padding_bias(mask: jnp.ndarray) -> jnp.ndarray:
    """[B, T] bool/0-1 validity mask -> [B, 1, 1, T] additive bias
    (reference transformer/common.py:44-46)."""
    return ((1.0 - mask.astype(jnp.float32)) * NEG_INF)[:, None, None, :]


def length_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """[B] -> [B, max_length] boolean validity mask."""
    return jnp.arange(max_length)[None, :] < lengths[:, None]


def impute(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Zero elements with time index >= length; time is axis 1
    (reference transformer/common.py:51-70, channels_last=True)."""
    mask = length_mask(lengths, x.shape[1])
    mask = mask.reshape(mask.shape + (1,) * (x.ndim - 2))
    return x * mask.astype(x.dtype)


def mask_reduce(loss: jnp.ndarray, lengths: jnp.ndarray,
                per_sample: bool = False) -> jnp.ndarray:
    """Length-masked mean of a [B, T] loss (reference transformer/common.py:73-87)."""
    masked = impute(loss, lengths)
    if per_sample:
        # guard: lattice-padded rows have length 0 (their values are dropped
        # host-side); reference rows always have length >= 1
        return masked.sum(-1) / jnp.maximum(lengths, 1)
    return masked.sum() / lengths.sum()


# ---------------------------------------------------------------------------
# initializers (reference transformer/common.py:90-124, tacotron.py:161-173)
# ---------------------------------------------------------------------------


def truncated_normal_init(std: float = 0.5, mean: float = 0.0):
    """Truncated normal within ±2 std (reference transformer/common.py:90-105)."""
    def init(key, shape, dtype=jnp.float32):
        return mean + std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)
    return init


def _fan_in_out(shape) -> tuple:
    """Fan computation matching the reference's torch layouts
    (transformer/common.py:118-122) translated to flax kernel layouts:
    Dense kernel [in, out]; Conv kernel [k, in, out]."""
    if len(shape) == 1:
        return shape[0], shape[0]
    if len(shape) == 2:
        return shape[0], shape[1]
    receptive = int(np.prod(shape[:-2]))
    return shape[-2] * receptive, shape[-1] * receptive


def variance_scaling_init(factor: float = 2.0):
    """FAN_AVG variance scaling with 1.3x factor into a ±2-std truncated normal
    (reference transformer/common.py:108-124)."""
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = _fan_in_out(shape)
        n = (fan_in + fan_out) / 2.0
        std = np.sqrt(1.3 * factor / n)
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)
    return init


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """[B, T, C] -> [B, H, T, C/H] (reference transformer/attention.py:6-15)."""
    b, t, c = x.shape
    return x.reshape(b, t, num_heads, c // num_heads).transpose(0, 2, 1, 3)


def combine_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, T, D] -> [B, T, H*D] (reference transformer/attention.py:18-26)."""
    b, h, t, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)
