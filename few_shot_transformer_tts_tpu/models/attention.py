"""Multi-head attention with training (full-sequence) and incremental
(KV-cache) paths.

Topology matches reference transformer/attention.py:29-122: fused bias-free QKV
projection for self-attention, separate Q + fused KV for cross-attention,
queries scaled by ``d_head**-0.5``, additive bias, softmax in fp32, dropout on
the attention weights, bias-free output projection.  ``align`` is the softmax
weights transposed to [B, H, memory, query] as in the reference.

TPU-first additions the reference does not have:
  * an incremental ``decode_self_step`` / ``decode_cross_step`` path with KV
    caches, turning the reference's O(T^3) full-prefix re-forward
    (reference synthesize.py:35-54) into O(T^2) decode;
  * bf16 matmuls with fp32 softmax/accumulation (MXU-friendly);
  * a fused Pallas attention kernel for the full-sequence path when no
    alignment tensor is requested: ops/pallas_attention_train.py (packed
    layout, in-kernel dropout, custom flash backward; also serves eval with
    rate=0).  Sequences beyond its 2048-key whole-K window fall back to the
    jnp path — the data layer caps sequences at ~1000/1100 (reference
    hyperparams.py:19,21), so no long-form kernel is kept (a blocked
    online-softmax variant was built, never reachable at parity configs, and
    removed in round 3; see README "parity and deliberate divergences").
"""

from __future__ import annotations

import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import split_heads, combine_heads, variance_scaling_init, NEG_INF


class MultiheadAttention(nn.Module):
    key_size: int
    value_size: int
    is_self_attention: bool
    num_heads: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    def setup(self):
        assert self.key_size % self.num_heads == 0
        assert self.value_size % self.num_heads == 0
        dense = lambda feats, name: nn.Dense(
            feats, use_bias=False, dtype=self.dtype,
            kernel_init=variance_scaling_init(), name=name)
        if self.is_self_attention:
            self.qkv_transform = dense(self.key_size * 2 + self.value_size,
                                       "qkv_transform")
        else:
            self.q_transform = dense(self.key_size, "q_transform")
            self.kv_transform = dense(self.key_size + self.value_size,
                                      "kv_transform")
        self.output_transform = dense(self.key_size, "output_transform")
        self.attn_dropout = nn.Dropout(self.dropout_rate)

    # ---------------- full-sequence path (training / teacher forcing) -------

    def __call__(self, queries: jnp.ndarray, memories: Optional[jnp.ndarray],
                 bias: Optional[jnp.ndarray], deterministic: bool = True,
                 need_align: bool = False):
        """queries [B, Tq, C]; memories [B, Tm, C] or None for self-attention.

        Returns (outputs [B, Tq, C], align [B, H, Tm, Tq] or None).
        """
        if self.is_self_attention:
            combined = self.qkv_transform(queries)
            q, k, v = jnp.split(
                combined, [self.key_size, self.key_size * 2], axis=-1)
        else:
            q = self.q_transform(queries)
            combined = self.kv_transform(memories)
            k, v = jnp.split(combined, [self.key_size], axis=-1)

        depth = self.key_size // self.num_heads
        on_tpu = jax.default_backend() == "tpu"
        # FSTTS_PALLAS_INTERPRET=1 exercises the kernel branch on CPU via the
        # Pallas interpreter (used by the test suite).  Only when no dropout
        # mask is needed: the interpreter has no lowering for the TPU PRNG
        # (prng_seed) — rate 0 covers both eval and SPMD train-step tests
        # with transformer_dropout_rate=0.
        interpret = (not on_tpu) and \
            (deterministic or self.dropout_rate == 0.0) and \
            os.environ.get("FSTTS_PALLAS_INTERPRET") == "1"

        if self.use_pallas and not need_align and (on_tpu or interpret) and \
                k.shape[1] <= 2048:
            # fused kernel in the packed [B, T, H*D] layout — neither the
            # quadratic weights/masks nor any head transpose ever reaches
            # HBM.  Training gets in-kernel dropout + the custom flash
            # backward; eval runs the same kernel with rate=0.
            from ..ops.pallas_attention_train import mha_train
            causal = bias is not None and bias.ndim == 4 and \
                bias.shape[0] == 1 and bias.shape[2] == bias.shape[3]
            if causal or bias is None:
                bias_vec = jnp.zeros((q.shape[0], k.shape[1]), jnp.float32)
            else:
                bias_vec = bias[:, 0, 0, :].astype(jnp.float32)
            if deterministic or self.dropout_rate == 0.0:
                rate = 0.0
                seed = jnp.zeros((1, 1), jnp.int32)
            else:
                rate = float(self.dropout_rate)
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1, 1), 0,
                    jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
            x = mha_train(q, k, v, bias_vec, seed, self.num_heads, rate,
                          bool(causal), scale=depth ** -0.5,
                          interpret=interpret,
                          use_bias=not (causal or bias is None))
            return self.output_transform(x), None

        q = split_heads(q, self.num_heads)
        k = split_heads(k, self.num_heads)
        v = split_heads(v, self.num_heads)
        q = q * (depth ** -0.5)

        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k,
            preferred_element_type=jnp.float32).astype(jnp.float32)
        if bias is not None:
            logits = logits + bias
        weights = jax.nn.softmax(logits, axis=-1)
        align = weights.transpose(0, 1, 3, 2) if need_align else None
        weights = self.attn_dropout(weights, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", weights.astype(self.dtype), v,
                         preferred_element_type=jnp.float32)

        x = combine_heads(ctx.astype(self.dtype))
        return self.output_transform(x), align

    # ---------------- incremental path (AR decode) --------------------------

    def project_kv(self, memories: jnp.ndarray):
        """Precompute split-head cross-attention K/V from encoder memory.

        Returns (k [B, H, Tm, Dk], v [B, H, Tm, Dv]).
        """
        assert not self.is_self_attention
        combined = self.kv_transform(memories)
        k, v = jnp.split(combined, [self.key_size], axis=-1)
        return split_heads(k, self.num_heads), split_heads(v, self.num_heads)

    def decode_self_step(self, x: jnp.ndarray, cache_k: jnp.ndarray,
                         cache_v: jnp.ndarray, step: jnp.ndarray,
                         deterministic: bool = True):
        """One causal self-attention step.

        x: [B, C] current (layer-normed) input.  cache_k/v: [B, H, Tcap, D].
        step: scalar int32 current position.  Returns (out [B, C], new caches,
        align [B, H, Tcap]) — align is the pre-dropout softmax over cached
        positions (reference transformer/attention.py:86-88 keeps the same
        tensor for the self-attention alignment plots).
        """
        assert self.is_self_attention
        combined = self.qkv_transform(x)              # [B, 2K + V]
        q, k, v = jnp.split(combined, [self.key_size, self.key_size * 2], axis=-1)
        b = x.shape[0]
        depth = self.key_size // self.num_heads
        q = (q * depth ** -0.5).reshape(b, self.num_heads, depth)
        k = k.reshape(b, self.num_heads, depth)
        v = v.reshape(b, self.num_heads, -1)

        cache_k = jax.lax.dynamic_update_index_in_dim(cache_k, k, step, axis=2)
        cache_v = jax.lax.dynamic_update_index_in_dim(cache_v, v, step, axis=2)

        logits = jnp.einsum("bhd,bhtd->bht", q, cache_k,
                            preferred_element_type=jnp.float32).astype(jnp.float32)
        t_cap = cache_k.shape[2]
        causal = jnp.arange(t_cap)[None, None, :] <= step
        logits = jnp.where(causal, logits, NEG_INF)
        weights = jax.nn.softmax(logits, axis=-1)
        align = weights
        weights = self.attn_dropout(weights, deterministic=deterministic)
        ctx = jnp.einsum("bht,bhtd->bhd", weights.astype(self.dtype), cache_v,
                         preferred_element_type=jnp.float32)
        out = self.output_transform(
            ctx.astype(self.dtype).reshape(b, self.value_size))
        return out, cache_k, cache_v, align

    def decode_cross_step(self, x: jnp.ndarray, mem_k: jnp.ndarray,
                          mem_v: jnp.ndarray, mem_bias: jnp.ndarray,
                          deterministic: bool = True):
        """One cross-attention step.

        x: [B, C]; mem_k/v: [B, H, Tm, D]; mem_bias: [B, 1, 1, Tm] additive.
        Returns (out [B, C], align [B, H, Tm]).
        """
        assert not self.is_self_attention
        q = self.q_transform(x)
        b = x.shape[0]
        depth = self.key_size // self.num_heads
        q = (q * depth ** -0.5).reshape(b, self.num_heads, depth)
        logits = jnp.einsum("bhd,bhtd->bht", q, mem_k,
                            preferred_element_type=jnp.float32).astype(jnp.float32)
        logits = logits + mem_bias[:, 0, 0, :][:, None, :]
        weights = jax.nn.softmax(logits, axis=-1)
        align = weights
        weights = self.attn_dropout(weights, deterministic=deterministic)
        ctx = jnp.einsum("bht,bhtd->bhd", weights.astype(self.dtype), mem_v,
                         preferred_element_type=jnp.float32)
        out = self.output_transform(
            ctx.astype(self.dtype).reshape(b, self.value_size))
        return out, align
