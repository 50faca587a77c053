"""Pre-LN transformer encoder/decoder stacks.

Topology matches reference transformer/modules.py:8-145: per layer
[LN -> self-attn -> residual; (LN -> cross-attn -> residual;) LN -> FFN(4x,
ReLU, bias-free) -> residual], final LN; a learnable scalar ``pe_scale``
multiplies the sinusoidal PE; decoder targets are imputed then shifted right
with a zero frame before PE.

The decoder additionally exposes an incremental KV-cache decode path
(init_cache / precompute_memory / decode_step) used by the lax.while_loop AR
synthesizer — a TPU-native replacement for the reference's full-prefix
re-forward (reference synthesize.py:35-54).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import Config
from .attention import MultiheadAttention
from .common import (
    sinusoid_position_encoding, causal_bias, padding_bias, length_mask,
    impute, variance_scaling_init,
)


class FFNLayer(nn.Module):
    """Bias-free 2-layer ReLU FFN (reference transformer/modules.py:8-20)."""
    input_size: int
    hidden_size: int
    output_size: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.input_layer = nn.Dense(self.hidden_size, use_bias=False,
                                    dtype=self.dtype,
                                    kernel_init=variance_scaling_init(),
                                    name="input_layer")
        self.output_layer = nn.Dense(self.output_size, use_bias=False,
                                     dtype=self.dtype,
                                     kernel_init=variance_scaling_init(),
                                     name="output_layer")
        self.dropout = nn.Dropout(self.dropout_rate)

    def __call__(self, inputs, deterministic: bool = True):
        hidden = nn.relu(self.input_layer(inputs))
        hidden = self.dropout(hidden, deterministic=deterministic)
        return self.output_layer(hidden)


class FusedLayerNorm(nn.Module):
    """Param-compatible nn.LayerNorm replacement backed by the one-pass
    Pallas kernel (ops/fused_layernorm.py — dx/dgamma/dbeta in one HBM
    stream; SOL_r05 measured XLA's LN-backward at 3.8x its bytes bound).
    Same "scale"/"bias" fp32 params, so checkpoints and the torch converter
    are unchanged."""
    epsilon: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.fused_layernorm import fused_layer_norm, reference_ln
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        x = x.astype(self.dtype)
        if jax.default_backend() != "tpu":
            # jnp fallback off-TPU (same policy as the attention kernel):
            # interpret-mode Mosaic would crawl on CPU test meshes, and the
            # jnp path is the same math (tests/test_fused_layernorm.py pins
            # kernel<->jnp parity in interpret mode)
            return reference_ln(x, scale, bias, self.epsilon)
        return fused_layer_norm(x, scale, bias, self.epsilon, False)


def _layer_norm(dtype, name, fused: bool = False):
    # eps matches reference nn.LayerNorm(..., eps=1e-6)
    if fused:
        return FusedLayerNorm(epsilon=1e-6, dtype=dtype, name=name)
    return nn.LayerNorm(epsilon=1e-6, dtype=dtype, name=name)


def _layer_classes(hp: Config):
    """Attention/FFN classes, rematerialized when hp.remat is set (trades
    recompute for activation memory on large configs; param paths unchanged).
    static_argnums cover the trailing python-bool args."""
    if hp.remat:
        return (nn.remat(MultiheadAttention, static_argnums=(4, 5)),
                nn.remat(FFNLayer, static_argnums=(2,)))
    return MultiheadAttention, FFNLayer


class TransformerEncoder(nn.Module):
    """reference transformer/modules.py:23-69."""
    input_size: int
    hp: Config
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        hp = self.hp
        hidden = hp.encoder_hidden
        mha_cls, ffn_cls = _layer_classes(hp)
        attns, attn_lns, ffns, ffn_lns = [], [], [], []
        for layer in range(hp.n_encoder_layer):
            in_size = self.input_size if layer == 0 else hidden
            attn_lns.append(_layer_norm(self.dtype, f"attn_layer_norms_{layer}", hp.use_fused_layernorm))
            attns.append(mha_cls(
                key_size=in_size, value_size=in_size, is_self_attention=True,
                num_heads=hp.n_attention_head,
                dropout_rate=hp.transformer_dropout_rate, dtype=self.dtype,
                use_pallas=hp.use_pallas_attention,
                name=f"self_attentions_{layer}"))
            ffn_lns.append(_layer_norm(self.dtype, f"ffn_layer_norms_{layer}", hp.use_fused_layernorm))
            ffns.append(ffn_cls(hidden, hidden * 4, hidden,
                                dropout_rate=hp.transformer_dropout_rate,
                                dtype=self.dtype, name=f"ffn_layers_{layer}"))
        self.self_attentions = attns
        self.attn_layer_norms = attn_lns
        self.ffn_layers = ffns
        self.ffn_layer_norms = ffn_lns
        self.output_layer_norm = _layer_norm(self.dtype, "output_layer_norm", hp.use_fused_layernorm)
        self.pe_scale = self.param("pe_scale", nn.initializers.ones, ())
        self.dropout = nn.Dropout(self.hp.transformer_dropout_rate)

    def __call__(self, inputs: jnp.ndarray, input_lengths: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        """inputs [B, T, C] embedded bytes -> encoder outputs [B, T, H]."""
        mask = length_mask(input_lengths, inputs.shape[1])
        x = inputs * mask[..., None].astype(inputs.dtype)
        bias = padding_bias(mask)
        pe = sinusoid_position_encoding(x.shape[1], x.shape[2]).astype(x.dtype)
        x = x + pe[None] * self.pe_scale.astype(x.dtype)
        x = self.dropout(x, deterministic=deterministic)

        for i in range(len(self.self_attentions)):
            # positional args: remat-wrapped classes need the static bools
            # in args, not kwargs
            y, _ = self.self_attentions[i](
                self.attn_layer_norms[i](x), None, bias, deterministic, False)
            x = x + self.dropout(y, deterministic=deterministic)
            y = self.ffn_layers[i](self.ffn_layer_norms[i](x), deterministic)
            x = x + self.dropout(y, deterministic=deterministic)
        return self.output_layer_norm(x)


class TransformerDecoder(nn.Module):
    """reference transformer/modules.py:72-145 + incremental decode path."""
    input_size: int
    hp: Config
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        hp = self.hp
        hidden = hp.decoder_hidden
        # Inherited reference constraint (transformer/tacotron.py:96-104 with
        # modules.py:85-87): the prenet emits decoder_hidden while layer 0 is
        # built at the encoder-memory width, so the two must be configured
        # equal (512 + 128 + 128 = 768 in the flagship config; drop
        # decoder_hidden accordingly when multi_speaker/multi_lingual are
        # off).  The reference fails opaquely on the layer-0 LayerNorm here.
        if self.input_size != hidden:
            raise ValueError(
                f"decoder_hidden ({hidden}) must equal encoder memory width "
                f"({self.input_size}) = encoder_hidden"
                " + speaker_embedding_size (if multi_speaker)"
                " + language_embedding_size (if multi_lingual)")
        mha_cls, ffn_cls = _layer_classes(hp)
        attns, attn_lns, xattns, xattn_lns, ffns, ffn_lns = [], [], [], [], [], []
        for layer in range(hp.n_decoder_layer):
            in_size = self.input_size if layer == 0 else hidden
            attn_lns.append(_layer_norm(self.dtype, f"attn_layer_norms_{layer}", hp.use_fused_layernorm))
            attns.append(mha_cls(
                key_size=in_size, value_size=in_size, is_self_attention=True,
                num_heads=hp.n_attention_head,
                dropout_rate=hp.transformer_dropout_rate, dtype=self.dtype,
                use_pallas=hp.use_pallas_attention,
                name=f"self_attentions_{layer}"))
            xattn_lns.append(_layer_norm(self.dtype, f"encdec_layer_norms_{layer}", hp.use_fused_layernorm))
            xattns.append(mha_cls(
                key_size=hidden, value_size=hidden, is_self_attention=False,
                num_heads=hp.n_attention_head,
                dropout_rate=hp.transformer_dropout_rate, dtype=self.dtype,
                use_pallas=hp.use_pallas_attention,
                name=f"encdec_attentions_{layer}"))
            ffn_lns.append(_layer_norm(self.dtype, f"ffn_layer_norms_{layer}", hp.use_fused_layernorm))
            ffns.append(ffn_cls(hidden, hidden * 4, hidden,
                                dropout_rate=hp.transformer_dropout_rate,
                                dtype=self.dtype, name=f"ffn_layers_{layer}"))
        self.self_attentions = attns
        self.attn_layer_norms = attn_lns
        self.encdec_attentions = xattns
        self.encdec_layer_norms = xattn_lns
        self.ffn_layers = ffns
        self.ffn_layer_norms = ffn_lns
        self.output_layer_norm = _layer_norm(self.dtype, "output_layer_norm", hp.use_fused_layernorm)
        self.pe_scale = self.param("pe_scale", nn.initializers.ones, ())
        self.dropout = nn.Dropout(self.hp.transformer_dropout_rate)

    # ---------------- teacher-forced path -----------------------------------

    def __call__(self, memory: jnp.ndarray, targets: jnp.ndarray,
                 input_lengths: jnp.ndarray, target_lengths: jnp.ndarray,
                 deterministic: bool = True, collect_alignments: bool = False
                 ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        """memory [B, Tin, H_mem]; targets [B, Tout, H] (already prenet'ed).

        Returns (outputs [B, Tout, H], {'self': [...], 'encdec': [...]}).
        """
        in_mask = length_mask(input_lengths, memory.shape[1])
        memory_bias = padding_bias(in_mask)
        query_bias = causal_bias(targets.shape[1])

        # impute + shift right with a zero frame (reference modules.py:114-116)
        x = impute(targets, target_lengths)
        x = jnp.concatenate(
            [jnp.zeros_like(x[:, :1]), x[:, :-1]], axis=1)
        pe = sinusoid_position_encoding(x.shape[1], x.shape[2]).astype(x.dtype)
        x = x + pe[None] * self.pe_scale.astype(x.dtype)
        x = self.dropout(x, deterministic=deterministic)

        attn_align, encdec_align = [], []
        for i in range(len(self.self_attentions)):
            y, a = self.self_attentions[i](
                self.attn_layer_norms[i](x), None, query_bias, deterministic,
                collect_alignments)
            attn_align.append(a)
            x = x + self.dropout(y, deterministic=deterministic)

            y, a = self.encdec_attentions[i](
                self.encdec_layer_norms[i](x), memory, memory_bias,
                deterministic, collect_alignments)
            encdec_align.append(a)
            x = x + self.dropout(y, deterministic=deterministic)

            y = self.ffn_layers[i](self.ffn_layer_norms[i](x), deterministic)
            x = x + self.dropout(y, deterministic=deterministic)
        outputs = self.output_layer_norm(x)
        outputs = impute(outputs, target_lengths)
        return outputs, {"self": attn_align, "encdec": encdec_align}

    # ---------------- incremental path --------------------------------------

    def init_cache(self, batch: int, max_len: int) -> Dict[str, jnp.ndarray]:
        hp = self.hp
        n_layers = hp.n_decoder_layer
        heads = hp.n_attention_head
        caches = {}
        for i in range(n_layers):
            in_size = self.input_size if i == 0 else hp.decoder_hidden
            d = in_size // heads
            caches[f"k_{i}"] = jnp.zeros((batch, heads, max_len, d), self.dtype)
            caches[f"v_{i}"] = jnp.zeros((batch, heads, max_len, d), self.dtype)
        return caches

    def precompute_memory(self, memory: jnp.ndarray):
        """Cross-attention K/V per layer, computed once per utterance."""
        return [xa.project_kv(memory) for xa in self.encdec_attentions]

    def decode_step(self, x: jnp.ndarray, step: jnp.ndarray,
                    cache: Dict[str, jnp.ndarray], memory_kv,
                    memory_bias: jnp.ndarray, deterministic: bool = True,
                    collect_self: bool = False):
        """One decoder step.

        x: [B, H] = prenet(prev_frame); PE is added here.  Returns
        (out [B, H], new_cache, encdec_align [n_layers, B, H, Tm],
        self_align [n_layers, B, H, Tcap] or None).  The reference's
        eval_batch returns both self and enc-dec alignments
        (reference synthesize.py:69-72 via modules.py:123-145); self
        alignments are opt-in here because the per-step rows span the whole
        cache capacity.
        """
        cap = cache["k_0"].shape[2]
        pe = sinusoid_position_encoding(cap, x.shape[-1]).astype(x.dtype)
        x = x + jax.lax.dynamic_index_in_dim(pe, step, axis=0, keepdims=False) \
            * self.pe_scale.astype(x.dtype)
        x = self.dropout(x, deterministic=deterministic)

        aligns, self_aligns = [], []
        new_cache = dict(cache)
        for i in range(len(self.self_attentions)):
            h = self.attn_layer_norms[i](x)
            y, ck, cv, sa = self.self_attentions[i].decode_self_step(
                h, cache[f"k_{i}"], cache[f"v_{i}"], step,
                deterministic=deterministic)
            new_cache[f"k_{i}"], new_cache[f"v_{i}"] = ck, cv
            self_aligns.append(sa)
            x = x + self.dropout(y, deterministic=deterministic)

            h = self.encdec_layer_norms[i](x)
            y, a = self.encdec_attentions[i].decode_cross_step(
                h, memory_kv[i][0], memory_kv[i][1], memory_bias,
                deterministic=deterministic)
            aligns.append(a)
            x = x + self.dropout(y, deterministic=deterministic)

            y = self.ffn_layers[i](self.ffn_layer_norms[i](x), deterministic)
            x = x + self.dropout(y, deterministic=deterministic)
        out = self.output_layer_norm(x)
        return out, new_cache, jnp.stack(aligns), \
            (jnp.stack(self_aligns) if collect_self else None)
