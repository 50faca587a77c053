"""Byte2Speech transformer model (encoder / prenet / decoder / postnet), loss,
and LR schedule.

Graph parity with reference transformer/tacotron.py:8-179:
  * Encoder: byte embedding (N(0,1) init) -> pre-LN transformer encoder ->
    concat broadcast speaker embed (Embed -> Dense -> softsign) and language
    embed (one-hot -> bias-free Dense -> Dense -> softsign).
  * DecoderPrenet: 80 -> 256 -> 256 -> 768, ReLU + dropout 0.5 after the first
    two layers, bias-free final layer.
  * Decoder: prenet -> pre-LN transformer decoder -> bias-free mel head
    (imputed) + stop head on stop-gradient'ed features.
  * Postnet: 5x [impute -> Conv1d(k=5, SAME, bias-free) -> BatchNorm -> tanh
    (except last) -> dropout 0.5], residual added to mel_bef.
  * Loss: bef/aft masked MSE + masked stop BCE (pos_weight 5) + L2 on non-norm
    weights excluding byte/speaker embeddings (reference tacotron.py:136-158).
  * Custom inits are baked into the module initializers
    (reference tacotron.py:161-173).

Dropout-mode quirk preserved: the reference runs AR synthesis with decoder
dropout ON (m.eval(); m.decoder.train() — reference eval.py:116-117).  Here the
``decoder_dropout`` flag reproduces that independently of ``train``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import Config
from .common import (
    impute, length_mask, mask_reduce, truncated_normal_init,
    variance_scaling_init,
)
from .modules import TransformerEncoder, TransformerDecoder


def _dense(feats, dtype, name, use_bias=True, kernel_init=None):
    return nn.Dense(feats, use_bias=use_bias, dtype=dtype,
                    kernel_init=kernel_init or variance_scaling_init(),
                    name=name)


class Encoder(nn.Module):
    """reference transformer/tacotron.py:8-44."""
    hp: Config
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        hp = self.hp
        self.embed = nn.Embed(hp.vocab_size, hp.embed_size,
                              embedding_init=nn.initializers.normal(stddev=1.0),
                              dtype=self.dtype, name="embed")
        if hp.multi_speaker:
            self.speaker_embed = nn.Embed(
                hp.max_num_speaker, hp.speaker_embedding_size,
                embedding_init=truncated_normal_init(0.5),
                dtype=self.dtype, name="speaker_embed")
            self.speaker_layer = _dense(hp.speaker_embedding_size, self.dtype,
                                        "speaker_layer")
        if hp.multi_lingual:
            self.language_embed = _dense(
                hp.language_embedding_size, self.dtype, "language_embed",
                use_bias=False, kernel_init=truncated_normal_init(0.5))
            self.language_layer = _dense(hp.language_embedding_size, self.dtype,
                                         "language_layer")
        self.encoder = TransformerEncoder(hp.embed_size, hp, dtype=self.dtype,
                                          name="encoder")

    def get_language_embed(self, language_vecs):
        x = self.language_embed(language_vecs.astype(self.dtype))
        return nn.soft_sign(self.language_layer(x))

    def get_speaker_embed(self, spk_ids):
        x = self.speaker_embed(spk_ids)
        return nn.soft_sign(self.speaker_layer(x))

    def __call__(self, inputs, input_lengths, input_spk_ids=None,
                 input_language_vecs=None, deterministic: bool = True):
        x = self.embed(inputs)
        out = self.encoder(x, input_lengths, deterministic=deterministic)
        t = out.shape[1]
        if self.hp.multi_speaker:
            spk = self.get_speaker_embed(input_spk_ids)          # [B, S]
            out = jnp.concatenate(
                [out, jnp.repeat(spk[:, None, :], t, axis=1)], axis=-1)
        if self.hp.multi_lingual:
            lan = self.get_language_embed(input_language_vecs)   # [B, L]
            out = jnp.concatenate(
                [out, jnp.repeat(lan[:, None, :], t, axis=1)], axis=-1)
        return out


class DecoderPrenet(nn.Module):
    """reference transformer/tacotron.py:47-65."""
    in_size: int
    hidden_size: int
    out_size: int
    dropout_rate: float
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.dense0 = _dense(self.hidden_size, self.dtype, "dense0")
        self.dense1 = _dense(self.hidden_size, self.dtype, "dense1")
        self.dense_final = _dense(self.out_size, self.dtype, "dense_final",
                                  use_bias=False)
        self.dropout = nn.Dropout(self.dropout_rate)

    def __call__(self, x, deterministic: bool = True):
        x = self.dropout(nn.relu(self.dense0(x)), deterministic=deterministic)
        x = self.dropout(nn.relu(self.dense1(x)), deterministic=deterministic)
        return self.dense_final(x)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over (batch, time) with padded frames EXCLUDED from batch
    statistics.

    TPU-native divergence from the reference: torch BatchNorm1d
    (reference tacotron.py:79) computes stats over all positions including
    padding, which would make training depend on how much lattice padding a
    batch carries.  Masking the stats makes the train step invariant to both
    time- and batch-axis padding (tested).  Eval parity with the reference is
    exact either way: inference uses the stored running statistics.  Running
    var uses torch's unbiased update; normalization uses biased variance.
    """
    features: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, lengths, use_running_average: bool):
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mask = length_mask(lengths, x.shape[1]).astype(jnp.float32)[..., None]
            n = jnp.maximum(mask.sum(), 1.0)
            xf = x.astype(jnp.float32)
            mean = (xf * mask).sum(axis=(0, 1)) / n
            var = (jnp.square(xf - mean) * mask).sum(axis=(0, 1)) / n
            if not self.is_initializing():
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = self.momentum * ra_mean.value + \
                    (1.0 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + \
                    (1.0 - self.momentum) * unbiased
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(self.dtype)


class MatmulConv1D(nn.Module):
    """k-tap SAME 1D convolution evaluated as matmuls, parameter-compatible
    with nn.Conv(use_bias=False, padding=SAME) ("kernel" [k,Cin,Cout]), so
    checkpoints and the torch converter are untouched.

    Motivated by XLA's conv lowering measuring 2x its computed bound
    (SOL_r05.json conv_vs_bound) — but BOTH evaluations measured SLOWER
    than the conv at the flagship step (tools/step_ab.py): wide-concat
    [B,T,k*Cin] @ [k*Cin,Cout] 27.34 ms/step (CONV_AB_r05.json) and
    sum-of-k-shifted-matmuls 27.07 ms (CONV_AB_r05_sum5.json) vs
    26.69-26.80 baseline — the conv category's "2x bound" includes the
    BatchNorm/tanh fusions XLA hangs off the conv op, which a matmul
    rewrite does not remove.  hp.conv_as_matmul therefore ships default
    OFF; this module is the kept, tested rejection record."""
    features: int
    kernel_size: int = 5
    dtype: Any = jnp.float32
    wide: bool = False

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        c_in = x.shape[-1]
        kernel = self.param("kernel", variance_scaling_init(),
                            (k, c_in, self.features), jnp.float32)
        r = k // 2
        xp = jnp.pad(x, ((0, 0), (r, k - 1 - r), (0, 0))).astype(self.dtype)
        t = x.shape[1]
        if getattr(self, "wide", False):
            # one fat matmul over the concatenated shifted views — measured
            # 2.4% SLOWER at the step level (CONV_AB_r05.json: 27.34 vs
            # 26.69 ms; the [B,T,k*C] materialization outweighs the conv
            # lowering overhead); kept for the record
            wide = jnp.concatenate([xp[:, i:i + t, :] for i in range(k)],
                                   axis=-1)
            w = kernel.reshape(k * c_in, self.features).astype(self.dtype)
            return jax.lax.dot_general(wide, w, (((2,), (0,)), ((), ())))
        w = kernel.astype(self.dtype)
        y = None
        for i in range(k):   # sum of k shifted matmuls: no wide tensor ever
            term = jax.lax.dot_general(xp[:, i:i + t, :], w[i],
                                       (((2,), (0,)), ((), ())))
            y = term if y is None else y + term
        return y


class Postnet(nn.Module):
    """reference transformer/tacotron.py:68-90.  Layout is NWC throughout;
    batch statistics are length-masked (see MaskedBatchNorm)."""
    hp: Config
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        hp = self.hp
        convs, bns = [], []
        hidden = hp.postnet_hidden
        for i in range(hp.n_postnet_layer):
            out_size = hp.num_mels if i == hp.n_postnet_layer - 1 else hidden
            if getattr(hp, "conv_as_matmul", False):
                convs.append(MatmulConv1D(
                    out_size, kernel_size=5, dtype=self.dtype,
                    name=f"conv_layers_{i}"))
            else:
                convs.append(nn.Conv(
                    out_size, kernel_size=(5,), padding="SAME", use_bias=False,
                    dtype=self.dtype, kernel_init=variance_scaling_init(),
                    name=f"conv_layers_{i}"))
            bns.append(MaskedBatchNorm(
                out_size, momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                name=f"batchnorm_layers_{i}"))
        self.conv_layers = convs
        self.batchnorm_layers = bns
        self.dropout = nn.Dropout(hp.decoder_dropout_rate)

    def __call__(self, inputs, input_lengths, train: bool = False,
                 deterministic: Optional[bool] = None):
        if deterministic is None:
            deterministic = not train
        x = inputs
        n = len(self.conv_layers)
        for i in range(n):
            x = impute(x, input_lengths)
            x = self.conv_layers[i](x)
            x = self.batchnorm_layers[i](x, input_lengths,
                                         use_running_average=not train)
            if i != n - 1:
                x = jnp.tanh(x)
            x = self.dropout(x, deterministic=deterministic)
        return x


class Decoder(nn.Module):
    """reference transformer/tacotron.py:93-116."""
    hp: Config
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        hp = self.hp
        in_size = hp.encoder_hidden
        if hp.multi_speaker:
            in_size += hp.speaker_embedding_size
        if hp.multi_lingual:
            in_size += hp.language_embedding_size
        self.prenet = DecoderPrenet(hp.num_mels, hp.prenet_hidden,
                                    hp.decoder_hidden, hp.decoder_dropout_rate,
                                    dtype=self.dtype, name="prenet")
        self.decoder = TransformerDecoder(in_size, hp, dtype=self.dtype,
                                          name="decoder")
        self.mel_net = _dense(hp.num_mels, self.dtype, "mel_net", use_bias=False)
        self.stop_net = _dense(1, self.dtype, "stop_net")

    def __call__(self, encoder_outputs, input_lengths, targets, target_lengths,
                 leave_one: bool = False, deterministic: bool = True,
                 collect_alignments: bool = False):
        dec_inputs = self.prenet(targets, deterministic=deterministic)
        if leave_one:
            dec_inputs = dec_inputs.at[:, -1].multiply(0)
        outputs, align = self.decoder(
            encoder_outputs, dec_inputs, input_lengths, target_lengths,
            deterministic=deterministic, collect_alignments=collect_alignments)
        mels = self.mel_net(outputs)
        mels = impute(mels, target_lengths)
        stop_logits = self.stop_net(jax.lax.stop_gradient(outputs))[..., 0]
        stop_logits = impute(stop_logits, target_lengths)
        return mels, stop_logits, align


class ByteToMel(nn.Module):
    """Top-level model (reference transformer/tacotron.py:119-133 'Tacotron')."""
    hp: Config

    @property
    def dtype(self):
        return jnp.bfloat16 if self.hp.use_bfloat16 else jnp.float32

    def setup(self):
        self.encoder = Encoder(self.hp, dtype=self.dtype, name="encoder")
        self.decoder = Decoder(self.hp, dtype=self.dtype, name="decoder")
        self.postnet = Postnet(self.hp, dtype=self.dtype, name="postnet")

    def __call__(self, inputs, input_lengths, mel_targets, target_lengths,
                 input_spk_ids=None, input_language_vecs=None,
                 train: bool = False, decoder_dropout: Optional[bool] = None,
                 collect_alignments: bool = False, **kwargs) -> Dict[str, Any]:
        """Teacher-forced forward.  All float outputs are fp32."""
        if decoder_dropout is None:
            decoder_dropout = train
        enc = self.encoder(inputs, input_lengths, input_spk_ids,
                           input_language_vecs, deterministic=not train)
        mel_bef, stop_logits, alignments = self.decoder(
            enc, input_lengths, mel_targets.astype(self.dtype), target_lengths,
            deterministic=not decoder_dropout,
            collect_alignments=collect_alignments)
        mel_res = self.postnet(mel_bef, target_lengths, train=train)
        mel_bef = mel_bef.astype(jnp.float32)
        mel_aft = mel_bef + mel_res.astype(jnp.float32)
        return {"mel_bef": mel_bef, "mel_aft": mel_aft,
                "stop_logits": stop_logits.astype(jnp.float32),
                "alignments": alignments}

    # ------------- incremental synthesis entry points (used via apply) -------

    def encode(self, inputs, input_lengths, input_spk_ids=None,
               input_language_vecs=None, decoder_dropout: bool = False):
        """Encoder once + cross-attention K/V precompute for AR decode."""
        enc = self.encoder(inputs, input_lengths, input_spk_ids,
                           input_language_vecs, deterministic=True)
        memory_kv = self.decoder.decoder.precompute_memory(enc)
        return enc, memory_kv

    def init_decode_cache(self, batch: int, max_len: int):
        return self.decoder.decoder.init_cache(batch, max_len)

    def decode_step(self, prev_mel, step, cache, memory_kv, memory_bias,
                    decoder_dropout: bool = False):
        """One AR step: prev_mel [B, M] -> (mel [B, M], stop_logit [B], cache,
        encdec_align [n_layers, B, H, Tm])."""
        deterministic = not decoder_dropout
        x = self.decoder.prenet(prev_mel.astype(self.dtype),
                                deterministic=deterministic)
        out, cache, align, _ = self.decoder.decoder.decode_step(
            x, step, cache, memory_kv, memory_bias,
            deterministic=deterministic)
        mel = self.decoder.mel_net(out).astype(jnp.float32)
        stop = self.decoder.stop_net(out)[..., 0].astype(jnp.float32)
        return mel, stop, cache, align

    def postnet_residual(self, mels, lengths, train: bool = False):
        return self.postnet(mels.astype(self.dtype), lengths,
                            train=train).astype(jnp.float32)


# ---------------------------------------------------------------------------
# loss (reference transformer/tacotron.py:136-158)
# ---------------------------------------------------------------------------


def l2_regularizable(path_tuple) -> bool:
    """Whether a param (by its flattened path) joins the L2 term.

    Reference rule (tacotron.py:144-146): torch params with 'weight' in the
    name, excluding layer_norm/batchnorm and the byte/speaker embeddings.  In
    this param tree that is exactly the Dense/Conv 'kernel' leaves ('embedding'
    leaves are the torch Embedding weights; norm layers expose 'scale'/'bias';
    pe_scale is a bare scalar).
    """
    return path_tuple[-1] == "kernel"


def l2_loss(params) -> jnp.ndarray:
    from flax.traverse_util import flatten_dict
    flat = flatten_dict(params)
    total = 0.0
    for path, p in flat.items():
        if l2_regularizable(path):
            total = total + jnp.sum(jnp.square(p.astype(jnp.float32))) / 2
    return total


def compute_loss(params, mel_targets, target_lengths, outputs,
                 hp: Config) -> Dict[str, jnp.ndarray]:
    bef = jnp.mean(jnp.square(outputs["mel_bef"] - mel_targets), axis=-1)
    bef_loss = mask_reduce(bef, target_lengths)

    aft = jnp.mean(jnp.square(outputs["mel_aft"] - mel_targets), axis=-1)
    aft_loss_samplewise = mask_reduce(aft, target_lengths, per_sample=True)
    aft_loss = mask_reduce(aft, target_lengths)

    l2_reg = hp.reg_weight * l2_loss(params)

    t = mel_targets.shape[1]
    stop_target = (jnp.arange(t)[None, :] ==
                   (target_lengths[:, None] - 1)).astype(jnp.float32)
    x = outputs["stop_logits"]
    # BCE-with-logits, pos_weight=5 (reference tacotron.py:150-151)
    ce = 5.0 * stop_target * jax.nn.softplus(-x) + \
        (1.0 - stop_target) * jax.nn.softplus(x)
    ce_loss = mask_reduce(ce, target_lengths)

    mse_loss = (bef_loss + aft_loss) / 2
    loss = bef_loss + aft_loss + l2_reg + ce_loss
    return {"loss": loss, "bef_loss": bef_loss, "aft_loss": aft_loss,
            "aft_losses": aft_loss_samplewise, "mse_loss": mse_loss,
            "l2": l2_reg, "stop_loss": ce_loss}


def learning_rate_schedule(global_step, hp: Config):
    """Absolute LR at a step (reference tacotron.py:176-179 x max_lr)."""
    step = jnp.maximum(global_step - hp.warmup_steps, 0)
    rate = hp.lr_decay_rate ** (step / hp.lr_decay_step)
    return hp.max_lr * jnp.maximum(hp.min_lr / hp.max_lr, rate)
