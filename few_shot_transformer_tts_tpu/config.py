"""Typed hyperparameter/config system.

Replaces the reference's tf-style ``HParams`` singleton (reference:
hyperparams.py:3-72, utils/hparams.py:251-447) with a frozen-by-convention
dataclass carrying the exact same keys and defaults, plus a ``k=v,...`` CLI
override parser with the same value grammar (ints, floats, bools, strings,
and ``[a,b,c]`` lists) and per-run JSON dump.

Unlike the reference there is no module-global singleton: every subsystem takes
a ``Config`` explicitly, which keeps jitted functions referentially transparent.
"""

from __future__ import annotations

import dataclasses
import json
import re
from dataclasses import dataclass, field
from typing import List, Optional


@dataclass(frozen=True)
class Config:
    # ---- audio / DSP (reference hyperparams.py:4-18) ----
    num_mels: int = 80
    frame_length_ms: float = 50
    frame_shift_ms: float = 12.5
    hop_length: int = int(16000 * 0.0125)   # samples
    win_length: int = int(16000 * 0.05)     # samples
    max_db: float = 100
    ref_db: float = 20
    preemphasis: float = 0.97
    max_abs_value: float = 4.0
    symmetric_mel: bool = True
    sr: int = 16000
    n_fft: int = 2048

    # ---- synthesis / eval (reference hyperparams.py:17-22) ----
    n_iter: int = 60                 # Griffin-Lim iterations
    power: float = 1.5               # magnitude sharpening before Griffin-Lim
    max_generation_frames: int = 1100
    max_eval_batches: int = 20
    max_eval_sample_length: int = 1000
    eval_sample_per_speaker: int = 4

    # ---- model dims (reference hyperparams.py:24-35) ----
    vocab_size: int = 6000
    embed_size: int = 512
    encoder_hidden: int = 512
    decoder_hidden: int = 768
    n_encoder_layer: int = 6
    n_decoder_layer: int = 6
    n_attention_head: int = 8
    transformer_dropout_rate: float = 0.1
    decoder_dropout_rate: float = 0.5
    prenet_hidden: int = 256
    postnet_hidden: int = 512
    n_postnet_layer: int = 5

    # ---- data pipeline (reference hyperparams.py:37-50) ----
    data_format: str = "nlti"
    use_sos: bool = True
    bucket_size: int = 512
    shuffle_training_data: bool = True
    # Packing budgets, tuned on v5e over the real feeder shape lattice
    # (Tout 256..1024 at budget-implied B; SWEEP_PACKING.json /
    # tools/packing_sweep.py).  The reference ships 8000 / 7e6 (GPU-VRAM-era,
    # reference hyperparams.py:41-42); uniform 1x/2x/4x scalings measured
    # nearly flat in the mean (2323 / 2335 / 2296 audio_s/s/chip) because
    # the chip is compute-bound at every lattice point — but the per-Tout
    # optima differ: B=16 wins at Tout=448 (2628 vs 2541 at B=32), B=32 at
    # Tout=256 (2614), and the Tout>=832 tail needs the quad budget doubled
    # to stay on the B=8 batch lattice (2395 vs 2094 at B=6).  The pair
    # below selects exactly those per-Tout winners: frame limit 1.25x the
    # reference (B = 32/16/8/8/8 at Tout 256/448/640/832/1024), quad limit
    # 2x so the frame limit — not the attention proxy — binds the tail.
    batch_frame_limit: int = 10000
    batch_frame_quad_limit: int = 14000000
    balanced_training: bool = True
    lg_prob_scale: float = 0.2
    adapt_start_step: int = 30000
    adapt_end_step: int = 30000
    final_adapt_rate: float = 0.25
    data_warmup_steps: int = 30000
    target_length_lower_bound: int = 240
    target_length_upper_bound: int = 800

    # ---- regularization (reference hyperparams.py:52) ----
    reg_weight: float = 5e-9

    # ---- speaker / language conditioning (reference hyperparams.py:54-61) ----
    multi_speaker: bool = True
    max_num_speaker: int = 1000
    speaker_embedding_size: int = 128
    multi_lingual: bool = True
    max_num_language: int = 100
    language_net_hidden: int = 128
    language_embedding_size: int = 128

    # ---- optimization (reference hyperparams.py:63-68) ----
    warmup_steps: int = 50000
    max_lr: float = 1e-3
    min_lr: float = 1e-5
    lr_decay_step: int = 550000
    lr_decay_rate: float = 1e-2
    adam_eps: float = 5e-8
    # torch.optim.Adam defaults used by the reference (train.py:130)
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999

    # ---- external embeddings (reference hyperparams.py:70-71) ----
    external_embed_dim: int = 1024
    use_external_embed: bool = False

    # ---- TPU-native additions (no reference equivalent) ----
    # Shape lattice: pad (T_in, T_out, B) up to these multiples so XLA compiles a
    # bounded set of kernels instead of one per dynamic shape (SURVEY.md section 7
    # hard-part 1).  Set to 1 to disable quantization.
    input_length_multiple: int = 32
    target_length_multiple: int = 64
    batch_size_multiple: int = 8
    # Numerics: run matmuls in bf16 with fp32 accumulation on the MXU.
    use_bfloat16: bool = True
    # Mesh axis sizes; data axis is scaled to the available devices at runtime
    # when left at -1.
    mesh_data_axis: int = -1
    mesh_model_axis: int = 1
    # Use Pallas kernels for attention where applicable (falls back to the jnp
    # reference path automatically on CPU).
    use_pallas_attention: bool = True
    # Fused per-frame decoder kernel for deterministic AR synthesis
    # (ops/pallas_decode.py): one Pallas call per frame runs all decoder
    # layers and streams only the <=step KV-cache prefix.  Default OFF:
    # measured SLOWER than the XLA KV-cache decode on v5e at the flagship
    # shape (device-side, B=8, 512-frame cap: fused 185 ms vs XLA 173 ms per
    # decode; tools/tpu_decode_check.py) — the XLA while_loop
    # body is already launch-bound, so saving cache-prefix HBM reads does not
    # pay for the kernel's per-block VPU work.  Kept as a parity-tested option
    # (bf16 on-chip parity 0.09 max mel diff over 512 AR frames); dropout-on
    # decode, self-alignment collection, and non-128-multiple decoder widths
    # fall back to the XLA path automatically.
    use_pallas_decode: bool = False
    # Single-pass fused Adam update kernel (ops/fused_adam.py).  Default OFF:
    # measured SLOWER than the optax chain on v5e (30.1 vs 29.0 ms/step) --
    # XLA fuses the Adam update into the weight-gradient matmul epilogues,
    # which an opaque custom call forecloses.  Kept as a tested option for
    # backends/configs where that fusion doesn't happen.
    use_fused_adam: bool = False
    # One-pass fused LayerNorm BACKWARD kernel (ops/fused_layernorm.py):
    # dx + dgamma + dbeta in a single HBM stream where XLA's LN-backward
    # reduce fusions measured 3.8x their bytes/bandwidth bound
    # (SOL_r05.json: 2.89 ms vs 0.76 ms bound at B=16/192/448).  Default ON
    # by measurement (tools/fused_ln_check.py, FUSED_LN_r05.json): step
    # 26.99 -> 26.85 ms; the profile shows the LN-backward custom calls at
    # ~0.7 ms — AT the HBM bound — though XLA reshuffling absorbs part of
    # the category win elsewhere.  The FORWARD stays plain jnp so XLA keeps
    # fusing the normalize into neighbors (an all-Pallas LN measured a wash:
    # 27.04 ms).  Off-TPU backends always use the jnp path.
    use_fused_layernorm: bool = True
    # Ship mel targets host->device as int16 (dequantized to fp32 inside the
    # jitted step; quantization step = max_abs_value/32767 ~ 1.2e-4).  Halves
    # the per-step H2D payload — the measured wall-vs-device residual on
    # bandwidth-limited links (train/loop.py quantize_wire_mels).
    wire_mel_int16: bool = True
    # Evaluate the postnet's k=5 SAME convs as matmuls (models/tacotron.py
    # MatmulConv1D; param-path identical to nn.Conv).  Default OFF by
    # measurement: both the wide-concat and sum-of-5 evaluations are SLOWER
    # than XLA's conv at the flagship step (27.07-27.34 vs 26.69-26.80 ms;
    # CONV_AB_r05.json / CONV_AB_r05_sum5.json, tools/step_ab.py).
    conv_as_matmul: bool = False
    # Gradient checkpointing (rematerialization) of encoder/decoder layers.
    remat: bool = False
    # PRNG implementation for training dropout keys.  'rbg' uses the TPU's
    # hardware RngBitGenerator: the default threefry spends ~57 ms/step
    # generating dropout masks for the attention-weight tensors (66% of the
    # whole step, measured); rbg cuts the step from 87 ms to 40 ms.  Streams
    # differ from threefry, which nothing depends on.
    prng_impl: str = "rbg"

    # ------------------------------------------------------------------
    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def values(self) -> dict:
        return dataclasses.asdict(self)

    def to_json(self, indent: Optional[int] = None) -> str:
        return json.dumps(self.values(), indent=indent, sort_keys=True)

    # ---- "k=v,..." override grammar (reference utils/hparams.py:157-231,401) ----
    def parse(self, spec: str) -> "Config":
        """Parse a comma-separated ``name=value`` string and return a new Config.

        Supports the reference grammar: ``a=1,b=2.0,c=True,d=hello,e=[1,2,3]``.
        Unknown keys raise ValueError; values are cast to the field's type.
        """
        if not spec:
            return self
        updates = parse_values(spec)
        fields = {f.name: f for f in dataclasses.fields(self)}
        cast = {}
        for name, raw in updates.items():
            if name not in fields:
                raise ValueError("Unknown hyperparameter: %s" % name)
            cast[name] = _cast_value(raw, fields[name].type, name)
        return dataclasses.replace(self, **cast)


# Matches "name=value" groups; value may be a bracketed list or a scalar/string.
_PARAM_RE = re.compile(
    r"""
    (?P<name>[a-zA-Z][\w\.]*)      # hyperparameter name
    \s*=\s*
    ((?P<val>[^,\[]*)              # a scalar value
     |\[(?P<vals>[^\]]*)\])        # or a [list, of, values]
    ($|,\s*)
    """,
    re.VERBOSE,
)


def parse_values(spec: str) -> dict:
    """Parse ``k=v,...`` into a dict of raw string (or list-of-string) values."""
    results = {}
    pos = 0
    while pos < len(spec):
        m = _PARAM_RE.match(spec, pos)
        if not m:
            raise ValueError("Malformed hyperparameter string: %s" % spec[pos:])
        pos = m.end()
        name = m.group("name")
        if m.group("vals") is not None:
            results[name] = [v.strip() for v in m.group("vals").split(",")]
        else:
            results[name] = m.group("val").strip()
    return results


_TRUE = {"true", "1"}
_FALSE = {"false", "0"}


def _cast_scalar(raw: str, typ, name: str):
    if typ in ("bool", bool):
        low = raw.lower()
        if low in _TRUE:
            return True
        if low in _FALSE:
            return False
        raise ValueError("Could not parse bool for %s: %r" % (name, raw))
    if typ in ("int", int):
        return int(raw)
    if typ in ("float", float):
        return float(raw)
    return raw  # string


def _cast_value(raw, typ, name: str):
    if isinstance(typ, str):
        typ = typ.strip()
    if isinstance(raw, list):
        inner = "str"
        if isinstance(typ, str):
            m = re.match(r"List\[(\w+)\]", typ)
            if m:
                inner = m.group(1)
        return [_cast_scalar(v, inner, name) for v in raw]
    if isinstance(typ, str) and typ.startswith("Optional"):
        typ = typ[len("Optional["):-1]
    return _cast_scalar(raw, typ, name)


def default_config(**overrides) -> Config:
    return Config(**overrides)


def small_test_config(**overrides) -> Config:
    """A tiny config for CPU unit tests — same topology, small dims."""
    base = dict(
        vocab_size=300, embed_size=32, encoder_hidden=32, decoder_hidden=48,
        n_encoder_layer=2, n_decoder_layer=2, n_attention_head=4,
        prenet_hidden=16, postnet_hidden=24, n_postnet_layer=3,
        num_mels=20, max_num_speaker=16, speaker_embedding_size=8,
        max_num_language=10, language_embedding_size=8, language_net_hidden=8,
        max_generation_frames=40,
        input_length_multiple=8, target_length_multiple=8, batch_size_multiple=2,
        use_bfloat16=False, use_pallas_attention=False,
    )
    base.update(overrides)
    return Config(**base)
