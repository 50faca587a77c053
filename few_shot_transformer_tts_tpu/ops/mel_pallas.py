"""Fused STFT->mel Pallas kernel.

TPU-native re-design of the reference's feature extractor (reference
utils/audio.py:17-54: librosa FFT + mel matmul on CPU).  On the MXU an rDFT is
just two matmuls, so the whole chain — DFT (cos/sin), magnitude, mel
filterbank, dB conversion, normalization — fuses into ONE kernel pass over the
frames, with the [T, 1025] magnitude spectrogram never leaving VMEM:

  frames [BT, n_fft] @ cos/sin [n_fft, Ftile] -> re/im -> mag -> @ melW
  [Ftile, M] -> accumulate over Ftile -> 20*log10 -> clip-normalize -> [-4, 4]

Grid (T_tiles, F_tiles), F innermost, accumulating into the [Ttile, M] output
block; the dB/normalize epilogue runs on the last F tile.  The DFT matmuls run in
fp32 (quiet bins cancel catastrophically in bf16); the mel matmul is bf16 with
fp32 accumulation (all-positive operands, no cancellation).

Framing and the Hann window run in jnp (a gather + multiply XLA fuses); the
numpy path in ops/dsp.py remains the semantic reference (allclose-tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Config
from . import dsp


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.lru_cache(maxsize=4)
def _dft_mel_mats(sr: int, n_fft: int, n_mels: int, f_tile: int):
    """(cos [n_fft, Fpad], sin [n_fft, Fpad], melW [Fpad, Mpad]) numpy."""
    n_freqs = 1 + n_fft // 2
    f_pad = _round_up(n_freqs, f_tile)
    m_pad = _round_up(n_mels, 128)
    k = np.arange(n_fft)[:, None]
    f = np.arange(f_pad)[None, :]
    ang = -2.0 * np.pi * k * f / n_fft
    cos = np.cos(ang)
    sin = np.sin(ang)
    cos[:, n_freqs:] = 0.0
    sin[:, n_freqs:] = 0.0
    mel = dsp.mel_filterbank(sr, n_fft, n_mels)          # [M, n_freqs]
    mel_w = np.zeros((f_pad, m_pad))
    mel_w[:n_freqs, :n_mels] = mel.T
    return (cos.astype(np.float32), sin.astype(np.float32),
            mel_w.astype(np.float32))


def _mel_kernel(frames_ref, cos_ref, sin_ref, melw_ref, out_ref, *,
                nf: int, ref_db: float, max_db: float, max_abs: float,
                symmetric: bool):
    jf = pl.program_id(1)

    @pl.when(jf == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    frames = frames_ref[...]                              # [TT, n_fft] f32
    # DFT stays fp32: quiet bins are produced by near-total cancellation of
    # large oscillating terms, which bf16 inputs corrupt by ~10% relative
    cos = cos_ref[...]                                    # [n_fft, FT] f32
    sin = sin_ref[...]
    re = jax.lax.dot_general(frames, cos, (((1,), (0,)), ((), ())),
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)
    im = jax.lax.dot_general(frames, sin, (((1,), (0,)), ((), ())),
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)
    mag = jnp.sqrt(re * re + im * im)                     # [TT, FT] f32
    part = jax.lax.dot_general(mag.astype(jnp.bfloat16), melw_ref[...],
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    out_ref[...] += part

    @pl.when(jf == nf - 1)
    def _epilogue():
        mel = out_ref[...]
        mel_db = 20.0 * jnp.log10(jnp.maximum(1e-5, mel))
        mel_n = jnp.clip((mel_db - ref_db + max_db) / max_db, 1e-8, 1.0)
        if symmetric:
            mel_n = mel_n * max_abs * 2.0 - max_abs
        out_ref[...] = mel_n


@functools.partial(jax.jit, static_argnames=("hp", "interpret"))
def fused_frame_mel(y: jnp.ndarray, hp: Config,
                    interpret: bool = False) -> jnp.ndarray:
    """Pre-emphasized signal [..., L] -> normalized mel [..., T, n_mels]."""
    from .dsp_jax import frame_signal
    win = jnp.asarray(dsp._padded_window(hp.win_length, hp.n_fft),
                      dtype=jnp.float32)
    frames = frame_signal(y.astype(jnp.float32), hp.n_fft, hp.hop_length) * win
    batch_shape = frames.shape[:-2]
    t = frames.shape[-2]
    frames = frames.reshape((-1, hp.n_fft))               # [BT, n_fft]

    t_tile = 128
    f_tile = 256
    bt = frames.shape[0]
    bt_pad = _round_up(bt, t_tile)
    if bt_pad != bt:
        frames = jnp.pad(frames, ((0, bt_pad - bt), (0, 0)))

    cos, sin, mel_w = _dft_mel_mats(hp.sr, hp.n_fft, hp.num_mels, f_tile)
    f_pad = cos.shape[1]
    m_pad = mel_w.shape[1]
    nf = f_pad // f_tile
    cos = jnp.asarray(cos, jnp.float32)
    sin = jnp.asarray(sin, jnp.float32)
    mel_w = jnp.asarray(mel_w, jnp.bfloat16)

    kernel = functools.partial(
        _mel_kernel, nf=nf, ref_db=float(hp.ref_db), max_db=float(hp.max_db),
        max_abs=float(hp.max_abs_value), symmetric=bool(hp.symmetric_mel))
    out = pl.pallas_call(
        kernel,
        grid=(bt_pad // t_tile, nf),
        in_specs=[
            pl.BlockSpec((t_tile, hp.n_fft), lambda it, jf: (it, 0)),
            pl.BlockSpec((hp.n_fft, f_tile), lambda it, jf: (0, jf)),
            pl.BlockSpec((hp.n_fft, f_tile), lambda it, jf: (0, jf)),
            pl.BlockSpec((f_tile, m_pad), lambda it, jf: (jf, 0)),
        ],
        out_specs=pl.BlockSpec((t_tile, m_pad), lambda it, jf: (it, 0)),
        out_shape=jax.ShapeDtypeStruct((bt_pad, m_pad), jnp.float32),
        interpret=interpret,
    )(frames, cos, sin, mel_w)

    out = out[:bt, :hp.num_mels]
    return out.reshape(batch_shape + (t, hp.num_mels))
