"""Batched, jit-compiled DSP on TPU (JAX path).

TPU-first re-design of the reference's librosa/numpy feature pipeline
(reference: utils/audio.py:17-99).  Framing is a gather, the DFT runs through
``jnp.fft.rfft`` (XLA TPU FFT) or the fused Pallas DFT+mel kernel
(ops/mel_pallas.py), preemphasis/deemphasis are O(log n) associative scans, and
Griffin-Lim is a ``lax.fori_loop`` over batched STFT round trips — everything
static-shaped and fully fused by XLA.

The numpy path in ops/dsp.py is the golden reference; tests assert allclose.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from . import dsp


# ---------------------------------------------------------------------------
# elementwise / recurrence ops
# ---------------------------------------------------------------------------


def preemphasis(y: jnp.ndarray, coef: float) -> jnp.ndarray:
    """y[0], y[1:] - coef*y[:-1] along the last axis."""
    return jnp.concatenate([y[..., :1], y[..., 1:] - coef * y[..., :-1]], axis=-1)


def deemphasis(y: jnp.ndarray, coef: float) -> jnp.ndarray:
    """IIR 1/(1 - coef z^-1) along last axis via an O(log n) associative scan.

    The recurrence out[n] = y[n] + coef * out[n-1] is the composition of affine
    maps x -> a*x + b with a == coef; composing (a1,b1) then (a2,b2) gives
    (a1*a2, a2*b1 + b2).
    """
    a = jnp.full_like(y, coef)
    b = y

    def combine(l, r):
        al, bl = l
        ar, br = r
        return al * ar, ar * bl + br

    _, out = jax.lax.associative_scan(combine, (a, b), axis=-1)
    return out


# ---------------------------------------------------------------------------
# framing / STFT
# ---------------------------------------------------------------------------


def frame_signal(y: jnp.ndarray, n_fft: int, hop_length: int,
                 center: bool = True) -> jnp.ndarray:
    """[..., L] -> [..., n_frames, n_fft] overlapping frames (reflect-centered)."""
    if center:
        pad = [(0, 0)] * (y.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        y = jnp.pad(y, pad, mode="reflect")
    n_frames = 1 + (y.shape[-1] - n_fft) // hop_length
    starts = jnp.arange(n_frames) * hop_length
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    return y[..., idx]


def stft_mag(y: jnp.ndarray, hp: Config) -> jnp.ndarray:
    """[..., L] -> magnitude spectrogram [..., n_frames, 1 + n_fft//2]."""
    win = jnp.asarray(dsp._padded_window(hp.win_length, hp.n_fft), dtype=y.dtype)
    frames = frame_signal(y, hp.n_fft, hp.hop_length) * win
    return jnp.abs(jnp.fft.rfft(frames, axis=-1))


def stft(y: jnp.ndarray, hp: Config) -> jnp.ndarray:
    """Complex STFT [..., n_frames, 1 + n_fft//2] (note: frames axis first)."""
    win = jnp.asarray(dsp._padded_window(hp.win_length, hp.n_fft), dtype=y.dtype)
    frames = frame_signal(y, hp.n_fft, hp.hop_length) * win
    return jnp.fft.rfft(frames, axis=-1)


def istft(spec: jnp.ndarray, hp: Config) -> jnp.ndarray:
    """Inverse STFT by overlap-add; spec is [..., n_frames, 1 + n_fft//2]."""
    n_fft = hp.n_fft
    hop = hp.hop_length
    n_frames = spec.shape[-2]
    win = jnp.asarray(dsp._padded_window(hp.win_length, n_fft), dtype=jnp.float32)
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1).astype(jnp.float32) * win

    out_len = n_fft + hop * (n_frames - 1)
    flat_idx = (jnp.arange(n_frames) * hop)[:, None] + jnp.arange(n_fft)[None, :]

    def ola(fr):  # [n_frames, n_fft] -> [out_len]
        return jnp.zeros((out_len,), fr.dtype).at[flat_idx.reshape(-1)].add(
            fr.reshape(-1))

    batch_shape = spec.shape[:-2]
    y = jax.vmap(ola)(frames.reshape((-1, n_frames, n_fft)))
    y = y.reshape(batch_shape + (out_len,))

    win_sumsq = np.zeros(out_len, dtype=np.float64)
    wsq = np.asarray(dsp._padded_window(hp.win_length, n_fft)) ** 2
    for i in range(n_frames):  # static python loop folded into a constant
        win_sumsq[i * hop: i * hop + n_fft] += wsq
    norm = np.where(win_sumsq > np.finfo(np.float64).tiny, 1.0 / win_sumsq, 1.0)
    y = y * jnp.asarray(norm, dtype=y.dtype)
    return y[..., n_fft // 2: out_len - n_fft // 2]


# ---------------------------------------------------------------------------
# mel extraction
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("hp", "use_pallas"))
def melspectrogram(wav: jnp.ndarray, hp: Config, use_pallas: bool = False) -> jnp.ndarray:
    """Batched wav [..., L] -> normalized mel [..., T, n_mels].

    Matches dsp.get_spectrograms (reference utils/audio.py:17-54) elementwise.
    """
    y = preemphasis(wav.astype(jnp.float32), hp.preemphasis)
    if use_pallas:
        from .mel_pallas import fused_frame_mel
        return fused_frame_mel(y, hp)
    mag = stft_mag(y, hp)                                     # [..., T, F]
    basis = jnp.asarray(dsp.get_mel_basis(hp).T, dtype=jnp.float32)  # [F, M]
    mel = jnp.einsum("...tf,fm->...tm", mag, basis,
                     precision=jax.lax.Precision.HIGHEST)
    mel = 20.0 * jnp.log10(jnp.maximum(1e-5, mel))
    mel = jnp.clip((mel - hp.ref_db + hp.max_db) / hp.max_db, 1e-8, 1)
    if hp.symmetric_mel:
        mel = mel * hp.max_abs_value * 2 - hp.max_abs_value
    return mel


# ---------------------------------------------------------------------------
# Griffin-Lim vocoder (batched, on-device)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("hp",))
def griffin_lim(mag: jnp.ndarray, hp: Config) -> jnp.ndarray:
    """Batched Griffin-Lim: mag [..., T, F] -> wav [..., L].

    Same 60-iteration magnitude-projection loop as the reference
    (utils/audio.py:81-92), expressed as a fori_loop of fused STFT round trips.
    """
    def body(_, x_best):
        x_t = istft(x_best, hp)
        est = stft(x_t, hp)
        phase = est / jnp.maximum(1e-8, jnp.abs(est))
        return (mag * phase).astype(est.dtype)

    x_best = jax.lax.fori_loop(0, hp.n_iter, body, mag.astype(jnp.complex64))
    return istft(x_best, hp)


@functools.partial(jax.jit, static_argnames=("hp",))
def mel2wav(mel: jnp.ndarray, hp: Config) -> jnp.ndarray:
    """Batched normalized mel [..., T, M] -> wav (reference utils/audio.py:63-79)."""
    m = mel
    if hp.symmetric_mel:
        m = (m + hp.max_abs_value) / (2 * hp.max_abs_value)
    db = jnp.clip(m, 0, 1) * hp.max_db - hp.max_db + hp.ref_db
    amp = jnp.power(10.0, db * 0.05)                          # [..., T, M]
    inv_basis = jnp.asarray(
        np.linalg.pinv(dsp.get_mel_basis(hp)).T, dtype=jnp.float32)  # [M, F]
    mag = jnp.maximum(1e-10, jnp.einsum("...tm,mf->...tf", amp, inv_basis))
    wav = griffin_lim(mag ** hp.power, hp)
    return deemphasis(wav, hp.preemphasis)
