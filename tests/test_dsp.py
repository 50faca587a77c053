"""DSP parity tests.

The numpy path (ops/dsp.py) is validated against torch.stft (an independent
implementation of the same center/reflect Hann STFT) and against analytic
properties of the slaney mel filterbank; the JAX path (ops/dsp_jax.py) is then
validated against the numpy path, and the Pallas kernel (when present) against
the JAX path.
"""

import numpy as np
import pytest

from few_shot_transformer_tts_tpu.config import default_config
from few_shot_transformer_tts_tpu.ops import dsp

HP = default_config()


def make_wav(n=16000 * 2, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / 16000.0
    wav = (0.5 * np.sin(2 * np.pi * 220 * t) + 0.2 * np.sin(2 * np.pi * 880 * t)
           + 0.01 * rng.randn(n))
    return wav.astype(np.float32)


def test_hann_window_periodic():
    w = dsp.hann_window(8)
    # periodic (fftbins=True): w[0] == 0 and w does NOT end at 0
    assert w[0] == 0.0
    assert w[4] == pytest.approx(1.0)
    assert w[-1] != 0.0
    # matches torch periodic hann
    import torch
    tw = torch.hann_window(8, periodic=True).numpy()
    np.testing.assert_allclose(w, tw, atol=1e-6)


def test_stft_matches_torch():
    import torch
    wav = make_wav()
    ours = dsp.stft(wav, HP.n_fft, HP.hop_length, HP.win_length)
    win = torch.hann_window(HP.win_length, periodic=True)
    theirs = torch.stft(
        torch.tensor(wav, dtype=torch.float64),
        n_fft=HP.n_fft, hop_length=HP.hop_length, win_length=HP.win_length,
        window=win.to(torch.float64), center=True, pad_mode="reflect",
        return_complex=True).numpy()
    assert ours.shape == theirs.shape == (1 + HP.n_fft // 2, 1 + len(wav) // HP.hop_length)
    # torch's window is float32-quantized; tolerance covers that only
    np.testing.assert_allclose(np.abs(ours), np.abs(theirs), atol=1e-4)


def test_mel_filterbank_properties():
    basis = dsp.mel_filterbank(16000, 2048, 80)
    assert basis.shape == (80, 1025)
    assert np.all(basis >= 0)
    # every filter has support, triangles peak once
    assert np.all(basis.max(axis=1) > 0)
    # slaney normalization: each filter integrates (over Hz) to ~2 / bandwidth * bw = const
    # check equivalently that the weighted sum over freqs matches the analytic enorm
    mel_pts = dsp._mel_to_hz(np.linspace(dsp._hz_to_mel(0), dsp._hz_to_mel(8000), 82))
    df = 8000.0 / 1024
    areas = basis.sum(axis=1) * df
    bw = (mel_pts[2:] - mel_pts[:-2]) / 2
    # triangle area = bw * peak; normalized peak=2/(2*bw) -> area ~ 1
    np.testing.assert_allclose(areas, np.ones(80), rtol=0.1)


def test_mel_scale_slaney_breakpoint():
    # linear below 1 kHz: 66.67 Hz per mel
    assert dsp._hz_to_mel(1000.0) == pytest.approx(15.0)
    assert dsp._hz_to_mel(500.0) == pytest.approx(7.5)
    assert dsp._mel_to_hz(15.0) == pytest.approx(1000.0)
    # log above
    assert dsp._mel_to_hz(15 + 27) == pytest.approx(6400.0)


def test_get_spectrograms_shape_and_range():
    wav = make_wav()
    mel = dsp.get_spectrograms(wav, HP)
    n_frames = 1 + len(np.append(wav[0], wav[1:])) // HP.hop_length
    assert mel.shape == (n_frames, 80)
    assert mel.dtype == np.float32
    assert mel.min() >= -4.0 - 1e-5
    assert mel.max() <= 4.0 + 1e-5
    assert mel.max() > 0  # voiced content present


def test_istft_roundtrip():
    wav = make_wav(n=16000)
    spec = dsp.stft(wav, HP.n_fft, HP.hop_length, HP.win_length)
    rec = dsp.istft(spec, HP.hop_length, HP.win_length)
    assert len(rec) == len(wav)
    np.testing.assert_allclose(rec, wav, atol=1e-6)


def test_preemphasis_roundtrip():
    wav = make_wav(n=4000)
    pre = dsp.preemphasis(wav, 0.97)
    rec = dsp.deemphasis(pre, 0.97)
    np.testing.assert_allclose(rec, wav, atol=1e-5)


def test_mel2wav_runs_and_reconstructs():
    hp = HP.replace(n_iter=4)  # few iterations for test speed
    wav = make_wav(n=8000)
    mel = dsp.get_spectrograms(wav, hp)
    rec = dsp.mel2wav(mel, hp)
    assert rec.ndim == 1 and len(rec) > 0
    assert np.all(np.isfinite(rec))
    # dominant frequency should survive the round trip
    def domfreq(x):
        f = np.abs(np.fft.rfft(x * np.hanning(len(x))))
        return np.argmax(f[5:]) + 5
    # mel filters are ~37 Hz wide at 220 Hz, so allow smearing of ~20 Hz (10 bins)
    assert abs(domfreq(rec[:8000]) - domfreq(wav)) <= 12


def test_split_intervals_finds_voiced_region():
    sr = 16000
    silence = np.zeros(sr // 2, dtype=np.float32)
    tone = 0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr).astype(np.float32)
    wav = np.concatenate([silence, tone, silence])
    ints = dsp.split_intervals(wav, top_db=50, frame_length=1024, hop_length=256)
    assert len(ints) >= 1
    start, end = ints[0][0], ints[-1][1]
    assert abs(start - len(silence)) < 2048
    assert abs(end - (len(silence) + len(tone))) < 4096


# ------------------------- JAX path parity -------------------------


def test_jax_melspectrogram_matches_numpy():
    import jax.numpy as jnp
    from few_shot_transformer_tts_tpu.ops import dsp_jax
    wav = make_wav()
    ref = dsp.get_spectrograms(wav, HP)
    out = np.asarray(dsp_jax.melspectrogram(jnp.asarray(wav)[None], HP))[0]
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_jax_deemphasis_matches_numpy():
    import jax.numpy as jnp
    from few_shot_transformer_tts_tpu.ops import dsp_jax
    wav = make_wav(n=3000)
    ref = dsp.deemphasis(wav.astype(np.float64), 0.97)
    out = np.asarray(dsp_jax.deemphasis(jnp.asarray(wav, dtype=jnp.float32), 0.97))
    np.testing.assert_allclose(out, ref, atol=1e-3)


def test_jax_istft_matches_numpy():
    import jax.numpy as jnp
    from few_shot_transformer_tts_tpu.ops import dsp_jax
    wav = make_wav(n=16000)
    spec_np = dsp.stft(wav, HP.n_fft, HP.hop_length, HP.win_length)
    rec_np = dsp.istft(spec_np, HP.hop_length, HP.win_length)
    spec_j = dsp_jax.stft(jnp.asarray(wav, dtype=jnp.float32)[None], HP)
    rec_j = np.asarray(dsp_jax.istft(spec_j, HP))[0]
    assert rec_j.shape == rec_np.shape
    np.testing.assert_allclose(rec_j, rec_np, atol=1e-4)


def test_jax_mel2wav_runs():
    import jax.numpy as jnp
    from few_shot_transformer_tts_tpu.ops import dsp_jax
    hp = HP.replace(n_iter=2)
    wav = make_wav(n=8000)
    mel = dsp.get_spectrograms(wav, hp)
    rec = np.asarray(dsp_jax.mel2wav(jnp.asarray(mel)[None], hp))[0]
    assert np.all(np.isfinite(rec))
    ref = dsp.mel2wav(mel, hp)
    assert abs(len(rec) - len(ref)) <= hp.hop_length
