"""Fused DFT+mel kernel vs the numpy reference path (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from few_shot_transformer_tts_tpu.config import default_config
from few_shot_transformer_tts_tpu.ops import dsp
from few_shot_transformer_tts_tpu.ops.mel_pallas import fused_frame_mel
from tests.test_dsp import make_wav

HP = default_config()


def test_fused_mel_matches_numpy():
    wav = make_wav(n=16000)
    ref = dsp.get_spectrograms(wav, HP)                   # includes preemphasis
    pre = dsp.preemphasis(wav.astype(np.float64), HP.preemphasis)
    out = np.asarray(fused_frame_mel(jnp.asarray(pre, jnp.float32)[None], HP,
                                     interpret=True))[0]
    assert out.shape == ref.shape
    # bf16 DFT: tolerance covers the reduced-precision matmuls only
    np.testing.assert_allclose(out, ref, atol=0.05)
    assert np.mean(np.abs(out - ref)) < 0.01


def test_fused_mel_batched_shapes():
    wav = make_wav(n=6400)
    pre = dsp.preemphasis(wav.astype(np.float64), HP.preemphasis)
    batch = np.stack([pre, pre * 0.5])
    out = np.asarray(fused_frame_mel(jnp.asarray(batch, jnp.float32), HP,
                                     interpret=True))
    assert out.shape == (2, 1 + len(wav) // HP.hop_length, HP.num_mels)
    assert np.all(out >= -4.0 - 1e-5) and np.all(out <= 4.0 + 1e-5)
