"""Single-speaker/single-language mode (multi_speaker=False,
multi_lingual=False): the reference's LJSpeech-style configuration
(reference transformer/tacotron.py:12-19,37-43 gates the speaker/language
conditioning on these hparams).  Covers a train step and AR synthesis with
no speaker ids / language vectors at all."""

import jax
import jax.numpy as jnp
import numpy as np

from few_shot_transformer_tts_tpu.config import default_config
from few_shot_transformer_tts_tpu.infer import synthesize_batch
from few_shot_transformer_tts_tpu.models import ByteToMel
from few_shot_transformer_tts_tpu.train.loop import (
    create_state, device_batch, make_train_step)

# decoder_hidden must equal the encoder memory width, which is just
# encoder_hidden with speaker/language conditioning off (the reference's
# implicit config constraint; see TransformerDecoder.setup)
HP = default_config(
    multi_speaker=False, multi_lingual=False,
    embed_size=32, encoder_hidden=32, decoder_hidden=32,
    n_encoder_layer=1, n_decoder_layer=1, n_attention_head=2,
    prenet_hidden=16, postnet_hidden=24, n_postnet_layer=2,
    vocab_size=300, use_bfloat16=False, use_pallas_attention=False,
    input_length_multiple=8, target_length_multiple=8, batch_size_multiple=2,
    max_generation_frames=24)


def _batch(b=2, t_in=16, t_out=24):
    rng = np.random.RandomState(0)
    tl = np.asarray([t_out, t_out - 6], np.int32)
    mel = rng.randn(b, t_out, HP.num_mels).astype(np.float32)
    mel[1, tl[1]:] = 0
    return dict(inputs=rng.randint(3, 255, (b, t_in)).astype(np.int32),
                input_lengths=np.asarray([t_in, t_in - 4], np.int32),
                mel_targets=mel, target_lengths=tl)


def test_train_step_without_speaker_or_language():
    model = ByteToMel(HP)
    batch = _batch()
    state = create_state(model, HP, jax.random.PRNGKey(0),
                         device_batch(batch))
    # no speaker/language parameters are created at all
    enc = state.params["encoder"]
    assert "speaker_embed" not in enc and "language_embed" not in enc
    step = make_train_step(model, HP, donate=False)
    new_state, losses = step(state, device_batch(batch),
                             jax.random.PRNGKey(1))
    assert np.isfinite(float(losses["loss"]))
    assert int(new_state.step) == 1


def test_synthesis_without_speaker_or_language():
    model = ByteToMel(HP)
    batch = _batch()
    state = create_state(model, HP, jax.random.PRNGKey(0),
                         device_batch(batch))
    out = synthesize_batch(
        model, {"params": state.params, "batch_stats": state.batch_stats},
        {"inputs": batch["inputs"], "input_lengths": batch["input_lengths"]},
        HP, deterministic=True, collect_alignments=True)
    assert out["mel_aft"].shape[0] == 2
    assert out["mel_aft"].shape[2] == HP.num_mels
    assert np.all(np.isfinite(out["mel_aft"]))


def test_inconsistent_decoder_width_raises():
    bad = HP.replace(decoder_hidden=48)
    model = ByteToMel(bad)
    batch = _batch()
    try:
        create_state(model, bad, jax.random.PRNGKey(0), device_batch(batch))
    except ValueError as e:
        assert "decoder_hidden" in str(e)
    else:
        raise AssertionError("expected ValueError for mismatched widths")
