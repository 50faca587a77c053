import json

import pytest

from few_shot_transformer_tts_tpu.config import Config, default_config


def test_defaults_match_reference():
    # Exact defaults of reference hyperparams.py:3-72.
    hp = default_config()
    assert hp.num_mels == 80
    assert hp.hop_length == 200
    assert hp.win_length == 800
    assert hp.n_fft == 2048
    assert hp.sr == 16000
    assert hp.preemphasis == 0.97
    assert hp.max_abs_value == 4.0
    assert hp.vocab_size == 6000
    assert hp.embed_size == 512
    assert hp.encoder_hidden == 512
    assert hp.decoder_hidden == 768
    assert hp.n_encoder_layer == 6
    assert hp.n_attention_head == 8
    assert hp.transformer_dropout_rate == 0.1
    assert hp.decoder_dropout_rate == 0.5
    # deliberate divergence from the reference's 8000 / 7e6: TPU-sized
    # packing budgets, swept on-chip (SWEEP_PACKING.json, config.py comment)
    assert hp.batch_frame_limit == 10000
    assert hp.batch_frame_quad_limit == 14000000
    assert hp.lg_prob_scale == 0.2
    assert hp.final_adapt_rate == 0.25
    assert hp.reg_weight == 5e-9
    assert hp.max_num_speaker == 1000
    assert hp.max_num_language == 100
    assert hp.warmup_steps == 50000
    assert hp.max_lr == 1e-3
    assert hp.lr_decay_step == 550000
    assert hp.adam_eps == 5e-8
    assert hp.max_generation_frames == 1100


def test_parse_overrides():
    hp = default_config().parse("num_mels=40,max_lr=0.002,symmetric_mel=False,data_format=nltpi")
    assert hp.num_mels == 40
    assert hp.max_lr == 0.002
    assert hp.symmetric_mel is False
    assert hp.data_format == "nltpi"
    # original untouched
    assert default_config().num_mels == 80


def test_parse_bool_and_int_forms():
    hp = default_config().parse("use_sos=false,balanced_training=True,bucket_size=64")
    assert hp.use_sos is False
    assert hp.balanced_training is True
    assert hp.bucket_size == 64


def test_parse_unknown_key_raises():
    with pytest.raises(ValueError):
        default_config().parse("nonexistent_key=3")


def test_to_json_roundtrip():
    hp = default_config()
    values = json.loads(hp.to_json())
    assert values["num_mels"] == 80
    assert values["symmetric_mel"] is True
