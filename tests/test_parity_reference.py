"""Oracle parity: run the actual reference PyTorch implementation (read-only,
mounted at /root/reference) on the same inputs and assert teacher-forced mel
allclose after checkpoint conversion.

This is the BASELINE north-star check (SURVEY.md section 4b) executed at unit
scale: reference weights -> convert_torch_state_dict -> our flax model must
produce the same mels/stop logits in deterministic mode.  Skipped when the
reference checkout is not present.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not available")

B, TIN, TOUT = 3, 12, 16


@pytest.fixture(scope="module")
def ref_setup():
    sys.path.insert(0, REF)
    import torch
    torch.manual_seed(0)
    import hyperparams
    from transformer import tacotron as ref_tacotron

    hp_ref = hyperparams.hparams
    # shrink to test scale (same fields as small_test_config)
    hp_ref.parse(
        "vocab_size=300,embed_size=32,encoder_hidden=32,decoder_hidden=48,"
        "n_encoder_layer=2,n_decoder_layer=2,n_attention_head=4,"
        "prenet_hidden=16,postnet_hidden=24,n_postnet_layer=3,num_mels=20,"
        "max_num_speaker=16,speaker_embedding_size=8,max_num_language=10,"
        "language_embedding_size=8,language_net_hidden=8")

    model = ref_tacotron.Tacotron(hp_ref)
    ref_tacotron.initialize_variables(model)
    model.eval()  # no dropout anywhere, BN running stats
    return hp_ref, model


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.RandomState(7)
    return dict(
        inputs=rng.randint(3, 255, (B, TIN)).astype(np.int64),
        input_lengths=np.asarray([TIN, TIN - 3, TIN - 5], np.int64),
        mel_targets=rng.randn(B, TOUT, 20).astype(np.float32),
        target_lengths=np.asarray([TOUT, TOUT - 4, TOUT - 9], np.int64),
        input_spk_ids=np.asarray([0, 1, 2], np.int64),
        input_language_vecs=np.eye(10, dtype=np.float32)[[0, 1, 2]],
    )


def test_teacher_forced_parity(ref_setup, inputs):
    import torch
    import jax
    import jax.numpy as jnp
    from few_shot_transformer_tts_tpu.config import small_test_config
    from few_shot_transformer_tts_tpu.models import ByteToMel, compute_loss
    from few_shot_transformer_tts_tpu.train.converter import convert_torch_state_dict

    hp_ref, ref_model = ref_setup
    with torch.no_grad():
        ref_out = ref_model(
            inputs=torch.tensor(inputs["inputs"]),
            input_lengths=torch.tensor(inputs["input_lengths"]),
            mel_targets=torch.tensor(inputs["mel_targets"]),
            target_lengths=torch.tensor(inputs["target_lengths"]),
            input_spk_ids=torch.tensor(inputs["input_spk_ids"]),
            input_language_vecs=torch.tensor(inputs["input_language_vecs"]))

    hp = small_test_config()
    variables = convert_torch_state_dict(ref_model.state_dict())
    m = ByteToMel(hp)
    out = m.apply(variables,
                  inputs=jnp.asarray(inputs["inputs"], jnp.int32),
                  input_lengths=jnp.asarray(inputs["input_lengths"], jnp.int32),
                  mel_targets=jnp.asarray(inputs["mel_targets"]),
                  target_lengths=jnp.asarray(inputs["target_lengths"], jnp.int32),
                  input_spk_ids=jnp.asarray(inputs["input_spk_ids"], jnp.int32),
                  input_language_vecs=jnp.asarray(inputs["input_language_vecs"]),
                  train=False, collect_alignments=True)

    np.testing.assert_allclose(np.asarray(out["mel_bef"]),
                               ref_out["mel_bef"].numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["mel_aft"]),
                               ref_out["mel_aft"].numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(out["stop_logits"]),
                               ref_out["stop_logits"].numpy(), atol=2e-4)
    # alignments: ours [B,H,mem,query] must match reference layout
    ref_align = ref_out["alignments"]["encdec"][0].numpy()
    np.testing.assert_allclose(np.asarray(out["alignments"]["encdec"][0]),
                               ref_align, atol=1e-4)

    # loss parity, including the L2-regularized weight subset
    from transformer.tacotron import compute_loss as ref_compute_loss
    ref_losses = ref_compute_loss(
        ref_model, torch.tensor(inputs["mel_targets"]),
        torch.tensor(inputs["target_lengths"]), ref_out, hp_ref)
    losses = compute_loss(variables["params"],
                          jnp.asarray(inputs["mel_targets"]),
                          jnp.asarray(inputs["target_lengths"], jnp.int32),
                          out, hp)
    for key in ["loss", "bef_loss", "aft_loss", "stop_loss", "mse_loss"]:
        assert float(losses[key]) == pytest.approx(
            float(ref_losses[key]), rel=2e-3), key
    assert float(losses["l2"]) == pytest.approx(float(ref_losses["l2"]), rel=1e-5)


def test_lr_schedule_parity(ref_setup):
    from transformer.tacotron import learning_rate_schedule as ref_sched
    from few_shot_transformer_tts_tpu.models import learning_rate_schedule
    from few_shot_transformer_tts_tpu.config import default_config
    hp_ref, _ = ref_setup
    hp = default_config()
    for step in [0, 1, 49999, 50000, 50001, 100000, 600000, 1160000, 3000000]:
        ours = float(learning_rate_schedule(step, hp)) / hp.max_lr
        theirs = ref_sched(step, hp_ref)
        assert ours == pytest.approx(theirs, rel=1e-6), step


def test_pe_table_parity(ref_setup):
    from transformer.common import get_sinusoid_encoding_table
    from few_shot_transformer_tts_tpu.models.common import sinusoid_position_encoding
    ref = get_sinusoid_encoding_table(50, 48).numpy()
    ours = np.asarray(sinusoid_position_encoding(50, 48))
    np.testing.assert_allclose(ours, ref, atol=1e-6)
