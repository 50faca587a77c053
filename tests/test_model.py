import jax
import jax.numpy as jnp
import numpy as np
import pytest

from few_shot_transformer_tts_tpu.config import small_test_config, default_config
from few_shot_transformer_tts_tpu.models import ByteToMel, compute_loss, learning_rate_schedule
from few_shot_transformer_tts_tpu.models import common

HP = small_test_config()


def make_batch(hp=HP, B=3, Tin=12, Tout=16, seed=0):
    rng = np.random.RandomState(seed)
    return dict(
        inputs=jnp.asarray(rng.randint(3, 255, (B, Tin)), jnp.int32),
        input_lengths=jnp.asarray([Tin, Tin - 3, Tin - 5], jnp.int32),
        mel_targets=jnp.asarray(rng.randn(B, Tout, hp.num_mels), jnp.float32),
        target_lengths=jnp.asarray([Tout, Tout - 4, Tout - 9], jnp.int32),
        input_spk_ids=jnp.asarray([0, 1, 2], jnp.int32),
        input_language_vecs=jax.nn.one_hot(
            jnp.asarray([0, 1, 2]), hp.max_num_language),
    )


@pytest.fixture(scope="module")
def model_and_vars():
    m = ByteToMel(HP)
    batch = make_batch()
    variables = m.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)}, **batch, train=True)
    return m, variables


def test_forward_shapes(model_and_vars):
    m, variables = model_and_vars
    batch = make_batch()
    out = m.apply(variables, **batch, train=False)
    assert out["mel_bef"].shape == (3, 16, HP.num_mels)
    assert out["mel_aft"].shape == (3, 16, HP.num_mels)
    assert out["stop_logits"].shape == (3, 16)
    assert out["mel_bef"].dtype == jnp.float32


def test_outputs_imputed_beyond_lengths(model_and_vars):
    m, variables = model_and_vars
    batch = make_batch()
    out = m.apply(variables, **batch, train=False)
    # mel_bef and stop_logits are imputed by target_lengths (reference
    # tacotron.py:113-115)
    tl = np.asarray(batch["target_lengths"])
    mel = np.asarray(out["mel_bef"])
    stop = np.asarray(out["stop_logits"])
    for b in range(3):
        assert np.all(mel[b, tl[b]:] == 0)
        assert np.all(stop[b, tl[b]:] == 0)


def test_padding_invariance(model_and_vars):
    """Outputs for sample b must not depend on other samples' padding content."""
    m, variables = model_and_vars
    batch = make_batch()
    out1 = m.apply(variables, **batch, train=False)
    # poison the padded regions of inputs and targets
    batch2 = dict(batch)
    inputs = np.asarray(batch["inputs"]).copy()
    inputs[1, -3:] = 250
    inputs[2, -5:] = 251
    mel = np.asarray(batch["mel_targets"]).copy()
    mel[1, -4:] = 7.0
    mel[2, -9:] = -7.0
    batch2["inputs"] = jnp.asarray(inputs)
    batch2["mel_targets"] = jnp.asarray(mel)
    out2 = m.apply(variables, **batch2, train=False)
    tl = np.asarray(batch["target_lengths"])
    for b in range(3):
        np.testing.assert_allclose(
            np.asarray(out1["mel_bef"])[b, :tl[b]],
            np.asarray(out2["mel_bef"])[b, :tl[b]], atol=2e-5)


def test_train_mode_updates_batch_stats(model_and_vars):
    m, variables = model_and_vars
    batch = make_batch()
    out, muts = m.apply(variables, **batch, train=True,
                        rngs={"dropout": jax.random.PRNGKey(2)},
                        mutable=["batch_stats"])
    old = jax.tree.leaves(variables["batch_stats"])
    new = jax.tree.leaves(muts["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_dropout_changes_outputs_only_when_on(model_and_vars):
    m, variables = model_and_vars
    batch = make_batch()
    o1 = m.apply(variables, **batch, train=True,
                 rngs={"dropout": jax.random.PRNGKey(1)},
                 mutable=["batch_stats"])[0]
    o2 = m.apply(variables, **batch, train=True,
                 rngs={"dropout": jax.random.PRNGKey(2)},
                 mutable=["batch_stats"])[0]
    assert not np.allclose(o1["mel_bef"], o2["mel_bef"])
    # eval deterministic
    o3 = m.apply(variables, **batch, train=False)
    o4 = m.apply(variables, **batch, train=False)
    np.testing.assert_allclose(o3["mel_bef"], o4["mel_bef"])
    # decoder_dropout=True reproduces the reference's eval-with-decoder-dropout
    o5 = m.apply(variables, **batch, train=False, decoder_dropout=True,
                 rngs={"dropout": jax.random.PRNGKey(1)})
    o6 = m.apply(variables, **batch, train=False, decoder_dropout=True,
                 rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(o5["mel_bef"], o6["mel_bef"])


def test_loss_values(model_and_vars):
    m, variables = model_and_vars
    batch = make_batch()
    out = m.apply(variables, **batch, train=False)
    losses = compute_loss(variables["params"], batch["mel_targets"],
                          batch["target_lengths"], out, HP)
    # manual bef_loss
    diff = np.mean((np.asarray(out["mel_bef"]) -
                    np.asarray(batch["mel_targets"])) ** 2, axis=-1)
    tl = np.asarray(batch["target_lengths"])
    mask = np.arange(16)[None] < tl[:, None]
    manual = (diff * mask).sum() / tl.sum()
    assert float(losses["bef_loss"]) == pytest.approx(manual, rel=1e-5)
    assert float(losses["mse_loss"]) == pytest.approx(
        (float(losses["bef_loss"]) + float(losses["aft_loss"])) / 2, rel=1e-6)
    assert float(losses["loss"]) == pytest.approx(
        float(losses["bef_loss"]) + float(losses["aft_loss"]) +
        float(losses["l2"]) + float(losses["stop_loss"]), rel=1e-6)
    assert losses["aft_losses"].shape == (3,)
    assert float(losses["l2"]) > 0


def test_l2_mask_selects_kernels_only():
    from few_shot_transformer_tts_tpu.models.tacotron import l2_regularizable
    assert l2_regularizable(("encoder", "language_embed", "kernel"))
    assert l2_regularizable(("decoder", "mel_net", "kernel"))
    assert l2_regularizable(("postnet", "conv_layers_0", "kernel"))
    assert not l2_regularizable(("encoder", "embed", "embedding"))
    assert not l2_regularizable(("encoder", "speaker_embed", "embedding"))
    assert not l2_regularizable(("encoder", "encoder", "attn_layer_norms_0", "scale"))
    assert not l2_regularizable(("postnet", "batchnorm_layers_0", "bias"))
    assert not l2_regularizable(("encoder", "encoder", "pe_scale"))


def test_stop_bce_pos_weight():
    # single-frame check of the pos_weight=5 BCE formula
    hp = HP
    logits = jnp.asarray([[2.0, -3.0]])
    targets = jnp.asarray([[0.0, 1.0]])
    lengths = jnp.asarray([2])
    outputs = {"mel_bef": jnp.zeros((1, 2, hp.num_mels)),
               "mel_aft": jnp.zeros((1, 2, hp.num_mels)),
               "stop_logits": logits}
    # construct mel targets zero so mse terms are 0
    losses = compute_loss({}, jnp.zeros((1, 2, hp.num_mels)), lengths, outputs, hp)
    import torch
    ref = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.tensor([[2.0, -3.0]]), torch.tensor([[0.0, 1.0]]),
        reduction="none", pos_weight=torch.tensor([5.0])).numpy()
    manual = ref.sum() / 2
    assert float(losses["stop_loss"]) == pytest.approx(manual, rel=1e-5)


def test_learning_rate_schedule_matches_reference_formula():
    hp = default_config()
    # constant max_lr through warmup
    assert float(learning_rate_schedule(0, hp)) == pytest.approx(1e-3)
    assert float(learning_rate_schedule(50000, hp)) == pytest.approx(1e-3)
    # decay: 1e-2 per 550k after warmup
    lr = float(learning_rate_schedule(50000 + 550000, hp))
    assert lr == pytest.approx(1e-5, rel=1e-4)
    lr = float(learning_rate_schedule(50000 + 275000, hp))
    assert lr == pytest.approx(1e-4, rel=1e-4)
    # floor at min_lr
    assert float(learning_rate_schedule(5_000_000, hp)) == pytest.approx(1e-5)


def test_sinusoid_pe_layout():
    # [sin | cos] concatenated layout (reference transformer/common.py:27)
    pe = np.asarray(common.sinusoid_position_encoding(10, 8))
    half = 4
    np.testing.assert_allclose(pe[0, :half], 0.0, atol=1e-7)       # sin(0)
    np.testing.assert_allclose(pe[0, half:], 1.0, atol=1e-7)       # cos(0)
    np.testing.assert_allclose(pe[1, 0], np.sin(1.0), atol=1e-6)
    np.testing.assert_allclose(pe[1, half], np.cos(1.0), atol=1e-6)
    # timescale layout: channel i uses 1e4^(-i/(half-1))
    inc = np.exp(np.arange(half) * -(np.log(1e4) / (half - 1)))
    np.testing.assert_allclose(pe[1, :half], np.sin(inc), atol=1e-6)


def test_initializer_statistics():
    m = ByteToMel(HP)
    batch = make_batch()
    variables = m.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)}, **batch, train=True)
    p = variables["params"]
    # byte embedding ~ N(0, 1)
    emb = np.asarray(p["encoder"]["embed"]["embedding"])
    assert 0.9 < emb.std() < 1.1
    # speaker embedding truncated normal(0, 0.5): bounded by 2 std = 1.0
    spk = np.asarray(p["encoder"]["speaker_embed"]["embedding"])
    assert np.abs(spk).max() <= 1.0 + 1e-6
    assert 0.3 < spk.std() < 0.6
    # variance-scaling kernel: std ~ sqrt(1.3 * 2 / n)
    k = np.asarray(p["decoder"]["decoder"]["ffn_layers_0"]["input_layer"]["kernel"])
    n = (k.shape[0] + k.shape[1]) / 2
    expected = np.sqrt(1.3 * 2.0 / n)
    assert 0.7 * expected < k.std() < 1.1 * expected
    # biases zero
    b = np.asarray(p["decoder"]["prenet"]["dense0"]["bias"])
    assert np.all(b == 0)
    # pe_scale scalar 1
    assert np.asarray(p["encoder"]["encoder"]["pe_scale"]) == 1.0


def test_leave_one_zeroes_last_prenet_frame(model_and_vars):
    m, variables = model_and_vars
    batch = make_batch()

    def run(leave_one):
        def fn(mdl):
            enc = mdl.encoder(batch["inputs"], batch["input_lengths"],
                              batch["input_spk_ids"],
                              batch["input_language_vecs"], deterministic=True)
            return mdl.decoder(enc, batch["input_lengths"],
                               batch["mel_targets"], batch["target_lengths"],
                               leave_one=leave_one, deterministic=True)
        return ByteToMel(HP).apply(variables, method=fn)

    mel_a, _, _ = run(False)
    mel_b, _, _ = run(True)
    # leave_one only affects the last target position's prenet output, which is
    # dropped by the decoder's shift-right — so teacher-forced outputs match.
    np.testing.assert_allclose(np.asarray(mel_a), np.asarray(mel_b), atol=1e-5)


def test_pallas_branch_matches_jnp_branch(model_and_vars):
    """The fused-kernel attention branch (forced via interpret mode) must
    reproduce the jnp path's teacher-forced outputs."""
    import os
    m, variables = model_and_vars
    batch = make_batch()
    ref = m.apply(variables, **batch, train=False)
    hp_k = HP.replace(use_pallas_attention=True)
    os.environ["FSTTS_PALLAS_INTERPRET"] = "1"
    try:
        out = ByteToMel(hp_k).apply(variables, **batch, train=False)
    finally:
        del os.environ["FSTTS_PALLAS_INTERPRET"]
    np.testing.assert_allclose(np.asarray(out["mel_bef"]),
                               np.asarray(ref["mel_bef"]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["stop_logits"]),
                               np.asarray(ref["stop_logits"]), atol=2e-4)
