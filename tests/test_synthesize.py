import jax
import jax.numpy as jnp
import numpy as np
import pytest

from few_shot_transformer_tts_tpu.config import small_test_config
from few_shot_transformer_tts_tpu.models import ByteToMel
from few_shot_transformer_tts_tpu.infer import synthesize_batch

HP = small_test_config()


@pytest.fixture(scope="module")
def model_and_vars():
    m = ByteToMel(HP)
    rng = np.random.RandomState(0)
    batch = dict(
        inputs=jnp.asarray(rng.randint(3, 255, (2, 10)), jnp.int32),
        input_lengths=jnp.asarray([10, 7], jnp.int32),
        mel_targets=jnp.zeros((2, 12, HP.num_mels), jnp.float32),
        target_lengths=jnp.asarray([12, 9], jnp.int32),
        input_spk_ids=jnp.asarray([0, 1], jnp.int32),
        input_language_vecs=jax.nn.one_hot(jnp.asarray([0, 1]),
                                           HP.max_num_language),
    )
    variables = m.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)}, **batch, train=True)
    return m, variables


def make_input_batch(B=2, Tin=10, seed=3):
    rng = np.random.RandomState(seed)
    return dict(
        inputs=rng.randint(3, 255, (B, Tin)).astype(np.int32),
        input_lengths=np.asarray([Tin, Tin - 3][:B], np.int32),
        input_spk_ids=np.arange(B, dtype=np.int32),
        input_language_vecs=np.eye(HP.max_num_language, dtype=np.float32)[:B],
        names=["s%d" % i for i in range(B)],
    )


def test_synthesis_output_contract(model_and_vars):
    m, variables = model_and_vars
    batch = make_input_batch()
    out = synthesize_batch(m, variables, batch, HP, deterministic=True,
                           max_frames=20)
    n = out["mel_pre"].shape[1]
    assert out["mel_pre"].shape == (2, n, HP.num_mels)
    assert out["mel_aft"].shape == (2, n, HP.num_mels)
    assert len(out["generated_lengths"]) == 2
    assert out["names"] == ["s0", "s1"]
    assert np.all(np.isfinite(out["mel_pre"]))
    # alignments: list per decoder layer of [B, H, T_enc, T_dec]
    enc_aligns = out["alignments"]["encdec"]
    assert len(enc_aligns) == HP.n_decoder_layer
    assert enc_aligns[0].shape == (2, HP.n_attention_head, 10, n)
    # attention rows over valid memory sum to ~1
    s = enc_aligns[0][0, 0, :, 0].sum()
    assert s == pytest.approx(1.0, abs=1e-3)


def test_incremental_decode_matches_teacher_forced(model_and_vars):
    """Deterministic AR output must be self-consistent: running the
    teacher-forced decoder on the generated mels reproduces them exactly.
    This validates KV-cache correctness against the full-sequence path."""
    m, variables = model_and_vars
    batch = make_input_batch()
    out = synthesize_batch(m, variables, batch, HP, deterministic=True,
                           max_frames=16)
    gen = out["mel_pre"]          # [B, n, M]
    n = gen.shape[1]
    lengths = np.minimum(np.asarray(out["generated_lengths"]), n)

    tf_out = m.apply(variables,
                     inputs=jnp.asarray(batch["inputs"]),
                     input_lengths=jnp.asarray(batch["input_lengths"]),
                     mel_targets=jnp.asarray(gen),
                     target_lengths=jnp.asarray(lengths, jnp.int32),
                     input_spk_ids=jnp.asarray(batch["input_spk_ids"]),
                     input_language_vecs=jnp.asarray(batch["input_language_vecs"]),
                     train=False)
    tf_mel = np.asarray(tf_out["mel_bef"])
    for b in range(gen.shape[0]):
        np.testing.assert_allclose(tf_mel[b, :lengths[b]], gen[b, :lengths[b]],
                                   atol=2e-4)


def test_stop_latches_and_lengths_freeze(model_and_vars):
    m, variables = model_and_vars
    # bias the stop net so stop fires immediately; rebuild the tree so the
    # shared fixture is not mutated
    v2 = jax.tree_util.tree_map(lambda x: x, variables)
    v2["params"]["decoder"]["stop_net"]["bias"] = jnp.asarray([100.0])
    batch = make_input_batch()
    out = synthesize_batch(m, v2, batch, HP, deterministic=True, max_frames=16)
    # every sample stops at the first frame
    assert all(l == 1 for l in out["generated_lengths"])
    assert out["mel_pre"].shape[1] == 1  # loop exits after one step


def test_batch_padding_does_not_change_results(model_and_vars):
    """Lattice padding of batch/length must not alter per-sample outputs."""
    m, variables = model_and_vars
    b1 = make_input_batch(B=2, Tin=10)
    out1 = synthesize_batch(m, variables, b1, HP, deterministic=True,
                            max_frames=12)
    # single-sample batch of sample 0 (padded differently)
    b2 = dict(inputs=b1["inputs"][:1], input_lengths=b1["input_lengths"][:1],
              input_spk_ids=b1["input_spk_ids"][:1],
              input_language_vecs=b1["input_language_vecs"][:1], names=["s0"])
    out2 = synthesize_batch(m, variables, b2, HP, deterministic=True,
                            max_frames=12)
    l0 = min(out1["generated_lengths"][0], out2["generated_lengths"][0],
             out1["mel_pre"].shape[1], out2["mel_pre"].shape[1])
    np.testing.assert_allclose(out1["mel_pre"][0][:l0], out2["mel_pre"][0][:l0],
                               atol=2e-4)


def test_dropout_mode_produces_different_outputs(model_and_vars):
    m, variables = model_and_vars
    batch = make_input_batch()
    o1 = synthesize_batch(m, variables, batch, HP, deterministic=False,
                          rng=jax.random.PRNGKey(1), max_frames=8)
    o2 = synthesize_batch(m, variables, batch, HP, deterministic=False,
                          rng=jax.random.PRNGKey(2), max_frames=8)
    assert not np.allclose(o1["mel_pre"], o2["mel_pre"])
    # same rng -> reproducible
    o3 = synthesize_batch(m, variables, batch, HP, deterministic=False,
                          rng=jax.random.PRNGKey(1), max_frames=8)
    np.testing.assert_allclose(o1["mel_pre"], o3["mel_pre"], atol=1e-6)


def test_save_eval_results(tmp_path, model_and_vars):
    m, variables = model_and_vars
    batch = make_input_batch()
    hp = HP.replace(n_iter=2)
    out = synthesize_batch(m, variables, batch, hp, deterministic=True,
                           max_frames=12)
    from few_shot_transformer_tts_tpu.infer import save_eval_results
    save_eval_results(**out, output_dir=str(tmp_path), hp=hp,
                      save_trimmed_wave=True)
    import os
    files = os.listdir(tmp_path)
    for n in ["s0.npy", "s0.wav", "s0_trim.wav", "s1.npy", "s1.wav"]:
        assert n in files, files


def test_vocode_batch_matches_numpy_path(model_and_vars):
    """Batched on-device Griffin-Lim produces waveforms comparable to the
    per-sample numpy path (same algorithm; float/order differences only)."""
    from few_shot_transformer_tts_tpu.infer import vocode_batch
    from few_shot_transformer_tts_tpu.ops import dsp
    hp = HP.replace(n_iter=2)
    rng = np.random.RandomState(0)
    T = 30
    mel = np.clip(rng.randn(2, T, hp.num_mels) * 1.5, -4, 4).astype(np.float32)
    lengths = [T, 18]
    wavs = vocode_batch(mel, lengths, hp)
    assert len(wavs[0]) == (T - 1) * hp.hop_length
    assert len(wavs[1]) == 17 * hp.hop_length
    ref = dsp.mel2wav(mel[0], hp)
    n = min(len(ref), len(wavs[0]))
    # Griffin-Lim phase estimates drift between implementations; compare
    # envelopes rather than samples
    e1 = np.sqrt(np.convolve(wavs[0][:n] ** 2, np.ones(400) / 400, "valid"))
    e2 = np.sqrt(np.convolve(ref[:n] ** 2, np.ones(400) / 400, "valid"))
    corr = np.corrcoef(e1, e2)[0, 1]
    assert corr > 0.9, corr


def test_decode_self_alignments_match_teacher_forced(model_and_vars):
    """collect_self_alignments=True returns the decoder self-attention in the
    reference's [B, H, T_mem, T_query] layout; with deterministic decode the
    rows must equal the teacher-forced self-attention over the generated mels
    (same check shape as the incremental-decode parity test; ADVICE.md r2)."""
    m, variables = model_and_vars
    batch = make_input_batch()
    out = synthesize_batch(m, variables, batch, HP, deterministic=True,
                           max_frames=16, collect_self_alignments=True)
    gen = out["mel_pre"]
    n = gen.shape[1]
    lengths = np.minimum(np.asarray(out["generated_lengths"]), n)

    tf_out = m.apply(variables,
                     inputs=jnp.asarray(batch["inputs"]),
                     input_lengths=jnp.asarray(batch["input_lengths"]),
                     mel_targets=jnp.asarray(gen),
                     target_lengths=jnp.asarray(lengths, jnp.int32),
                     input_spk_ids=jnp.asarray(batch["input_spk_ids"]),
                     input_language_vecs=jnp.asarray(
                         batch["input_language_vecs"]),
                     train=False, collect_alignments=True)
    self_dec = out["alignments"]["self"]        # list/layer of [B,H,mem,q]
    assert len(self_dec) == HP.n_decoder_layer
    for layer in range(HP.n_decoder_layer):
        tf_a = np.asarray(tf_out["alignments"]["self"][layer])  # [B,H,mem,q]
        dec_a = self_dec[layer]
        for b in range(gen.shape[0]):
            l = int(lengths[b])
            # causal rows: each query q attends over mem <= q
            np.testing.assert_allclose(dec_a[b, :, :l, :l],
                                       tf_a[b, :, :l, :l], atol=2e-4)
        # rows are normalized over the causal prefix
        col = dec_a[0, 0, :int(lengths[0]), int(lengths[0]) - 1]
        assert col.sum() == pytest.approx(1.0, abs=1e-3)
