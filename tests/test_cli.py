"""CLI surface tests: synthesize.py end-to-end with a native checkpoint and a
reference-format torch checkpoint; scaling harness mechanics."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from few_shot_transformer_tts_tpu.config import small_test_config

HP = small_test_config(n_iter=2, max_generation_frames=10)
HP_SPEC = ("vocab_size=300,embed_size=32,encoder_hidden=32,decoder_hidden=48,"
           "n_encoder_layer=2,n_decoder_layer=2,n_attention_head=4,"
           "prenet_hidden=16,postnet_hidden=24,n_postnet_layer=3,num_mels=20,"
           "max_num_speaker=16,speaker_embedding_size=8,max_num_language=10,"
           "language_embedding_size=8,language_net_hidden=8,n_iter=2,"
           "max_generation_frames=10,input_length_multiple=8,"
           "target_length_multiple=8,batch_size_multiple=2,"
           "use_bfloat16=False,use_pallas_attention=False")


@pytest.fixture(scope="module")
def script_setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cli"))
    json.dump({"en-us": 0, "de-de": 1},
              open(os.path.join(root, "lang_id.json"), "w"))
    json.dump({"spk0": 0, "spk1": 1},
              open(os.path.join(root, "spk_id.json"), "w"))
    open(os.path.join(root, "script.txt"), "w", encoding="utf-8").write(
        "spk0_0|50|hello world|en-us\nspk1_0|50|hallo welt|de-de\n")
    return root


def _make_native_ckpt(root):
    import jax
    from few_shot_transformer_tts_tpu.models import ByteToMel
    from few_shot_transformer_tts_tpu.train.loop import create_state
    from few_shot_transformer_tts_tpu.train import checkpoint as ckpt_lib
    from __graft_entry__ import _example_batch
    model = ByteToMel(HP)
    batch = _example_batch(HP, b=2, t_in=10, t_out=12)
    state = create_state(model, HP, jax.random.PRNGKey(0), batch)
    return ckpt_lib.save_state(root, jax.device_get(state), 1)


def test_synthesize_cli_native_checkpoint(script_setup):
    sys.path.insert(0, "/root/repo")
    ckpt = _make_native_ckpt(script_setup)
    out_dir = os.path.join(script_setup, "out_native")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "/root/repo/synthesize.py", "--checkpoint", ckpt,
         "--script", os.path.join(script_setup, "script.txt"),
         "--data-dir", script_setup, "--output-dir", out_dir,
         "--hparams", HP_SPEC, "--deterministic"],
        capture_output=True, text=True, env=env, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    files = os.listdir(out_dir)
    assert "spk0_0.npy" in files, files
    assert "spk1_0.wav" in files, files


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference not available")
def test_synthesize_cli_reference_torch_checkpoint(script_setup, tmp_path):
    # build a reference-format torch checkpoint at test scale
    sys.path.insert(0, "/root/reference")
    import torch
    import hyperparams
    from transformer import tacotron as ref_tacotron
    hp_ref = hyperparams.hparams
    hp_ref.parse(HP_SPEC.replace(",n_iter=2", "").replace(
        ",max_generation_frames=10", "").split(",input_length_multiple")[0])
    model = ref_tacotron.Tacotron(hp_ref)
    ckpt = os.path.join(str(tmp_path), "model.ckpt-5")
    torch.save({"model": model.state_dict(), "step": 5}, ckpt)

    out_dir = os.path.join(script_setup, "out_torch")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "/root/repo/synthesize.py", "--checkpoint", ckpt,
         "--script", os.path.join(script_setup, "script.txt"),
         "--data-dir", script_setup, "--output-dir", out_dir,
         "--hparams", HP_SPEC, "--deterministic"],
        capture_output=True, text=True, env=env, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "spk0_0.wav" in os.listdir(out_dir)


def test_scaling_harness_mechanics():
    from few_shot_transformer_tts_tpu.parallel.scaling import measure
    res = measure(HP, per_device_batch=2, t_in=8, t_out=8, degrees=[1, 2],
                  steps=2)
    assert len(res) == 2
    assert res[0]["devices"] == 1 and res[1]["devices"] == 2
    assert res[0]["efficiency"] == 1.0
    assert all(np.isfinite(r["audio_s_per_sec"]) for r in res)
