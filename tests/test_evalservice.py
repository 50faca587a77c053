"""Eval service end-to-end: train a few steps, then run the watcher in
one-shot mode over the produced checkpoint and check wavs + metrics."""

import io
import json
import os
import zipfile

import numpy as np
import pytest

from few_shot_transformer_tts_tpu.config import small_test_config

HP = small_test_config(warmup_steps=2)


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    import sys
    sys.path.insert(0, "/root/repo")
    from few_shot_transformer_tts_tpu.train.loop import train

    root = str(tmp_path_factory.mktemp("run"))
    rng = np.random.RandomState(0)
    rows = []
    spk_to_id, lang_to_id = {}, {}
    with zipfile.ZipFile(os.path.join(root, "mels.zip"), "w") as zf:
        for lang in ["en-us", "de-de"]:
            lang_to_id.setdefault(lang, len(lang_to_id))
            spk = lang[:2] + "0"
            spk_to_id.setdefault(spk, len(spk_to_id))
            for i in range(8):
                name = "%s_%010d" % (spk, i)
                t = int(rng.randint(10, 24))
                mel = rng.randn(t, HP.num_mels).astype(np.float32)
                buf = io.BytesIO()
                np.save(buf, mel)
                zf.writestr(name + ".npy", buf.getvalue())
                rows.append("%s.npy|%d|hello %d|%s" % (name, t, i, lang))
    open(os.path.join(root, "metadata.train.txt"), "w").write("\n".join(rows))
    open(os.path.join(root, "metadata.eval.txt"), "w").write(
        "\n".join(rows[:2] + rows[8:10]))
    json.dump(lang_to_id, open(os.path.join(root, "lang_id.json"), "w"))
    json.dump(spk_to_id, open(os.path.join(root, "spk_id.json"), "w"))

    class Args:
        model_dir = os.path.join(root, "models")
        log_dir = os.path.join(root, "logs")
        data_dir = root
        zipfilepath = None
        train_meta = None
        eval_meta = None
        adapt_languages = adapt_speakers = training_languages = None
        training_speakers = eval_languages = eval_speakers = None
        warmup_languages = warmup_speakers = exclude_speakers = None
        adapt_samples = downsample_languages = None
        eval_steps = "-1"  # suppress inline eval
        checkpoint_interval = 2
        summary_interval = 10
        restore_from = None
        multihost = False
        max_steps = 2
        seed = 0

    hp = HP.replace(bucket_size=16, data_warmup_steps=0, n_iter=2,
                    max_generation_frames=12)
    train(Args(), hp)
    return root, hp


def test_eval_service_one_shot(trained_run):
    from few_shot_transformer_tts_tpu.infer import evalservice

    root, hp = trained_run

    class EvalArgs:
        model_dir = os.path.join(root, "models")
        log_dir = os.path.join(root, "eval_logs")
        data_dir = root
        no_wait = True
        zipfilepath = None
        eval_meta = None
        eval_languages = None
        eval_speakers = None
        exclude_speakers = None
        recover_eval = None
        start_step = 0
        eval_steps = None
        eval_interval = 2
        scan_interval = 1

    evalservice.main(EvalArgs(), hp)

    eval_dir = os.path.join(root, "eval_logs", "eval_2")
    assert os.path.isdir(eval_dir)
    files = os.listdir(eval_dir)
    wavs = [f for f in files if f.endswith(".wav") and "_trim" not in f]
    assert len(wavs) >= 2
    assert any(f.endswith("_trim.wav") for f in files)
    assert any(f.endswith(".npy") for f in files)
    # DTW-MSE scalars written per language
    metrics = [json.loads(l) for l in
               open(os.path.join(root, "eval_logs", "metrics.jsonl"))]
    tags = {m["tag"] for m in metrics}
    assert any(t.startswith("mse_dtw") for t in tags), tags
