"""Corpus tooling: dataset adapters + the full packer pipeline end-to-end,
finishing with the packed output loaded by the training Feeder."""

import json
import os

import numpy as np
import pytest
from scipy.io import wavfile

from few_shot_transformer_tts_tpu.config import small_test_config
from few_shot_transformer_tts_tpu.corpora import datasets as ds
from few_shot_transformer_tts_tpu.corpora import process_corpus as pc
from few_shot_transformer_tts_tpu.corpora.common import CorpusWriter


def tone(dur_s, freq=220.0, sr=16000, amp=0.4, pad=0.15):
    t = np.arange(int(dur_s * sr)) / sr
    y = amp * np.sin(2 * np.pi * freq * t).astype(np.float32)
    # fade edges to look voiced in the middle only
    n_pad = int(pad * sr)
    y[:n_pad] *= np.linspace(0, 1, n_pad) ** 2
    y[-n_pad:] *= np.linspace(1, 0, n_pad) ** 2
    sil = np.zeros(n_pad, dtype=np.float32)
    return np.concatenate([sil, y, sil])


@pytest.fixture(scope="module")
def raw_datasets(tmp_path_factory):
    """Fake LJSpeech and thorsten layouts."""
    base = str(tmp_path_factory.mktemp("raw"))
    lj = os.path.join(base, "LJSpeech-1.1")
    os.makedirs(os.path.join(lj, "wavs"))
    rows = []
    for i in range(6):
        name = "LJ001-%04d" % i
        wavfile.write(os.path.join(lj, "wavs", name + ".wav"), 16000,
                      tone(1.5 + 0.2 * i, 200 + 30 * i))
        rows.append("%s|raw|Mr. Smith says sample %s." % (name, "x" * (i + 1)))
    open(os.path.join(lj, "metadata.csv"), "w").write("\n".join(rows))

    th = os.path.join(base, "thorsten-de_v02", "thorsten-de")
    os.makedirs(os.path.join(th, "wavs"))
    rows = []
    for i in range(5):
        name = "th%04d" % i
        wavfile.write(os.path.join(th, "wavs", name + ".wav"), 16000,
                      tone(2.0, 300 + 20 * i))
        rows.append("%s|Hallo Welt %s" % (name, "y" * (i + 1)))
    rows.append("thskip|Zahl 42 drin")  # digit -> skipped
    wavfile.write(os.path.join(th, "wavs", "thskip.wav"), 16000, tone(1.0))
    open(os.path.join(th, "metadata_train.csv"), "w").write("\n".join(rows))
    return base


@pytest.fixture(scope="module")
def transformed(raw_datasets, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("transformed"))
    ds.prepare_ljspeech(raw_datasets, out)
    ds.prepare_thorsten(raw_datasets, out)
    return out


def test_adapters_output_contract(transformed):
    meta = open(os.path.join(transformed, "ljspeech", "metadata.csv"),
                encoding="utf-8").read().splitlines()
    assert len(meta) == 6
    name, script, spk, lang = meta[0].split("|")
    assert name == "ljspeech_0000000000"
    assert spk == "ljspeech" and lang == "en_us"
    # abbreviation expansion
    assert "mister smith" in script.lower()
    assert os.path.exists(os.path.join(transformed, "ljspeech", "wavs",
                                       name + ".wav"))
    # thorsten: digit row skipped
    meta = open(os.path.join(transformed, "thorsten", "metadata.csv"),
                encoding="utf-8").read().splitlines()
    assert len(meta) == 5
    assert all("42" not in m for m in meta)


def test_text_helpers():
    assert ds.expand_abbreviations("Dr. Who met Mrs. Lee") == \
        "doctor Who met misess Lee"
    assert ds.strip_prosody_markers("你好#1世界#2了") == "你好世界了"
    assert ds.clean_google_script("hello [noise] abc-en x_letter a_b c") == \
        "hello ABC X a_ c"


def test_trim_wav_contract():
    # voiced tone with leading click and trailing silence
    y = tone(2.0)
    click = np.zeros(2000, dtype=np.float32)
    click[500:520] = 0.02  # tiny spike, < ref/10
    y2 = np.concatenate([click, np.zeros(6000, dtype=np.float32), y])
    out, reason = pc.trim_wav(y2, "testcorpus")
    assert out is not None
    # amplitude normalized: 95th percentile of voiced at ~0.244
    v = np.sort(np.abs(out[out != 0]))
    assert abs(v[int(len(v) * 0.95)] - 0.244) < 0.05
    # 1-20s gate
    out, reason = pc.trim_wav(tone(0.4), "testcorpus")
    assert out is None and reason == "length"
    # long internal gap -> reject
    gap = np.concatenate([tone(1.2), np.zeros(16000, np.float32), tone(1.2)])
    out, reason = pc.trim_wav(gap, "testcorpus")
    assert out is None and reason == "gap"


@pytest.fixture(scope="module")
def packed(transformed, tmp_path_factory):
    packed_dir = str(tmp_path_factory.mktemp("packed"))
    hp = small_test_config(num_mels=20)
    pc.trim_audios(None, transformed)
    pc.recollect_meta = _patch_min_samples(pc.recollect_meta)
    pc_recollect_nofilter(transformed)
    pc.build_mels(None, transformed, hp)
    pc.merge_datasets(transformed, packed_dir,
                      corpus_order=["ljspeech", "thorsten"],
                      eval_per_language=2)
    return packed_dir


def _patch_min_samples(fn):
    return fn


def pc_recollect_nofilter(transformed):
    """recollect_meta with min-speaker thresholds relaxed for the tiny set."""
    orig = pc.min_speaker_samples
    pc.min_speaker_samples = lambda c: 1
    try:
        pc.recollect_meta(None, transformed)
    finally:
        pc.min_speaker_samples = orig


def test_packed_output_contract(packed):
    assert os.path.exists(os.path.join(packed, "mels.zip"))
    lang_to_id = json.load(open(os.path.join(packed, "lang_id.json")))
    spk_to_id = json.load(open(os.path.join(packed, "spk_id.json")))
    assert lang_to_id == {"en-us": 0, "de-de": 1}
    assert set(spk_to_id) == {"ljspeech", "thorsten"}
    train = open(os.path.join(packed, "metadata.train.txt")).read().splitlines()
    evals = open(os.path.join(packed, "metadata.eval.txt")).read().splitlines()
    assert len(evals) == 4  # 2 per language
    row = train[0].split("|")
    assert row[0].endswith(".npy")
    assert row[1].isdigit()
    # mel length in metadata matches the stored mel
    import zipfile, io as iomod
    zf = zipfile.ZipFile(os.path.join(packed, "mels.zip"))
    mel = np.load(iomod.BytesIO(zf.read(row[0])))
    assert mel.shape == (int(row[1]), 20)
    assert -4.0 - 1e-5 <= mel.min() and mel.max() <= 4.0 + 1e-5


def test_packed_output_feeds_training(packed):
    from few_shot_transformer_tts_tpu.data import Feeder
    hp = small_test_config(num_mels=20, bucket_size=8, data_warmup_steps=0,
                           batch_frame_limit=2000,
                           batch_frame_quad_limit=10 ** 9)
    lang_to_id = json.load(open(os.path.join(packed, "lang_id.json")))
    spk_to_id = json.load(open(os.path.join(packed, "spk_id.json")))
    f = Feeder(os.path.join(packed, "mels.zip"),
               os.path.join(packed, "metadata.train.txt"), hp,
               spk_to_id=spk_to_id, lang_to_id=lang_to_id)
    f.global_step = 10 ** 6
    examples = f.get_examples(4)
    assert all(ex["mel_target"].shape[1] == 20 for ex in examples)
    assert all(ex["input"][0] == 2 for ex in examples)


def test_peel_edge_spikes_both_ends():
    """Pin the unified edge-peel against the two-while-loop semantics of the
    reference (reference corpora/process_corpus.py:51-75)."""
    rng = np.random.RandomState(0)
    y = np.zeros(60000, np.float32)
    y[1000:1020] = 0.05          # faint leading click (< peak/10)
    y[20000:36000] = rng.uniform(-1, 1, 16000).astype(np.float32)  # speech
    y[50000:50100] = 0.2         # short quiet trailing spike (< peak/4)
    y_abs = np.abs(y)
    spans = [[1000, 1020], [20000, 36000], [50000, 50100]]
    kept, peeled = pc._peel_edge_spikes([list(s) for s in spans], y_abs, 1.0)
    assert kept == [[20000, 36000]] and peeled == 2

    # a loud leading span survives; an empty span always peels
    spans = [[1000, 1010], [1010, 1010], [20000, 36000]]
    y_abs2 = y_abs.copy()
    y_abs2[1000:1010] = 0.9
    kept, peeled = pc._peel_edge_spikes([list(s) for s in spans], y_abs2, 1.0)
    assert kept[0] == [1000, 1010] and peeled == 0

    # isolation gate: a faint spike closer than 4096 samples is kept
    spans = [[17000, 17020], [20000, 36000]]
    kept, _ = pc._peel_edge_spikes([list(s) for s in spans], y_abs, 1.0)
    assert kept[0] == [17000, 17020]
