import io
import json
import os
import zipfile

import numpy as np
import pytest

from few_shot_transformer_tts_tpu.config import small_test_config
from few_shot_transformer_tts_tpu.data import (
    Feeder, FeederEval, read_meta, group_meta, downsample_language,
    filter_eval_samples)
from few_shot_transformer_tts_tpu.data.feeder import (
    _pack_into_batches, _prepare_batch, extract_meta)
from few_shot_transformer_tts_tpu.data.zipstore import load_zip

HP = small_test_config(
    bucket_size=64, batch_frame_limit=400, batch_frame_quad_limit=200000,
    data_warmup_steps=100, target_length_lower_bound=10,
    target_length_upper_bound=50, adapt_start_step=10, adapt_end_step=20,
)

LANGS = ["en-us", "de-de", "ja-jp"]
SPK_PER_LANG = {"en-us": ["en0", "en1"], "de-de": ["de0"], "ja-jp": ["ja0"]}
N_PER_SPK = 30


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    """Synthetic packed dataset in the reference's mels.zip + metadata format."""
    root = tmp_path_factory.mktemp("data")
    rng = np.random.RandomState(0)
    rows = []
    zpath = os.path.join(root, "mels.zip")
    spk_to_id, lang_to_id = {}, {}
    with zipfile.ZipFile(zpath, "w") as zf:
        for lang in LANGS:
            lang_to_id.setdefault(lang, len(lang_to_id))
            for spk in SPK_PER_LANG[lang]:
                spk_to_id.setdefault(spk, len(spk_to_id))
                for i in range(N_PER_SPK):
                    name = "%s_%010d" % (spk, i)
                    t = int(rng.randint(8, 60))
                    mel = rng.randn(t, HP.num_mels).astype(np.float32)
                    buf = io.BytesIO()
                    np.save(buf, mel)
                    zf.writestr(name + ".npy", buf.getvalue())
                    text = "sample %s %d" % (lang, i)
                    rows.append("%s.npy|%d|%s|%s" % (name, t, text, lang))
    meta_path = os.path.join(root, "metadata.train.txt")
    open(meta_path, "w").write("\n".join(rows))
    json.dump(lang_to_id, open(os.path.join(root, "lang_id.json"), "w"))
    json.dump(spk_to_id, open(os.path.join(root, "spk_id.json"), "w"))
    return {"root": root, "zip": zpath, "meta": meta_path,
            "spk_to_id": spk_to_id, "lang_to_id": lang_to_id, "rows": rows}


def make_feeder(dataset, **kw):
    defaults = dict(zip_filename=dataset["zip"],
                    metadata_file_path=dataset["meta"], hparams=HP,
                    spk_to_id=dataset["spk_to_id"],
                    lang_to_id=dataset["lang_to_id"])
    defaults.update(kw)
    return Feeder(**defaults)


def test_read_meta_and_filters(dataset):
    with open(dataset["meta"]) as f:
        meta = read_meta(f, "nlti")
    assert len(meta) == 4 * N_PER_SPK
    with open(dataset["meta"]) as f:
        meta_en = read_meta(f, "nlti", inc_lang=["en-us"])
    assert len(meta_en) == 2 * N_PER_SPK
    with open(dataset["meta"]) as f:
        meta_spk = read_meta(f, "nlti", inc_spk=["de0"])
    assert len(meta_spk) == N_PER_SPK


def test_group_meta_temperature(dataset):
    with open(dataset["meta"]) as f:
        meta = read_meta(f, "nlti")
    g = group_meta(meta, HP)
    assert sorted(g["langs"]) == sorted(LANGS)
    sizes = np.asarray([len(g["meta"][l]) for l in g["langs"]], float)
    expected = np.power(sizes / sizes.sum(), HP.lg_prob_scale)
    expected /= expected.sum()
    np.testing.assert_allclose(g["prob"], expected, rtol=1e-6)
    # temperature flattens: smallest language gets boosted above proportional
    small_ix = int(np.argmin(sizes))
    assert g["prob"][small_ix] > sizes[small_ix] / sizes.sum()


def test_downsample_language(dataset):
    with open(dataset["meta"]) as f:
        meta = read_meta(f, "nlti")
    out = downsample_language(meta, {"en-us": 0.5})
    n_en = sum(1 for m in out if m["i"] == "en-us")
    assert n_en == N_PER_SPK  # half of 60
    out = downsample_language(meta, {"de-de": 7})
    assert sum(1 for m in out if m["i"] == "de-de") == 7


def test_filter_eval_samples(dataset):
    with open(dataset["meta"]) as f:
        meta = read_meta(f, "nlti")
    out = filter_eval_samples(meta, n_spk=1, n_sample=4)
    per_lang = {}
    for m in out:
        per_lang.setdefault(m["i"], set()).add(m["n"].split("_")[0])
    for lang, spks in per_lang.items():
        assert len(spks) <= 1
    assert len(out) <= len(LANGS) * 1 * 4


def test_extract_meta_roundtrip(dataset):
    zf = load_zip(dataset["zip"])
    row = dataset["rows"][0].split("|")
    meta = {"n": row[0], "l": row[1], "t": row[2], "i": row[3]}
    ex = extract_meta(meta, zf, HP, dataset["spk_to_id"], dataset["lang_to_id"])
    assert ex["name"] == row[0][:-4]
    assert ex["mel_target"].shape == (int(row[1]), HP.num_mels)
    assert ex["input"][0] == 2 and ex["input"][-1] == 1  # sos/eos
    assert ex["language_vec"].argmax() == dataset["lang_to_id"][row[3]]
    assert ex["speaker_id"] == dataset["spk_to_id"][row[0].split("_")[0]]


def test_packing_respects_limits(dataset):
    f = make_feeder(dataset)
    f.global_step = 10 ** 6  # no warmup filtering
    examples = f.get_examples(HP.bucket_size)
    examples.sort(key=lambda x: len(x["mel_target"]))
    batches = _pack_into_batches(examples, hparams=HP)
    assert sum(len(b) for b in batches) == len(examples)
    for b in batches:
        max_in = max(len(s["input"]) for s in b)
        max_tgt = max(len(s["mel_target"]) for s in b)
        assert len(b) * max_tgt <= HP.batch_frame_limit
        assert len(b) * (max_in ** 2 + max_tgt ** 2) <= HP.batch_frame_quad_limit


def test_prepare_batch_lattice(dataset):
    f = make_feeder(dataset)
    f.global_step = 10 ** 6
    examples = f.get_examples(16)
    batch = _prepare_batch(examples[:5], hparams=HP, pad_to_lattice=True)
    assert batch["inputs"].shape[0] % HP.batch_size_multiple == 0
    assert batch["inputs"].shape[1] % HP.input_length_multiple == 0
    assert batch["mel_targets"].shape[1] % HP.target_length_multiple == 0
    assert batch["num_valid"] == 5
    # padded rows have zero lengths
    assert np.all(batch["target_lengths"][5:] == 0)
    assert np.all(batch["input_lengths"][5:] == 0)
    # content preserved
    for i, ex in enumerate(examples[:5]):
        n = len(ex["input"])
        np.testing.assert_array_equal(batch["inputs"][i, :n], ex["input"])
        t = len(ex["mel_target"])
        np.testing.assert_allclose(batch["mel_targets"][i, :t], ex["mel_target"])


def test_warmup_filtering(dataset):
    f = make_feeder(dataset, warmup_lang=["en-us"])
    f.global_step = 1  # < data_warmup_steps
    examples = f.get_examples(40)
    for ex in examples:
        # only warmup language and length bounds
        assert ex["language_vec"].argmax() == dataset["lang_to_id"]["en-us"]
        t = len(ex["mel_target"])
        assert HP.target_length_lower_bound <= t <= HP.target_length_upper_bound
    # after warmup: all languages appear
    f.global_step = HP.data_warmup_steps + 1
    examples = f.get_examples(100)
    langs = {int(ex["language_vec"].argmax()) for ex in examples}
    assert len(langs) == 3


def test_balanced_sampling_statistics(dataset):
    f = make_feeder(dataset)
    f.global_step = 10 ** 6
    examples = f.get_examples(600)
    counts = np.zeros(3)
    for ex in examples:
        counts[int(ex["language_vec"].argmax())] += 1
    probs = counts / counts.sum()
    g = f.grouped_meta
    expect = {lang: p for lang, p in zip(g["langs"], g["prob"])}
    for lang, lid in dataset["lang_to_id"].items():
        assert probs[lid] == pytest.approx(expect[lang], abs=0.08)


def test_adapt_rate_ramp(dataset):
    f = make_feeder(dataset)
    hp = HP  # adapt_start=10, end=20, final=0.25
    f.global_step = 5
    assert f._adapt_rate() == 0.0
    f.global_step = 15
    assert f._adapt_rate() == pytest.approx(0.125)
    f.global_step = 25
    assert f._adapt_rate() == pytest.approx(0.25)


def test_adapt_language_mixing(dataset):
    f = make_feeder(dataset, adapt_lang=["ja-jp"],
                    train_lang=["en-us", "de-de"])
    f.global_step = 10 ** 6  # adapt rate = final = 0.25
    examples = f.get_examples(400)
    ja = dataset["lang_to_id"]["ja-jp"]
    n_ja = sum(1 for ex in examples if int(ex["language_vec"].argmax()) == ja)
    assert 0.15 < n_ja / len(examples) < 0.35


def test_state_dict_roundtrip_determinism(dataset):
    f1 = make_feeder(dataset)
    f2 = make_feeder(dataset)
    f1.global_step = f2.global_step = 10 ** 6
    # same seed -> same stream
    e1 = [ex["name"] for ex in f1.get_examples(20)]
    e2 = [ex["name"] for ex in f2.get_examples(20)]
    assert e1 == e2
    # save state, draw more, restore into a fresh feeder -> identical stream
    state = f1.state_dict()
    cont1 = [ex["name"] for ex in f1.get_examples(20)]
    f3 = make_feeder(dataset)
    f3.global_step = 10 ** 6
    f3.load_state_dict(state)
    cont3 = [ex["name"] for ex in f3.get_examples(20)]
    assert cont1 == cont3


def test_rank_sharding(dataset):
    f0 = make_feeder(dataset, rank=0, world_size=2)
    f1 = make_feeder(dataset, rank=1, world_size=2)
    names0 = {m["n"] for m in f0._metadata}
    names1 = {m["n"] for m in f1._metadata}
    assert not names0 & names1
    assert len(names0) + len(names1) == 4 * N_PER_SPK


def test_feeder_thread_produces_batches(dataset):
    f = make_feeder(dataset)
    f.global_step = 10 ** 6
    f.start()
    batch = f.get_batch()
    assert batch["inputs"].ndim == 2
    assert batch["mel_targets"].ndim == 3
    assert batch["inputs"].shape[0] == batch["mel_targets"].shape[0]
    assert batch["num_valid"] >= 1


def test_feeder_eval(dataset):
    fe = FeederEval(dataset["zip"], dataset["meta"], HP,
                    spk_to_id=dataset["spk_to_id"],
                    lang_to_id=dataset["lang_to_id"],
                    eval_lang=["en-us"], shuffle=True, keep_order=True,
                    pick_partial=True)
    data = fe.fetch_data()
    assert len(data) >= 1
    names = [n for b in data for n in b["names"]]
    assert all(n.startswith("en") for n in names)
    # exclusion rebuilds without the named samples
    data2 = fe.fetch_data(exclude=[names[0]])
    names2 = [n for b in data2 for n in b["names"]]
    assert names[0] not in names2


def test_feeder_eval_no_zip_synthesis_only(dataset):
    fe = FeederEval(None, dataset["meta"], HP,
                    spk_to_id=dataset["spk_to_id"],
                    lang_to_id=dataset["lang_to_id"], shuffle=False)
    data = fe.fetch_data()
    b = data[0]
    assert "mel_targets" not in b
    assert "inputs" in b and "input_spk_ids" in b


def test_feeder_thread_error_propagates(dataset):
    """A dying producer thread must surface in get_batch, not stall it."""
    f = make_feeder(dataset)
    f.global_step = 10 ** 6
    f._enqueue_next_group = lambda: (_ for _ in ()).throw(ValueError("boom"))
    f.start()
    with pytest.raises(RuntimeError, match="Feeder thread failed"):
        f.get_batch()
