"""Training/eval data feeders.

Reproduces the full semantics of the reference loader (reference
dataloader.py:25-508): background producer thread with a bounded queue,
language-balanced sampling with temperature 0.2, adaptation-rate ramp,
data-warmup filtering, speaker exclusion, language downsampling, greedy
quad-limit batch packing, per-rank metadata sharding ([rank::world_size]) with
per-rank RNG seeds, and a resumable state dict.

TPU-first change: padded batch shapes are quantized to a lattice
(input/target/batch multiples from the config) so XLA compiles a bounded set
of train-step kernels instead of one per dynamic shape (SURVEY.md section 7
hard-part 1).  Rows added by batch padding carry length 0 and drop out of every
masked loss term exactly.

One reference bug is intentionally fixed: reference
``Feeder.load_state_dict`` (dataloader.py:137-138) writes the live adapt
offset back into the restored state instead of restoring it; here the adapt
offset round-trips.
"""

from __future__ import annotations

import logging
import queue
import sys
import threading
import time
import traceback
from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np

from ..config import Config
from ..frontend.text import text_to_byte_sequence
from .metadata import (read_meta, group_meta, downsample_language,
                       filter_eval_samples, speaker_of)
from .zipstore import load_zip


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_FEEDER_ERROR = object()  # queue sentinel: producer thread died


class Feeder(threading.Thread):
    """Training feeder (reference dataloader.py:25-218)."""

    def __init__(self, zip_filename, metadata_file_path, hparams: Config,
                 spk_to_id=None, lang_to_id=None, rank=0, world_size=1,
                 adapt_lang=None, adapt_spk=None, train_lang=None,
                 train_spk=None, exclude_spk=None, downsample_lang=None,
                 adapt_samples=None, warmup_lang=None, warmup_spk=None):
        super().__init__()
        self._offset = 0
        self._epoch = 0
        self._spk_to_id = spk_to_id
        self._lang_to_id = lang_to_id
        self._hparams = hparams
        self.global_step = 1
        self.queue = queue.Queue(maxsize=64)
        self.rand = np.random.RandomState(rank)
        self._rank = rank
        self._world_size = world_size
        self._lock = threading.Lock()
        self.daemon = True

        self.zfile = load_zip(zip_filename)

        with open(metadata_file_path, encoding="utf-8") as f:
            self._metadata = read_meta(f, hparams.data_format,
                                       inc_lang=train_lang, inc_spk=train_spk)
        logging.info("%d samples read", len(self._metadata))
        if exclude_spk:
            self._metadata = [m for m in self._metadata
                              if speaker_of(m["n"]) not in exclude_spk]
            logging.info("%d samples after speakers excluded",
                         len(self._metadata))
        if downsample_lang:
            self._metadata = downsample_language(self._metadata, downsample_lang)
            logging.info("%d samples after language downsampling",
                         len(self._metadata))
        self._warmup_lang = warmup_lang
        self._warmup_spk = warmup_spk
        self._adapt_samples = adapt_samples

        hours = sum(int(x["l"]) for x in self._metadata) * \
            hparams.frame_shift_ms / (3600 * 1000)
        logging.info("Loaded metadata for %d examples (%.2f hours)",
                     len(self._metadata), hours)

        if self._world_size > 1:
            self._metadata = self._metadata[self._rank::self._world_size]
            logging.info("%d samples after sharding", len(self._metadata))

        if hparams.shuffle_training_data:
            self.rand.shuffle(self._metadata)

        if hparams.balanced_training:
            logging.info("Using balanced data in training")
            self.grouped_meta = group_meta(self._metadata, hparams)

        self._adapt_lang = adapt_lang
        self._adapt_spk = adapt_spk
        if self._adapt_lang or self._adapt_spk:
            with open(metadata_file_path, encoding="utf-8") as f:
                self._adapt_metadata = read_meta(
                    f, hparams.data_format, inc_lang=adapt_lang,
                    inc_spk=adapt_spk)
            logging.info("%d adapt samples read", len(self._adapt_metadata))
            if exclude_spk:
                self._adapt_metadata = [
                    m for m in self._adapt_metadata
                    if speaker_of(m["n"]) not in exclude_spk]
                logging.info("%d adapt samples after speakers excluded",
                             len(self._adapt_metadata))
            if adapt_samples:
                self._adapt_metadata = [m for m in self._adapt_metadata
                                        if m["n"] in adapt_samples]
            elif downsample_lang:
                self._adapt_metadata = downsample_language(
                    self._adapt_metadata, downsample_lang)
                logging.info("%d adapt samples after language downsampling",
                             len(self._adapt_metadata))
            spk_cnt = defaultdict(int)
            spk_time = defaultdict(float)
            for m in self._adapt_metadata:
                spk = speaker_of(m["n"])
                spk_cnt[spk] += 1
                spk_time[spk] += int(m["l"]) * hparams.frame_shift_ms / (60 * 1000)
            logging.info("Adapt samples by speakers: %s", " ".join(
                "%s (%d, %.3f min)" % (k, v, spk_time[k])
                for k, v in spk_cnt.items()))
            if self._world_size > 1:
                self._adapt_metadata = \
                    self._adapt_metadata[self._rank::self._world_size]
                logging.info("%d samples after language sharding",
                             len(self._adapt_metadata))
            if len(self._adapt_metadata) <= 30:
                logging.info("\n\t".join(
                    ["Samples:"] + [m["n"] for m in self._adapt_metadata]))
            self._adapt_offset = 0
            self.rand.shuffle(self._adapt_metadata)
        else:
            self._adapt_metadata = None

    # ---------------- producer thread ---------------------------------------

    def run(self):
        try:
            while True:
                self._enqueue_next_group()
        except Exception:
            logging.error(traceback.format_exc())
            # propagate to the consumer instead of stalling get_batch forever
            # (the reference's producer dies silently — dataloader.py:106-111)
            self._error = sys.exc_info()[1]
            self.queue.put(_FEEDER_ERROR)

    def get_batch(self):
        batch = self.queue.get()
        if batch is _FEEDER_ERROR:
            raise RuntimeError("Feeder thread failed: %r" % self._error)
        return batch

    # ---------------- resumable state (reference dataloader.py:113-138) -----

    def state_dict(self):
        with self._lock:
            state = {"rand": self.rand.get_state()}
            if self._hparams.balanced_training:
                state["offset"] = dict(self.grouped_meta["offsets"])
                state["epoch"] = dict(self.grouped_meta["epoch"])
            else:
                state["offset"] = self._offset
                state["epoch"] = self._epoch
            if hasattr(self, "_adapt_offset"):
                state["adapt_offset"] = self._adapt_offset
            logging.info("Dumped feeder state: %s", str(state["offset"]))
            return state

    def load_state_dict(self, state):
        logging.info("Loaded feeder state: %s", str(state["offset"]))
        with self._lock:
            self.rand.set_state(state["rand"])
            if self._hparams.balanced_training:
                self.grouped_meta["offsets"].update(state["offset"])
                self.grouped_meta["epoch"].update(state["epoch"])
            else:
                self._offset = state["offset"]
                self._epoch = state["epoch"]
            if hasattr(self, "_adapt_offset") and "adapt_offset" in state:
                self._adapt_offset = state["adapt_offset"]

    # ---------------- sampling ----------------------------------------------

    def get_examples(self, bucket_size: int) -> List[dict]:
        examples = []
        with self._lock:
            for _ in range(bucket_size):
                examples.append(self._get_next_example())
        return examples

    def _enqueue_next_group(self):
        tic = time.time()
        examples = self.get_examples(self._hparams.bucket_size)
        examples.sort(key=lambda x: len(x["mel_target"]))
        batches = _pack_into_batches(examples, hparams=self._hparams)
        self.rand.shuffle(batches)
        for batch in batches:
            self.queue.put(_prepare_batch(batch, hparams=self._hparams,
                                          pad_to_lattice=True))
        logging.info("Packed %d batches with %d samples in %.2f sec",
                     len(batches), len(examples), time.time() - tic)

    def _get_next_balanced_meta(self):
        g = self.grouped_meta
        lang = self.rand.choice(g["langs"], p=g["prob"])
        meta = g["meta"][lang][g["offsets"][lang]]
        g["offsets"][lang] += 1
        if g["offsets"][lang] >= len(g["meta"][lang]):
            g["offsets"][lang] = 0
            g["epoch"][lang] += 1
            logging.info("Start epoch %d of %s", g["epoch"][lang], lang)
        return meta

    def _get_next_example(self):
        while True:
            if self._adapt_metadata and self.rand.random() < self._adapt_rate():
                meta = self._adapt_metadata[self._adapt_offset]
                self._adapt_offset += 1
                if self._adapt_offset >= len(self._adapt_metadata):
                    self._adapt_offset = 0
                    self.rand.shuffle(self._adapt_metadata)
            elif not self._hparams.balanced_training:
                meta = self._metadata[self._offset]
                self._offset += 1
                if self._offset >= len(self._metadata):
                    self._offset = 0
                    self._epoch += 1
                    if self._hparams.shuffle_training_data:
                        self.rand.shuffle(self._metadata)
            else:
                meta = self._get_next_balanced_meta()

            if self.skip_meta(meta):
                continue
            break
        return extract_meta(meta, self.zfile, self._hparams, self._spk_to_id,
                            self._lang_to_id)

    def _adapt_rate(self) -> float:
        hp = self._hparams
        if self.global_step >= hp.adapt_end_step:
            r = 1.0
        elif self.global_step < hp.adapt_start_step:
            r = 0.0
        else:
            r = (self.global_step - hp.adapt_start_step) / \
                (hp.adapt_end_step - hp.adapt_start_step)
        return r * hp.final_adapt_rate

    def skip_meta(self, meta) -> bool:
        hp = self._hparams
        if self.global_step >= hp.data_warmup_steps:
            return False
        if self._warmup_lang is not None and \
                meta.get("i", None) not in self._warmup_lang:
            return True
        if self._warmup_spk is not None and \
                speaker_of(meta["n"]) not in self._warmup_spk:
            return True
        if hp.target_length_upper_bound < 0 or \
                hp.target_length_lower_bound <= int(meta["l"]) <= \
                hp.target_length_upper_bound:
            return False
        return True


class FeederEval:
    """Eval feeder (reference dataloader.py:221-310).  Eager; supports a
    no-zip synthesis-only mode where only texts are batched."""

    def __init__(self, zip_filename, metadata_file_path, hparams: Config,
                 spk_to_id=None, lang_to_id=None, eval_lang=None,
                 eval_spk=None, exclude_spk=None, target_lang=None,
                 target_spk=None, shuffle=True, keep_order=False,
                 pick_partial=False, single=False):
        self._offset = 0
        self._shuffle = shuffle
        self._keep_order = keep_order
        self.single = single
        self.lang_ids = lang_to_id
        self.spk_ids = spk_to_id
        self._target_lang = target_lang
        self._target_spk = target_spk
        self._eval_lang = eval_lang
        self._eval_spk = eval_spk
        self._hparams = hparams

        self.zfile = load_zip(zip_filename) if zip_filename is not None else None

        with open(metadata_file_path, encoding="utf-8") as f:
            self._metadata = read_meta(f, hparams.data_format,
                                       inc_lang=eval_lang, inc_spk=eval_spk)
        logging.info("%d eval samples read", len(self._metadata))

        if "l" in hparams.data_format:
            self._metadata = [m for m in self._metadata
                              if int(m["l"]) < hparams.max_eval_sample_length]
            logging.info("%d eval samples after filtering length",
                         len(self._metadata))
        if exclude_spk:
            self._metadata = [m for m in self._metadata
                              if speaker_of(m["n"]) not in exclude_spk]
            logging.info("%d eval samples after speakers excluded",
                         len(self._metadata))
        if pick_partial:
            self._metadata = filter_eval_samples(
                self._metadata, 3, hparams.eval_sample_per_speaker)
            logging.info("%d eval samples after filtering", len(self._metadata))
        self._meta_texts = ["|".join(m[c] for c in hparams.data_format)
                            for m in self._metadata]

        self.data = self.prepare_all_batches(self.get_all_batches())
        self.rand = np.random.RandomState(0)
        if self._shuffle:
            self.rand.shuffle(self.data)
        logging.info("[FeederEval] Prepared %d batches", len(self.data))

    def fetch_data(self, exclude=None) -> List[dict]:
        if exclude is None:
            data = self.data
        else:
            data = self.prepare_all_batches(self.get_all_batches(exclude))
        if self._shuffle and not self._keep_order:
            self.rand.shuffle(data)
        return data

    def _get_next_example(self):
        finished = False
        meta = self._metadata[self._offset]
        self._offset += 1
        if self._offset >= len(self._metadata):
            self._offset = 0
            finished = True
        return extract_meta(meta, self.zfile, self._hparams, self.spk_ids,
                            self.lang_ids, target_spk=self._target_spk,
                            target_lang=self._target_lang), finished

    def _get_all_examples(self):
        examples = []
        while True:
            example, finished = self._get_next_example()
            examples.append(example)
            if finished:
                break
        return examples

    def get_all_batches(self, exclude=()):
        examples = self._get_all_examples()
        examples = [x for x in examples if x["name"] not in exclude]
        if self._shuffle and examples and "mel_target" in examples[0]:
            examples.sort(key=lambda x: len(x["mel_target"]))
        return _pack_into_batches(examples, self.single,
                                  hparams=self._hparams)

    def prepare_all_batches(self, batches):
        return [_prepare_batch(b, hparams=self._hparams) for b in batches]


# ---------------------------------------------------------------------------
# packing / batching (reference dataloader.py:401-508)
# ---------------------------------------------------------------------------


def _pack_into_batches(examples, single=False, hparams: Config = None):
    """Greedy packing under frame and quadratic-cost budgets
    (reference dataloader.py:401-410)."""
    batches = [[]]
    for sample in examples:
        target_len = len(sample["mel_target"]) if "mel_target" in sample \
            else int(len(sample["input"]) * 1.5)
        quad_cnt = max([len(sample["input"])] +
                       [len(s["input"]) for s in batches[-1]]) ** 2 + \
            target_len ** 2
        if (len(batches[-1]) + 1) * quad_cnt > hparams.batch_frame_quad_limit \
                or (len(batches[-1]) + 1) * target_len > \
                hparams.batch_frame_limit or single:
            batches.append([])
        batches[-1].append(sample)
    if batches and not batches[0]:
        batches = batches[1:]
    return batches


def _prepare_batch(batch, hparams: Config, pad_to_lattice: bool = False) -> dict:
    """Pad a packed batch into dense arrays (reference dataloader.py:419-457).

    With pad_to_lattice, padded dims are rounded up to the config's shape
    lattice and padded rows carry zero lengths (masked out of the loss)."""
    in_mult = hparams.input_length_multiple if pad_to_lattice else 1
    tgt_mult = hparams.target_length_multiple if pad_to_lattice else 1
    b_mult = hparams.batch_size_multiple if pad_to_lattice else 1

    b = len(batch)
    b_pad = _round_up(b, b_mult)
    max_in = _round_up(max(len(x["input"]) for x in batch), in_mult)

    inputs = np.zeros((b_pad, max_in), dtype=np.int32)
    input_lengths = np.zeros((b_pad,), dtype=np.int32)
    for i, x in enumerate(batch):
        inputs[i, :len(x["input"])] = x["input"]
        input_lengths[i] = len(x["input"])
    results = {"inputs": inputs, "input_lengths": input_lengths}

    if "target_length" in batch[0]:
        target_lengths = np.zeros((b_pad,), dtype=np.int32)
        target_lengths[:b] = [x["target_length"] for x in batch]
        results["target_lengths"] = target_lengths
    elif "mel_target" in batch[0]:
        target_lengths = np.zeros((b_pad,), dtype=np.int32)
        target_lengths[:b] = [len(x["mel_target"]) for x in batch]
        results["target_lengths"] = target_lengths
    if "mel_target" in batch[0]:
        max_tgt = _round_up(max(len(x["mel_target"]) for x in batch), tgt_mult)
        mel = np.zeros((b_pad, max_tgt, batch[0]["mel_target"].shape[1]),
                       dtype=np.float32)
        for i, x in enumerate(batch):
            mel[i, :len(x["mel_target"])] = x["mel_target"]
        results["mel_targets"] = mel

    if hparams.multi_lingual:
        lvec = np.zeros((b_pad, hparams.max_num_language), dtype=np.float32)
        for i, x in enumerate(batch):
            lvec[i] = x["language_vec"]
        results["input_language_vecs"] = lvec
    if hparams.multi_speaker or hparams.multi_lingual:
        spk = np.zeros((b_pad,), dtype=np.int32)
        spk[:b] = [x["speaker_id"] for x in batch]
        results["input_spk_ids"] = spk
    results["names"] = [x["name"] for x in batch]
    results["num_valid"] = b
    return results


def extract_meta(meta: dict, zfile, hparams: Config, spk_ids, lang_ids,
                 target_spk=None, target_lang=None) -> dict:
    """One metadata row -> example dict (reference dataloader.py:460-495)."""
    name = meta["n"]
    if name.endswith(".npy"):
        name = name[:-4]
    results = {"name": name}
    mel_target = zfile.read_npy(meta["n"]) if zfile else None
    if mel_target is not None:
        if "l" in meta:
            target_length = int(meta["l"])
        else:
            target_length = mel_target.shape[0]
        results["mel_target"] = mel_target
        results["target_length"] = target_length

    lang = target_lang if target_lang is not None else meta.get("i", None)
    if hparams.multi_lingual and lang:
        language_vec = np.zeros([hparams.max_num_language], dtype=np.float32)
        language_vec[lang_ids[lang]] = 1
        results["language_vec"] = language_vec

    results["input"] = np.asarray(
        text_to_byte_sequence(meta["t"], use_sos=hparams.use_sos),
        dtype=np.int32)

    if hparams.multi_speaker or hparams.multi_lingual:
        if target_spk:
            speaker_id = spk_ids[target_spk]
        else:
            speaker_id = spk_ids[speaker_of(name)]
        results["speaker_id"] = speaker_id
    return results
