"""Metadata reading, grouping, filtering (reference dataloader.py:313-398).

Metadata rows are ``name|n_frames|text|lang`` ('nlti') or
``name|n_frames|text|phones|lang`` ('nltpi'), '|' or tab separated; speaker id
is the part of the name before '_'.
"""

from __future__ import annotations

import logging
from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np


def speaker_of(name: str) -> str:
    return name.split("_")[0]


def read_meta(meta_file, fmt: str, inc_lang=None, inc_spk=None) -> List[dict]:
    """Parse metadata lines into dicts keyed by the format chars
    (reference dataloader.py:313-332)."""
    meta_list = []
    for line in meta_file:
        parts = line.strip().split("|")
        if len(parts) != len(fmt):
            parts = line.strip().split("\t")
        if not line.strip():
            continue
        if fmt == "nlti":
            name, length, text, lang = parts
            item = {"n": name, "l": length, "t": text, "i": lang}
        elif fmt == "nltpi":
            name, length, text, phone, lang = parts
            item = {"n": name, "l": length, "t": text, "p": phone, "i": lang}
        else:
            raise ValueError("Invalid format for read_meta: %s" % fmt)
        if inc_lang is not None and item["i"] not in inc_lang:
            continue
        if inc_spk is not None and speaker_of(name) not in inc_spk:
            continue
        meta_list.append(item)
    return meta_list


def group_meta(metadata: List[dict], hp) -> Dict:
    """Group by language with temperature-scaled sampling probabilities
    prob ~ (n_l / N) ** lg_prob_scale (reference dataloader.py:334-351)."""
    lang_meta = defaultdict(list)
    lang_spk = defaultdict(set)
    for m in metadata:
        lang_meta[m["i"]].append(m)
        lang_spk[m["i"]].add(speaker_of(m["n"]))
    langs = sorted(lang_meta.keys())
    sizes = [len(lang_meta[l]) for l in langs]
    alphas = np.power(np.asarray(sizes) / np.sum(sizes), hp.lg_prob_scale)
    prob = alphas / np.sum(alphas)
    for i, lang in enumerate(langs):
        logging.info("\t%s: %d samples, prob=%f", lang, sizes[i], prob[i])
        logging.info("\tSpeakers: %s", str(sorted(lang_spk[lang])))
    return {"langs": langs, "prob": prob, "meta": lang_meta,
            "offsets": {l: 0 for l in langs}, "epoch": {l: 0 for l in langs}}


def downsample_language(meta_list: List[dict],
                        downsample_langs: Dict[str, float]) -> List[dict]:
    """Keep a ratio (<=1) or an absolute count (>1) of each language's samples,
    chosen by a fixed-seed shuffle (reference dataloader.py:354-371)."""
    mark = [True for _ in meta_list]
    lang_bins = defaultdict(list)
    for i, m in enumerate(meta_list):
        if m["i"] in downsample_langs:
            lang_bins[m["i"]].append(i)
    for lang_key, values in lang_bins.items():
        r = np.random.RandomState(0)
        r.shuffle(values)
        if downsample_langs[lang_key] <= 1:
            keep = int(len(values) * downsample_langs[lang_key])
        else:
            keep = int(downsample_langs[lang_key])
        for i in range(keep, len(values)):
            mark[values[i]] = False
    return [meta_list[k] for k in range(len(mark)) if mark[k]]


def filter_eval_samples(meta: List[dict], n_spk: int, n_sample: int,
                        required_speakers: Optional[List[str]] = None) -> List[dict]:
    """Keep up to n_spk speakers x n_sample samples per language, fixed-seed
    shuffled (reference dataloader.py:374-398)."""
    lang_samples = defaultdict(list)
    for m in meta:
        lang_samples[m["i"]].append(m)
    samples = []
    for lang in lang_samples:
        r = np.random.RandomState(0)
        r.shuffle(lang_samples[lang])
        spk_cnt = {}
        if required_speakers is not None:
            n_spk = len(required_speakers)
            for s in required_speakers:
                spk_cnt[s] = 0
        for m in lang_samples[lang]:
            spk = speaker_of(m["n"])
            if spk not in spk_cnt:
                if len(spk_cnt) >= n_spk:
                    continue
                spk_cnt[spk] = 0
            spk_cnt[spk] += 1
            if spk_cnt[spk] <= n_sample:
                samples.append(m)
    r = np.random.RandomState(0)
    r.shuffle(samples)
    return samples


def parse_downsample_spec(spec: Optional[str]) -> Dict[str, float]:
    """CLI form LANG:RATIO_OR_N[,LANG:R...] (reference train.py:96-101)."""
    if not spec:
        return {}
    out = {}
    for part in spec.split(","):
        lang, r = part.split(":")
        out[lang] = float(r)
    return out
