"""Generate a synthetic corpus with a *learnable* text->mel mapping.

Purpose: the convergence proof (CONVERGE_r05.md).  The reference validated its
capabilities by training to convergence on real speech (reference
README.md:210-250); on this host there is no speech corpus and no weeks of
compute, so this builds the smallest dataset on which the same capabilities —
monotonic attention alignment, teacher-forced loss floor, falling eval
MSE-DTW, AR decode matching ground truth — are observable in thousands of
steps rather than hundreds of thousands:

- Each language has a fixed per-character mel "anchor" (a smooth 80-dim
  vector); each speaker adds a fixed smooth offset.  An utterance's mel is
  the concatenation of 4-frame character segments (time-smoothed, tiny
  noise).  The mapping text->mel is deterministic and local, so a
  sequence-to-sequence model that learns it MUST have discovered a diagonal
  input-output alignment — there is no other way to predict frame t.
- Durations are constant (4 frames/char), so the ground-truth alignment is
  exactly diagonal with slope 4.
- Text lengths are capped at 29 chars so every utterance lands on the
  Tin=32 lattice row and mels on Tout in {64, 128}: the whole run compiles
  ~3 XLA programs.
- A third language (fr-fr, distinct anchor set) is generated but meant to be
  EXCLUDED from the main run (--training_languages en-us:de-de) and used by
  the few-shot adaptation phase (--adapt_languages fr-fr), mirroring the
  reference tier protocol (reference README.md:157-198).

Usage: python tools/make_learnable_corpus.py <out_dir> [--n_train 300]
"""

import argparse
import io
import json
import os
import sys
import zipfile

import numpy as np

LANGS = {"en-us": ["en0", "en1"], "de-de": ["de0", "de1"],
         "fr-fr": ["fr0", "fr1"]}
CHARS = "abcdefghij "
FRAMES_PER_CHAR = 4
MAX_CHARS = 29          # keeps every utterance on the Tin=32 lattice row


def _smooth(v, k=7):
    """Moving-average over the mel axis so anchors look spectrum-like."""
    pad = np.pad(v, ((k // 2, k // 2),) if v.ndim == 1 else
                 ((0, 0), (k // 2, k // 2)), mode="edge")
    ker = np.ones(k) / k
    if v.ndim == 1:
        return np.convolve(pad, ker, mode="valid")
    return np.stack([np.convolve(row, ker, mode="valid") for row in pad])


def build_templates(num_mels=80, seed=0):
    rng = np.random.RandomState(seed)
    anchors = {}   # (lang, char) -> (num_mels,)
    for lang in LANGS:
        for c in CHARS:
            a = _smooth(rng.randn(num_mels) * 2.2)
            anchors[(lang, c)] = np.clip(a, -3.5, 3.5).astype(np.float32)
    spk_offsets = {}
    for spks in LANGS.values():
        for s in spks:
            spk_offsets[s] = _smooth(rng.randn(num_mels) * 0.5).astype(
                np.float32)
    return anchors, spk_offsets


def render_mel(text, lang, spk, anchors, spk_offsets, rng, noise=0.05):
    seq = [anchors[(lang, c)] + spk_offsets[spk] for c in text]
    frames = np.repeat(np.stack(seq), FRAMES_PER_CHAR, axis=0)
    # time smoothing: average each frame with its neighbours
    sm = frames.copy()
    sm[1:-1] = (frames[:-2] + 2 * frames[1:-1] + frames[2:]) / 4.0
    sm = sm + rng.randn(*sm.shape).astype(np.float32) * noise
    return np.clip(sm, -3.9, 3.9).astype(np.float32)


def random_text(rng, min_chars=12):
    words = []
    n = 0
    target = rng.randint(min_chars, MAX_CHARS + 1)
    while True:
        w = "".join(rng.choice(list(CHARS.strip()))
                    for _ in range(rng.randint(2, 6)))
        extra = len(w) + (1 if words else 0)
        if n + extra > MAX_CHARS:
            break
        words.append(w)
        n += extra
        if n >= target:
            break
    return " ".join(words)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--n_train", type=int, default=300,
                    help="rows per main language (split over its speakers)")
    ap.add_argument("--n_adapt", type=int, default=60,
                    help="rows for the held-out adapt language")
    ap.add_argument("--n_eval", type=int, default=8,
                    help="eval rows per language")
    ap.add_argument("--num_mels", type=int, default=80)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    anchors, spk_offsets = build_templates(args.num_mels, args.seed)
    rng = np.random.RandomState(args.seed + 1)

    lang_to_id, spk_to_id = {}, {}
    train_rows, eval_rows = [], []
    zpath = os.path.join(args.out_dir, "mels.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_STORED) as zf:
        for lang, spks in LANGS.items():
            lang_to_id.setdefault(lang, len(lang_to_id))
            n_rows = args.n_adapt if lang == "fr-fr" else args.n_train
            for spk in spks:
                spk_to_id.setdefault(spk, len(spk_to_id))
            for split, count in (("train", n_rows), ("eval", args.n_eval)):
                for i in range(count):
                    spk = spks[i % len(spks)]
                    name = "%s_%010d" % (spk, i + (10000 if split == "eval"
                                                   else 0))
                    text = random_text(rng)
                    mel = render_mel(text, lang, spk, anchors, spk_offsets,
                                     rng)
                    buf = io.BytesIO()
                    np.save(buf, mel)
                    zf.writestr(name + ".npy", buf.getvalue())
                    row = "%s.npy|%d|%s|%s" % (name, mel.shape[0], text, lang)
                    (train_rows if split == "train" else eval_rows).append(row)

    open(os.path.join(args.out_dir, "metadata.train.txt"), "w").write(
        "\n".join(train_rows))
    open(os.path.join(args.out_dir, "metadata.eval.txt"), "w").write(
        "\n".join(eval_rows))
    json.dump(lang_to_id, open(os.path.join(args.out_dir, "lang_id.json"),
                               "w"))
    json.dump(spk_to_id, open(os.path.join(args.out_dir, "spk_id.json"), "w"))
    # ground-truth generator state, for the analysis tooling
    np.savez(os.path.join(args.out_dir, "templates.npz"),
             **{"anchor_%s_%s" % (l, c.replace(" ", "SP")): a
                for (l, c), a in anchors.items()},
             **{"spk_%s" % s: o for s, o in spk_offsets.items()})
    print("wrote %d train / %d eval rows to %s" %
          (len(train_rows), len(eval_rows), args.out_dir))


if __name__ == "__main__":
    sys.exit(main())
