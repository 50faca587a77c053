"""Build the convergence-proof artifact (CONVERGE_r05.md + plots).

The reference's core capability claim — "train it and speech quality
converges" — was validated there by weeks-long runs watched by eval.py
(reference eval.py:128-218, README.md:210-250).  This tool assembles the
equivalent evidence from a chip training run on the learnable synthetic
corpus (tools/make_learnable_corpus.py):

  (a) teacher-forced loss trajectory (train log) descending to its floor;
  (b) encoder-decoder attention turned DIAGONAL: per-frame argmax input
      position regressed against the known slope (the corpus pins 4
      frames/char), R^2 and near-diagonal mass reported;
  (c) eval-service MSE-DTW per checkpoint decreasing (metrics.jsonl written
      by the live eval.py process that watched the training run);
  (d) an AR-decoded mel next to its ground-truth mel, with DTW-MSE.

Run AFTER the training+eval processes finish (CPU is fine):
    python tools/convergence_report.py --run-dir /tmp/conv \
        --corpus /tmp/conv_corpus --out-dir converge_r05
"""

import argparse
import glob
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEP_RE = re.compile(
    r"\[Step (\d+)\] .*?loss=([\d.]+), mse_loss=([\d.]+)")


def parse_train_log(logdir):
    rows = []
    for path in sorted(glob.glob(os.path.join(logdir, "outputs_*.log"))):
        for line in open(path, errors="replace"):
            m = STEP_RE.search(line)
            if m:
                rows.append((int(m.group(1)), float(m.group(2)),
                             float(m.group(3))))
    rows.sort()
    return rows


def parse_eval_metrics(eval_logdir):
    out = {}
    path = os.path.join(eval_logdir, "metrics.jsonl")
    if not os.path.exists(path):
        return out
    for line in open(path):
        m = json.loads(line)
        if m["tag"].startswith("mse_dtw/"):
            out.setdefault(m["tag"].split("/", 1)[1], []).append(
                (m["step"], m["value"]))
    for v in out.values():
        v.sort()
    return out


def diagonality(align_bhqk, dec_len, enc_len, frames_per_char=4):
    """Best-head alignment linearity: per decoded frame take the argmax
    input position, regress position on frame index.  Returns dict with the
    best head's R^2, fitted slope (expected ~1/frames_per_char), and the
    fraction of attention mass within +-3 positions of the fitted line."""
    best = {"r2": -1.0}
    h_count = align_bhqk.shape[0]
    dec_len = min(dec_len, align_bhqk.shape[1])
    enc_len = min(enc_len, align_bhqk.shape[2])
    for h in range(h_count):
        a = align_bhqk[h, :dec_len, :enc_len]
        pos = np.argmax(a, axis=-1).astype(np.float64)
        t = np.arange(a.shape[0], dtype=np.float64)
        if dec_len < 8 or np.std(pos) < 0.5:
            # a head parked on one input position fits a constant with
            # R^2=1 trivially; it carries no alignment information
            continue
        slope, icept = np.polyfit(t, pos, 1)
        pred = slope * t + icept
        ss_res = np.sum((pos - pred) ** 2)
        ss_tot = np.sum((pos - pos.mean()) ** 2) + 1e-9
        r2 = 1.0 - ss_res / ss_tot
        cols = np.arange(enc_len)[None, :]
        near = np.abs(cols - pred[:, None]) <= 3.0
        mass = float((a * near).sum() / (a.sum() + 1e-9))
        if r2 > best["r2"]:
            best = {"r2": round(float(r2), 4),
                    "slope": round(float(slope), 4),
                    "head": h, "near_diag_mass": round(mass, 4)}
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-dir", default="/tmp/conv")
    ap.add_argument("--corpus", default="/tmp/conv_corpus")
    ap.add_argument("--out-dir", default="converge_r05")
    ap.add_argument("--md", default="CONVERGE_r05.md")
    ap.add_argument("--phase2-logdir", default=None,
                    help="adaptation-phase log dir for the fr-fr ramp plot")
    ap.add_argument("--ckpt", default=None,
                    help="explicit checkpoint path (default: latest in "
                         "run-dir/models)")
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"],
                    help="decode backend for the final-checkpoint analysis "
                         "(tpu for flagship dims — CPU AR decode of the "
                         "full-size model is minutes per sample)")
    args = ap.parse_args()

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    else:
        os.makedirs("/root/.cache/jax_compile", exist_ok=True)
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_compile")
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    from few_shot_transformer_tts_tpu.config import Config
    from few_shot_transformer_tts_tpu.data import FeederEval
    from few_shot_transformer_tts_tpu.models.tacotron import ByteToMel
    from few_shot_transformer_tts_tpu.train import checkpoint as ckpt_lib
    from few_shot_transformer_tts_tpu.train.loop import create_state, \
        device_batch
    from few_shot_transformer_tts_tpu.infer.synthesize import synthesize_batch
    from few_shot_transformer_tts_tpu.utils import metrics as metrics_lib

    os.makedirs(args.out_dir, exist_ok=True)
    logdir = os.path.join(args.run_dir, "logs")
    hp = Config(**json.load(open(os.path.join(logdir, "hparams.json"))))
    if args.platform == "cpu":
        hp = hp.replace(use_pallas_attention=False, use_bfloat16=False)

    # ---- (a) training loss ----
    rows = parse_train_log(logdir)
    assert rows, "no [Step] lines found in %s" % logdir
    steps = np.array([r[0] for r in rows])
    mse = np.array([r[2] for r in rows])
    fig, ax = plt.subplots(figsize=(7, 3.2), dpi=110)
    ax.plot(steps, mse, lw=1.2, color="#4063d8")
    ax.set_yscale("log")
    ax.set_xlabel("step")
    ax.set_ylabel("teacher-forced mse_loss")
    ax.set_title("Training loss (chip run)")
    ax.grid(alpha=0.25, lw=0.5)
    fig.tight_layout()
    fig.savefig(os.path.join(args.out_dir, "train_loss.png"))
    plt.close(fig)
    loss_summary = {
        "first_window_mse": round(float(np.mean(mse[:20])), 4),
        "last_window_mse": round(float(np.mean(mse[-100:])), 4),
        "steps": int(steps[-1]),
    }

    # ---- (c) eval-service MSE-DTW per checkpoint ----
    eval_metrics = parse_eval_metrics(os.path.join(args.run_dir, "eval_logs"))
    dtw_summary = {}
    if eval_metrics:
        fig, ax = plt.subplots(figsize=(7, 3.2), dpi=110)
        colors = {"en-us": "#4063d8", "de-de": "#c2533a", "fr-fr": "#2e7d54"}
        for lang, series in sorted(eval_metrics.items()):
            s = np.array(series)
            ax.plot(s[:, 0], s[:, 1], "o-", lw=1.4, ms=4,
                    color=colors.get(lang, "#666666"), label=lang)
            dtw_summary[lang] = {"first": round(float(s[0, 1]), 4),
                                 "last": round(float(s[-1, 1]), 4),
                                 "n_ckpts": int(len(s)),
                                 "monotone_decreasing_pairs": int(
                                     np.sum(np.diff(s[:, 1]) < 0))}
        ax.set_xlabel("checkpoint step")
        ax.set_ylabel("eval-service MSE-DTW")
        ax.set_yscale("log")
        ax.set_title("AR-decode MSE-DTW per checkpoint (live eval.py watcher)")
        ax.legend()
        ax.grid(alpha=0.25, lw=0.5)
        fig.tight_layout()
        fig.savefig(os.path.join(args.out_dir, "eval_mse_dtw.png"))
        plt.close(fig)

    # ---- (b) + (d): decode the final checkpoint ----
    model = ByteToMel(hp)
    lang_to_id = json.load(open(os.path.join(args.corpus, "lang_id.json")))
    spk_to_id = json.load(open(os.path.join(args.corpus, "spk_id.json")))
    feeder = FeederEval(
        os.path.join(args.corpus, "mels.zip"),
        os.path.join(args.corpus, "metadata.eval.txt"), hp,
        spk_to_id=spk_to_id, lang_to_id=lang_to_id,
        eval_lang=["en-us", "de-de"], shuffle=False, keep_order=True,
        pick_partial=False, single=False)
    batch = feeder.fetch_data()[0]
    tmpl_batch = dict(device_batch(batch))
    if "mel_targets" not in tmpl_batch:
        tmpl_batch["mel_targets"] = np.zeros(
            (tmpl_batch["inputs"].shape[0], 8, hp.num_mels), np.float32)
        tmpl_batch["target_lengths"] = np.full(
            (tmpl_batch["inputs"].shape[0],), 8, np.int32)
    tmpl = create_state(model, hp, 0, tmpl_batch)
    ckpt = args.ckpt or ckpt_lib.find_ckpt(os.path.join(args.run_dir,
                                                        "models"))
    state = ckpt_lib.load_state(ckpt, tmpl)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    results = synthesize_batch(model, variables, batch, hp,
                               deterministic=True)
    dtw = metrics_lib.calculate_mse_dtw(
        results["mel_aft"], results["generated_lengths"],
        batch["mel_targets"], batch["target_lengths"])

    # per-sample alignment diagonality over decoder layers; keep the best.
    # synthesize_batch returns encdec alignments [B, H, Tk, Tq] (the
    # reference's plotting convention, synthesize.py:338) — flip to
    # [B, H, Tq, Tk] for the frame-major analysis here.
    aligns = [np.asarray(a, np.float32).transpose(0, 1, 3, 2)
              for a in results["alignments"]["encdec"]]
    diag = []
    for i, name in enumerate(batch["names"]):
        gen_l = int(results["generated_lengths"][i])
        in_l = int(np.asarray(batch["input_lengths"])[i])
        best = {"r2": -1.0}
        best_layer = 0
        for li, a in enumerate(aligns):
            d = diagonality(np.asarray(a[i]), gen_l, in_l)
            if d["r2"] > best["r2"]:
                best, best_layer = d, li
        best["layer"] = best_layer
        best["name"] = str(name)
        best["dtw_mse"] = round(float(dtw[i]), 4)
        best["generated_frames"] = gen_l
        best["target_frames"] = int(np.asarray(batch["target_lengths"])[i])
        diag.append(best)

    # plots: GT mel vs AR mel + best alignment for the first two samples
    for i in range(min(2, len(batch["names"]))):
        name = str(batch["names"][i])
        gen_l = int(results["generated_lengths"][i])
        tgt_l = int(np.asarray(batch["target_lengths"])[i])
        in_l = int(np.asarray(batch["input_lengths"])[i])
        gt = np.asarray(batch["mel_targets"])[i][:tgt_l].T
        ar = np.asarray(results["mel_aft"])[i][:gen_l].T
        # a degenerate decode (e.g. an early checkpoint stopping after a
        # frame or two, or every head parked on one position) yields no
        # qualifying head — fall back to L0/H0 and say so in the title
        # instead of KeyError-ing after the expensive AR decode
        d_layer = diag[i].get("layer", 0)
        d_head = diag[i].get("head", 0)
        a = np.asarray(aligns[d_layer][i, d_head, :gen_l, :in_l]).T
        fig, axes = plt.subplots(3, 1, figsize=(7.5, 6.4), dpi=110)
        axes[0].imshow(gt, origin="lower", aspect="auto", cmap="magma",
                       vmin=-4, vmax=4)
        axes[0].set_title("%s ground truth (%d frames)" % (name, tgt_l))
        axes[1].imshow(ar, origin="lower", aspect="auto", cmap="magma",
                       vmin=-4, vmax=4)
        axes[1].set_title("AR decode (%d frames, DTW-MSE %.3f)"
                          % (gen_l, dtw[i]))
        axes[2].imshow(a, origin="lower", aspect="auto", cmap="viridis")
        if "head" in diag[i]:
            axes[2].set_title("enc-dec attention L%d H%d (R2=%.3f, "
                              "slope=%.3f)" % (d_layer, d_head,
                                               diag[i]["r2"],
                                               diag[i]["slope"]))
        else:
            axes[2].set_title("enc-dec attention L%d H%d "
                              "(no diagonal head)" % (d_layer, d_head))
        axes[2].set_xlabel("decoder frame")
        axes[2].set_ylabel("input position")
        fig.tight_layout()
        fig.savefig(os.path.join(args.out_dir,
                                 "sample_%d_%s.png" % (i, name)))
        plt.close(fig)

    # ---- optional: adaptation-phase per-language ramp ----
    ramp = None
    if args.phase2_logdir:
        path = os.path.join(args.phase2_logdir, "metrics.jsonl")
        per_step = {}
        if os.path.exists(path):
            for line in open(path):
                m = json.loads(line)
                if m["tag"].startswith("counts/"):
                    per_step.setdefault(m["step"], {})[
                        m["tag"].split("/", 1)[1]] = m["value"]
        if per_step:
            ss = sorted(per_step)
            share = [per_step[s].get("fr-fr", 0.0)
                     / max(1.0, sum(per_step[s].values())) for s in ss]
            fig, ax = plt.subplots(figsize=(7, 3.0), dpi=110)
            ax.plot(ss, share, "o-", lw=1.4, ms=4, color="#2e7d54")
            ax.set_xlabel("step")
            ax.set_ylabel("fr-fr share of sampled rows")
            ax.set_title("Few-shot adaptation: fr-fr ramp "
                         "(adapt_start→adapt_end)")
            ax.grid(alpha=0.25, lw=0.5)
            fig.tight_layout()
            fig.savefig(os.path.join(args.out_dir, "adapt_ramp.png"))
            plt.close(fig)
            ramp = {str(s): round(v, 4) for s, v in zip(ss, share)}

    summary = {
        "checkpoint": ckpt,
        "train_loss": loss_summary,
        "eval_mse_dtw": dtw_summary,
        "alignment_diagonality": diag,
        "ar_decode_dtw_mse_mean": round(float(np.mean(dtw)), 4),
        "adapt_ramp_fr_share": ramp,
    }
    json.dump(summary, open(os.path.join(args.out_dir, "summary.json"), "w"),
              indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
