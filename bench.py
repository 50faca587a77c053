"""Benchmark: training throughput on the real chip.

Headline metric: audio-seconds of speech processed per second per chip during
training (batch frames x 12.5 ms frame shift / wall per step) on the flagship
config with a realistic packed-batch shape (within the reference's
batch_frame/quad limits, reference hyperparams.py:41-42).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline divides by BASELINE.json's recorded value when present (the
reference publishes no throughput numbers; SURVEY.md section 6), else 1.0.

Extra diagnostics (AR-decode frames/s, sec/step) go to stderr only.
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    os.makedirs("/root/.cache/jax_compile", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compile")
    from few_shot_transformer_tts_tpu.config import default_config
    from few_shot_transformer_tts_tpu.models import ByteToMel
    from few_shot_transformer_tts_tpu.parallel import make_mesh, shard_batch
    from few_shot_transformer_tts_tpu.train.loop import (
        create_state, make_train_step, device_batch)
    from __graft_entry__ import _example_batch

    hp = default_config()
    model = ByteToMel(hp)
    log("devices:", jax.devices())

    # realistic packed batch: B*Tout=7168 <= 8000 frame limit;
    # B*(Tin^2+Tout^2)=3.8M <= 7M quad limit
    B, TIN, TOUT = 16, 192, 448
    batch = _example_batch(hp, b=B, t_in=TIN, t_out=TOUT)
    mesh = make_mesh(data=-1, model=1)
    state = create_state(model, hp, jax.random.PRNGKey(0), device_batch(batch))
    train_step = make_train_step(model, hp, mesh=mesh, donate=True)
    dbatch = shard_batch(device_batch(batch), mesh)
    rng = jax.random.key(0, impl=hp.prng_impl)  # hardware RNG for dropout

    # compile + warmup
    tic = time.time()
    state, losses = train_step(state, dbatch, rng)
    jax.block_until_ready(losses["loss"])
    log("compile+first step: %.1fs" % (time.time() - tic))
    for i in range(3):
        state, losses = train_step(state, dbatch, jax.random.fold_in(rng, i))
    jax.block_until_ready(losses["loss"])

    n_steps = 20
    tic = time.time()
    for i in range(n_steps):
        state, losses = train_step(state, dbatch,
                                   jax.random.fold_in(rng, 100 + i))
    jax.block_until_ready(losses["loss"])
    dur = (time.time() - tic) / n_steps

    frames = int(np.sum(batch["target_lengths"]))
    audio_seconds = frames * hp.frame_shift_ms / 1000.0
    value = audio_seconds / dur / jax.device_count()
    log("sec/step: %.4f  batch_frames=%d  audio_s/batch=%.1f  loss=%.3f"
        % (dur, frames, audio_seconds, float(losses["loss"])))

    # secondary diagnostic: AR-decode throughput with KV caches (the
    # reference logs RTF = wall*80/frames — synthesize.py:65-67 — with an
    # O(T^3) full-prefix re-forward; this decode is O(T^2))
    try:
        from few_shot_transformer_tts_tpu.infer import synthesize_batch
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        dec_batch = {
            "inputs": batch["inputs"][:8], "input_lengths":
                batch["input_lengths"][:8],
            "input_spk_ids": batch["input_spk_ids"][:8],
            "input_language_vecs": batch["input_language_vecs"][:8]}
        # warmup/compile
        synthesize_batch(model, variables, dec_batch, hp, deterministic=True,
                         collect_alignments=False, max_frames=512)
        tic = time.time()
        out = synthesize_batch(model, variables, dec_batch, hp,
                               deterministic=True, collect_alignments=False,
                               max_frames=512)
        dec_dur = time.time() - tic
        dec_frames = int(np.sum(out["generated_lengths"]))
        log("decode: %d frames in %.3fs = %.0f frames/s, RTF=%.4f (B=8)"
            % (dec_frames, dec_dur, dec_frames / dec_dur,
               dec_dur / max(dec_frames, 1) * 80))
    except Exception as e:  # diagnostics must not break the headline metric
        log("decode bench failed:", repr(e))

    baseline = None
    try:
        published = json.load(open(
            os.path.join(os.path.dirname(__file__), "BASELINE.json")))
        baseline = published.get("published", {}).get(
            "train_audio_seconds_per_sec_per_chip")
    except Exception:
        pass
    vs = value / baseline if baseline else 1.0

    print(json.dumps({
        "metric": "train_audio_seconds_per_sec_per_chip",
        "value": round(value, 2),
        "unit": "audio_s/s/chip",
        "vs_baseline": round(vs, 3)}))


if __name__ == "__main__":
    main()
