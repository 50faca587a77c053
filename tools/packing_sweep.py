"""Packing-budget sweep over the REAL shape lattice the feeder emits.

The reference ships GPU-VRAM-era budgets (batch_frame_limit=8000,
batch_frame_quad_limit=7e6 — reference hyperparams.py:41-42) that cap packed
batches far below what a 16 GB-HBM v5e can hold.  This sweep measures training
throughput at the (Tin, Tout, B) triples those budgets — and 2x/4x scalings of
them — actually produce across the Tout range the feeder's length filter
admits (target_length bounds 240..800, padded to the 64-frame lattice; plus
the 1024 eval-length tail), and picks the budget scale that maximizes
audio-seconds/s/chip.

The implied B per (budget, Tout, Tin) replicates data/feeder.py
_pack_into_batches: B = min(frame_limit // Tout, quad_limit // (Tin^2+Tout^2))
rounded up to the batch lattice (batch_size_multiple=8).

Writes SWEEP_PACKING.json at the repo root and prints a summary table.
Run on the real chip: python tools/packing_sweep.py
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def implied_b(frame_limit, quad_limit, t_in, t_out, b_mult=8):
    b = min(frame_limit // t_out, quad_limit // (t_in * t_in + t_out * t_out))
    b = max(int(b), 1)
    return max((b // b_mult) * b_mult, b_mult) if b >= b_mult else b


def main():
    os.makedirs("/root/.cache/jax_compile", exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compile")
    import numpy as np
    from bench import _time_train_shape, train_step_matmul_flops, _peak_flops
    from __graft_entry__ import _example_batch
    from few_shot_transformer_tts_tpu.config import default_config
    from few_shot_transformer_tts_tpu.models import ByteToMel
    from few_shot_transformer_tts_tpu.parallel import make_mesh
    from few_shot_transformer_tts_tpu.train.loop import (
        create_state, device_batch)

    hp = default_config()
    model = ByteToMel(hp)
    mesh = make_mesh(data=-1, model=1)
    peak = _peak_flops(jax.devices()[0])
    log("device:", jax.devices()[0].device_kind)

    state = create_state(
        model, hp, 0,
        device_batch(_example_batch(hp, b=4, t_in=64, t_out=128)))
    state_host = jax.device_get(state)

    # Tout values the feeder's lattice emits for training (length filter
    # 240..800 -> padded 256..832) plus the eval-length tail at 1024.
    # Tin ~ Tout/4 reflects byte-per-frame ratios of the packed corpora
    # (~1 byte per 3-5 12.5 ms frames across the 38 languages).
    ref_frame, ref_quad = 8000, 7_000_000
    scales = [1, 2, 4]
    touts = [256, 448, 640, 832, 1024]
    results = []
    seen = set()
    for t_out in touts:
        t_in = -(-t_out // 4 // 32) * 32  # round_up(Tout/4, 32)
        for s in scales:
            b = implied_b(s * ref_frame, s * ref_quad, t_in, t_out)
            key = (b, t_in, t_out)
            if key in seen:
                continue
            seen.add(key)
            batch = _example_batch(hp, b=b, t_in=t_in, t_out=t_out)
            try:
                state, dur, loss = _time_train_shape(
                    model, hp, mesh, state, batch, steps=15, reps=3)
            except Exception as e:
                log("  (B=%d, Tin=%d, Tout=%d) failed: %r"
                    % (b, t_in, t_out, e))
                state = jax.device_put(state_host)
                results.append({"scale": s, "b": b, "t_in": t_in,
                                "t_out": t_out, "error": repr(e)})
                continue
            frames = int(np.sum(batch["target_lengths"]))
            audio_s = frames * hp.frame_shift_ms / 1000.0
            value = audio_s / dur
            mfu = train_step_matmul_flops(hp, b, t_in, t_out) / dur / peak
            log("scale=%dx B=%-4d Tin=%-4d Tout=%-4d  %.4f s/step  "
                "%7.1f audio_s/s/chip  MFU=%.1f%%"
                % (s, b, t_in, t_out, dur, value, 100 * mfu))
            results.append({"scale": s, "b": b, "t_in": t_in, "t_out": t_out,
                            "s_per_step": round(dur, 5),
                            "audio_s_per_sec": round(value, 1),
                            "mfu": round(mfu, 4)})

    # score each budget scale by its mean throughput across the Tout profile
    by_scale = {}
    for s in scales:
        pts = []
        for t_out in touts:
            t_in = -(-t_out // 4 // 32) * 32
            b = implied_b(s * ref_frame, s * ref_quad, t_in, t_out)
            match = [r for r in results
                     if (r["b"], r["t_in"], r["t_out"]) == (b, t_in, t_out)
                     and "audio_s_per_sec" in r]
            if match:
                pts.append(match[0]["audio_s_per_sec"])
        by_scale[s] = round(float(np.mean(pts)), 1) if pts else None
    log("mean audio_s/s/chip by budget scale:", by_scale)
    valid = {s: v for s, v in by_scale.items() if v is not None}
    best_scale = max(valid, key=valid.get) if valid else 1

    out = {"device": jax.devices()[0].device_kind,
           "reference_budgets": {"batch_frame_limit": ref_frame,
                                 "batch_frame_quad_limit": ref_quad},
           "results": results, "mean_by_scale": by_scale,
           "best_scale": best_scale,
           "chosen_budgets": {"batch_frame_limit": best_scale * ref_frame,
                              "batch_frame_quad_limit": best_scale * ref_quad}}
    path = os.path.join(REPO, "SWEEP_PACKING.json")
    json.dump(out, open(path, "w"), indent=1)
    log("wrote", path)
    print(json.dumps({"best_scale": best_scale, "mean_by_scale":
                      {str(k): v for k, v in by_scale.items()}}))


if __name__ == "__main__":
    main()
