"""Data-parallel scaling-efficiency benchmark.

Measures train-step throughput (audio-seconds/s) at increasing data-parallel
degrees over the available devices — the SURVEY.md section 2.2 target is
>= 85% efficiency at N >= 2.  Two modes:

  * weak (default): the global batch scales with the mesh (per-device batch
    fixed), matching how the reference's DDP is deployed; efficiency is the
    per-device rate vs the 1-device run.  Meaningful when each device has its
    own compute (real chips).
  * strong: the global batch is FIXED at ``per_device_batch * max(degrees)``
    and sharded over ever more devices; efficiency is sec_per_step(1) /
    sec_per_step(N).  On a virtual CPU mesh (N devices oversubscribing a few
    physical cores) this isolates the SPMD partitioning + collective overhead
    from compute scaling — ideal is 1.0 there, since the physical compute is
    constant — which is the honest multi-chip proxy this host can measure.

Timing uses fetch-forced completion (the loss scalar) with a paired-count
difference and a min over repeats — same estimator as bench.py; plain
``block_until_ready`` wall timing is unreliable through the remote-chip
tunnel and vulnerable to multi-second contention spikes.

Run: python -m few_shot_transformer_tts_tpu.parallel.scaling [--devices 1,2,4]
On a single-chip or CPU host, virtual devices can be forced with
--force_host_devices N (XLA host-platform device count; must be set before
JAX initializes, so it re-execs the interpreter).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _timed_steps(step, state, dbatch, rng, steps: int, reps: int = 3):
    """Per-step seconds: fetch-terminated paired-count difference, min over
    reps (see bench.py _time_train_shape for the rationale)."""
    import jax

    def chunk(n, off):
        nonlocal state
        tic = time.time()
        for i in range(n):
            state, losses = step(state, dbatch, jax.random.fold_in(rng, off + i))
        float(losses["loss"])
        return time.time() - tic

    dur = None
    for rep in range(reps):
        t1 = chunk(1, 1000 * rep)
        tn = chunk(steps + 1, 1000 * rep + 10)
        d = (tn - t1) / steps
        if d > 0 and (dur is None or d < dur):
            dur = d
    if dur is None:
        dur = chunk(steps + 1, 7000) / (steps + 1)
    return state, dur


def measure(hp, per_device_batch: int, t_in: int, t_out: int,
            degrees, steps: int = 10, mode: str = "weak"):
    import jax
    from ..models.tacotron import ByteToMel
    from ..train.loop import create_state, make_train_step, device_batch
    from . import make_mesh, shard_batch
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    from __graft_entry__ import _example_batch

    assert mode in ("weak", "strong"), mode
    model = ByteToMel(hp)
    results = []
    for n in degrees:
        mesh = make_mesh(data=n, model=1, devices=jax.devices()[:n])
        b = per_device_batch * (max(degrees) if mode == "strong" else n)
        batch = _example_batch(hp, b=b, t_in=t_in, t_out=t_out)
        state = create_state(model, hp, 0,
                             device_batch(batch))
        step = make_train_step(model, hp, mesh=mesh, donate=True)
        dbatch = shard_batch(device_batch(batch), mesh)
        # hardware PRNG where configured (threefry dropout-mask generation
        # alone costs tens of ms/step on the chip — config.py prng_impl)
        rng = jax.random.key(0, impl=hp.prng_impl)
        state, losses = step(state, dbatch, rng)  # compile + device placement
        float(losses["loss"])
        state, dur = _timed_steps(step, state, dbatch, rng, steps)
        audio_s = float(np.sum(batch["target_lengths"])) * \
            hp.frame_shift_ms / 1000.0
        results.append({"devices": n, "mode": mode, "batch": b,
                        "sec_per_step": dur,
                        "audio_s_per_sec": audio_s / dur,
                        "audio_s_per_sec_per_device": audio_s / dur / n})
    for r in results:
        if mode == "strong":
            # fixed work: overhead-free ideal keeps sec/step constant
            r["efficiency"] = results[0]["sec_per_step"] / r["sec_per_step"]
        else:
            r["efficiency"] = (r["audio_s_per_sec_per_device"]
                               / results[0]["audio_s_per_sec_per_device"])
    return results


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--devices", default=None,
                        help="comma list of DP degrees (default 1..all)")
    parser.add_argument("--per_device_batch", type=int, default=2)
    parser.add_argument("--t_in", type=int, default=64)
    parser.add_argument("--t_out", type=int, default=128)
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--mode", choices=("weak", "strong"), default="weak")
    parser.add_argument("--small", action="store_true",
                        help="use a small model config (CPU-friendly)")
    parser.add_argument("--force_host_devices", type=int, default=0)
    args = parser.parse_args()

    if args.force_host_devices:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   " --xla_force_host_platform_device_count=%d"
                                   % args.force_host_devices).strip()
        os.environ["FSTTS_SCALING_CPU"] = "1"

    import jax
    if os.environ.get("FSTTS_SCALING_CPU"):
        jax.config.update("jax_platforms", "cpu")

    from ..config import default_config, small_test_config
    hp = small_test_config() if args.small else default_config(
        use_bfloat16=jax.default_backend() == "tpu")

    n_dev = len(jax.devices())
    if args.devices:
        degrees = [int(d) for d in args.devices.split(",")]
    else:
        degrees = [d for d in [1, 2, 4, 8, 16, 32] if d <= n_dev]
    results = measure(hp, args.per_device_batch, args.t_in, args.t_out,
                      degrees, steps=args.steps, mode=args.mode)
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
