"""Data-parallel scaling-efficiency benchmark.

Measures train-step throughput (audio-seconds/s) at increasing data-parallel
degrees over the available devices and reports efficiency relative to the
1-device rate — the SURVEY.md section 2.2 target is >= 85% at N >= 2.  The
global batch scales with the mesh (weak scaling), matching how the reference's
DDP is deployed (per-rank batch fixed).

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


def measure(hp, per_device_batch: int, t_in: int, t_out: int,
            degrees, steps: int = 10):
    import jax
    from ..models.tacotron import ByteToMel
    from ..train.loop import create_state, make_train_step, device_batch
    from . import make_mesh, shard_batch
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    from __graft_entry__ import _example_batch

    model = ByteToMel(hp)
    results = []
    for n in degrees:
        mesh = make_mesh(data=n, model=1, devices=jax.devices()[:n])
        batch = _example_batch(hp, b=per_device_batch * n, t_in=t_in,
                               t_out=t_out)
        state = create_state(model, hp, 0,
                             device_batch(batch))
        step = make_train_step(model, hp, mesh=mesh, donate=True)
        dbatch = shard_batch(device_batch(batch), mesh)
        rng = jax.random.PRNGKey(0)
        state, losses = step(state, dbatch, rng)
        jax.block_until_ready(losses["loss"])
        tic = time.time()
        for i in range(steps):
            state, losses = step(state, dbatch, jax.random.fold_in(rng, i))
        jax.block_until_ready(losses["loss"])
        dur = (time.time() - tic) / steps
        audio_s = float(np.sum(batch["target_lengths"])) * \
            hp.frame_shift_ms / 1000.0
        results.append({"devices": n, "sec_per_step": dur,
                        "audio_s_per_sec": audio_s / dur,
                        "audio_s_per_sec_per_device": audio_s / dur / n})
    base = results[0]["audio_s_per_sec_per_device"]
    for r in results:
        r["efficiency"] = r["audio_s_per_sec_per_device"] / base
    return results


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--devices", default=None,
                        help="comma list of DP degrees (default 1..all)")
    parser.add_argument("--per_device_batch", type=int, default=2)
    parser.add_argument("--t_in", type=int, default=64)
    parser.add_argument("--t_out", type=int, default=128)
    parser.add_argument("--steps", type=int, default=10)
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
                      degrees, steps=args.steps)
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
