"""Per-op TPU profile of the flagship train step.

Captures a ``jax.profiler`` trace of the benchmark train step (same shapes as
bench.py) and prints a per-category device-time breakdown parsed straight from
the xplane protobuf — no TensorBoard UI needed (the hosted
tensorboard-plugin-profile converter is version-mismatched on this image, so
the XSpace proto is walked directly).

Usage:
    python tools/profile_step.py [--steps 5] [--out /tmp/tputrace]

The reference has no profiling beyond wall-clock windows
(reference train.py:195-200); this tool is part of the SURVEY.md section 5
tracing/profiling upgrade, alongside the --profile_dir hooks in train.py.

Measured breakdown (2026-08-18, one TPU v5 lite chip, 29.0 ms/step,
B=16 Tin=192 Tout=448):

    11.3 ms  XLA fusions (FFN/projection matmuls + Adam update fusions)
     8.8 ms  Pallas attention kernels (VPU-bound on fp32 score elementwise;
             forward measured at the VPU roofline for its op count)
     2.8 ms  multiply_reduce fusions (LayerNorm backward, L2-reg reduction)
     2.0 ms  postnet convolutions
     2.3 ms  copy/slice-done (XLA VMEM prefetch of sliced weights)
     0.4 ms  rng-bit-generator (non-attention dropout masks, rbg PRNG)
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import sys
from collections import defaultdict

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(out_dir: str, steps: int, decode: bool = False, b: int = 16,
            t_in: int = 192, t_out: int = 448, hparams: str = "") -> None:
    import jax
    os.makedirs("/root/.cache/jax_compile", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compile")
    from few_shot_transformer_tts_tpu.config import default_config
    from few_shot_transformer_tts_tpu.models import ByteToMel
    from few_shot_transformer_tts_tpu.parallel import make_mesh, shard_batch
    from few_shot_transformer_tts_tpu.train.loop import (
        create_state, make_train_step, device_batch)
    from __graft_entry__ import _example_batch

    hp = default_config().parse(hparams)
    model = ByteToMel(hp)
    batch = _example_batch(hp, b=b, t_in=t_in, t_out=t_out)
    mesh = make_mesh(data=-1, model=1)
    state = create_state(model, hp, 0,
                         device_batch(batch))

    if decode:
        from few_shot_transformer_tts_tpu.infer import synthesize_batch
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        dec_batch = {k: batch[k][:8] for k in (
            "inputs", "input_lengths", "input_spk_ids",
            "input_language_vecs")}
        synthesize_batch(model, variables, dec_batch, hp, deterministic=True,
                         collect_alignments=False, max_frames=512)  # compile
        jax.profiler.start_trace(out_dir)
        for _ in range(steps):
            synthesize_batch(model, variables, dec_batch, hp,
                             deterministic=True, collect_alignments=False,
                             max_frames=512)
        jax.profiler.stop_trace()
        return

    train_step = make_train_step(model, hp, mesh=mesh, donate=True)
    dbatch = shard_batch(device_batch(batch), mesh)
    rng = jax.random.key(0, impl=hp.prng_impl)
    for i in range(4):  # compile + warm
        state, losses = train_step(state, dbatch, jax.random.fold_in(rng, i))
    jax.block_until_ready(losses["loss"])
    jax.profiler.start_trace(out_dir)
    for i in range(steps):
        state, losses = train_step(state, dbatch,
                                   jax.random.fold_in(rng, 100 + i))
    jax.block_until_ready(losses["loss"])
    jax.profiler.stop_trace()


def classify(name: str) -> str:
    if "attentions_" in name:
        return "pallas-attention-kernels"
    if re.match(r"%?(convolution|conv)", name):  # '%' prefix varies by version
        return "convolution"
    if "all-reduce" in name:
        return "all-reduce"
    base = name.split(" = ")[0].lstrip("%")
    return re.sub(r"[.\d]+$", "", base)


def summarize(out_dir: str, steps: int, top: int = 25,
              individual: bool = False) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E501  pure-python parse
    paths = sorted(glob.glob(os.path.join(
        out_dir, "plugins/profile/*/*.xplane.pb")))
    if not paths:
        raise SystemExit(f"no xplane.pb under {out_dir}")
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    tpu = [p for p in xs.planes if p.name.startswith("/device:TPU")]
    if not tpu:
        raise SystemExit("no TPU plane in trace (ran on CPU?)")
    plane = tpu[0]
    emeta = {k: v.name for k, v in plane.event_metadata.items()}
    ops = [l for l in plane.lines if l.name == "XLA Ops"]
    if not ops:
        raise SystemExit("no 'XLA Ops' line in TPU plane")
    dur = defaultdict(float)
    cnt = defaultdict(int)
    for e in ops[0].events:
        n = emeta.get(e.metadata_id, "?")
        c = n if individual else classify(n)
        dur[c] += e.duration_ps / 1e9 / steps  # ps -> ms, per step
        cnt[c] += 1
    total = sum(dur.values())
    print(f"device busy: {total:.2f} ms/step over {steps} steps "
          f"({paths[-1]})")
    for c, d in sorted(dur.items(), key=lambda x: -x[1])[:top]:
        label = c[:110] if individual else c
        print(f"{d:8.3f} ms  x{max(cnt[c] // steps, 1):5d}  {label}")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--b", type=int, default=16)
    ap.add_argument("--t-in", type=int, default=192)
    ap.add_argument("--t-out", type=int, default=448)
    ap.add_argument("--out", default="/tmp/tputrace")
    ap.add_argument("--decode", action="store_true",
                    help="profile the AR-decode loop instead of the train step"
                         " (per-step numbers are per synthesize_batch call)")
    ap.add_argument("--summarize-only", action="store_true",
                    help="parse an existing trace directory")
    ap.add_argument("--individual", action="store_true",
                    help="rank individual HLO ops instead of categories "
                         "(shows which LN-backward / fusion instance costs "
                         "what)")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--hparams", default="",
                    help="k=v,... config overrides for the profiled step")
    args = ap.parse_args()
    if not args.summarize_only:
        capture(args.out, args.steps, decode=args.decode,
                b=args.b, t_in=args.t_in, t_out=args.t_out,
                hparams=args.hparams)
    summarize(args.out, args.steps, top=args.top,
              individual=args.individual)


if __name__ == "__main__":
    main()
