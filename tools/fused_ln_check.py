"""On-chip A/B: fused LayerNorm kernel vs XLA LN in the full train step.

SOL_r05 arithmetic says XLA's LN-backward reduce fusions run at 3.8x their
bytes/HBM bound (2.89 ms measured vs 0.76 ms bound at B=16/192/448) — ~2 ms
of step time is recoverable IF a one-pass kernel actually reaches the
stream bound.  This tool measures the decision: the flagship train step
with hp.use_fused_layernorm off vs on, paired-count timed, plus a loss
parity check.  The measured winner sets the config default
(config.py use_fused_layernorm).

Usage: python tools/fused_ln_check.py [--b 16] [--t-in 192] [--t-out 448]
"""

import argparse
import functools
import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_step(hp, batch):
    import jax
    from few_shot_transformer_tts_tpu.models import ByteToMel
    from few_shot_transformer_tts_tpu.train.loop import create_state, \
        make_train_step
    model = ByteToMel(hp)
    state = create_state(model, hp, 0, batch)
    step = make_train_step(model, hp, donate=True)
    dev = jax.devices()[0]
    state = jax.device_put(state, dev)
    batch = jax.device_put(batch, dev)
    rng = jax.device_put(jax.random.key(0, impl=hp.prng_impl), dev)
    return step, state, batch, rng


def time_step(step, state, batch, rng, n, repeats):
    import jax

    def run(reps):
        nonlocal state
        tic = time.time()
        for _ in range(reps):
            state, losses = step(state, batch, rng)
        loss = float(losses["loss"])
        return time.time() - tic, loss

    run(1)
    run(n)
    best, loss = 1e9, None
    for _ in range(repeats):
        t1, _ = run(1)
        tn, loss = run(n)
        best = min(best, (tn - t1) / (n - 1))
    return best, loss


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=16)
    ap.add_argument("--t-in", type=int, default=192)
    ap.add_argument("--t-out", type=int, default=448)
    ap.add_argument("--n", type=int, default=30)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    os.makedirs("/root/.cache/jax_compile", exist_ok=True)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from few_shot_transformer_tts_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # honor JAX_PLATFORMS=cpu despite the axon plugin
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compile")
    if jax.default_backend() != "tpu":
        print(json.dumps({"skip": "no tpu backend"}))
        return
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _example_batch
    from few_shot_transformer_tts_tpu.config import default_config

    hp0 = default_config()
    batch = _example_batch(hp0, b=args.b, t_in=args.t_in, t_out=args.t_out)
    out = {"shape": {"b": args.b, "t_in": args.t_in, "t_out": args.t_out}}
    losses = {}
    for fused in (False, True):
        hp = hp0.replace(use_fused_layernorm=fused)
        step, state, dbatch, rng = build_step(hp, batch)
        sec, loss = time_step(step, state, dbatch, rng, args.n, args.repeats)
        key = "fused_ln" if fused else "xla_ln"
        out[key + "_sec_per_step"] = round(sec, 5)
        losses[fused] = loss
        log("%s: %.2f ms/step (loss after timing %.4f)"
            % (key, sec * 1e3, loss))
    out["loss_xla"] = round(losses[False], 4)
    out["loss_fused"] = round(losses[True], 4)
    out["speedup"] = round(out["xla_ln_sec_per_step"]
                           / out["fused_ln_sec_per_step"], 4)
    out["winner"] = "fused" if out["speedup"] > 1.0 else "xla"
    if args.out:
        json.dump(out, open(args.out, "w"), indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
