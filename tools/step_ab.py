"""Generic on-chip A/B of the flagship train step under two hparam strings.

Same harness discipline as tools/fused_ln_check.py (paired-count chains,
fetch-forced completion, MIN over repeats): builds the jitted step for each
config, times both, prints one JSON line.  Use for any config-flag decision
that needs a step-level number, e.g.:

    python tools/step_ab.py --a "" --b "conv_as_matmul=True"
"""

import argparse
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", default="", help="hparams for variant A")
    ap.add_argument("--b", required=True, help="hparams for variant B")
    ap.add_argument("--batch", type=int, default=16)
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
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _example_batch
    from few_shot_transformer_tts_tpu.config import default_config
    from fused_ln_check import build_step, time_step

    hp0 = default_config()
    batch = _example_batch(hp0, b=args.batch, t_in=args.t_in,
                           t_out=args.t_out)
    out = {"shape": {"b": args.batch, "t_in": args.t_in, "t_out": args.t_out},
           "a": args.a, "b": args.b}
    for key, spec in (("a", args.a), ("b", args.b)):
        hp = hp0.parse(spec)
        step, state, dbatch, rng = build_step(hp, batch)
        sec, loss = time_step(step, state, dbatch, rng, args.n, args.repeats)
        out[key + "_sec_per_step"] = round(sec, 5)
        out[key + "_loss"] = round(loss, 4)
        print("%s (%r): %.2f ms/step" % (key, spec, sec * 1e3),
              file=sys.stderr, flush=True)
    out["b_speedup_vs_a"] = round(out["a_sec_per_step"]
                                  / out["b_sec_per_step"], 4)
    if args.out:
        json.dump(out, open(args.out, "w"), indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
