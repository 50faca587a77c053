"""On-chip fused-vs-XLA AR-decode check: bf16 parity + pipelined-dispatch A/B.

Runs the REAL Mosaic compilation of ops/pallas_decode.py at flagship dims
(decoder_hidden=768, 6 layers, 8 heads) — the interpreter-mode tests in
tests/test_pallas_decode.py cannot catch tiling/lowering issues or measure
anything (round-3 VERDICT weak #2).  Invoked by tests/test_tpu_chip.py (skips
off-TPU) and usable standalone.

Parity protocol: the stop head's bias is pinned to -10 so both paths generate
exactly ``--frames`` frames (no stop-flip nondeterminism near logit 0); mels
are compared elementwise.  Both paths run the same bf16 weight pre-cast; the
residual tolerance is the bf16 ordering difference amplified through the AR
feedback (each frame's ~1e-2 mel error re-enters via the prenet).

Timing protocol (same as bench.py): queue N identical jitted decode calls
without blocking, block once; per-call device time = (t_N - t_1)/(N - 1), the
tunnel RTT cancelling in the subtraction.

Prints ONE JSON line, e.g.
  {"ok": true, "max_abs_diff": ..., "frames": ..., "b": ...,
   "fused_ms_per_call": ..., "xla_ms_per_call": ...}
"""

import argparse
import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=128,
                    help="generation cap (both paths forced to generate all)")
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--t-in", type=int, default=192)
    ap.add_argument("--timing-calls", type=int, default=6)
    ap.add_argument("--skip-timing", action="store_true")
    ap.add_argument("--collect-alignments", action="store_true",
                    help="also collect cross-attention alignments (the eval "
                         "service's mode; bench.py times without)")
    ap.add_argument("--atol", type=float, default=0.25,
                    help="elementwise mel tolerance (mel range is +-4; bf16 "
                         "ordering noise amplified over the AR feedback)")
    args = ap.parse_args()

    os.makedirs("/root/.cache/jax_compile", exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compile")
    import jax.numpy as jnp
    import numpy as np

    if jax.default_backend() != "tpu":
        print(json.dumps({"ok": False, "skip": "no tpu backend",
                          "backend": jax.default_backend()}))
        return

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _example_batch
    from few_shot_transformer_tts_tpu.config import default_config
    from few_shot_transformer_tts_tpu.models import ByteToMel
    from few_shot_transformer_tts_tpu.infer.synthesize import (
        _decode_loop, prepare_decode_inputs)

    hp = default_config()
    model = ByteToMel(hp)
    batch = _example_batch(hp, b=args.b, t_in=args.t_in, t_out=64)

    # init on the CPU backend (remote TPU init compiles are slow; CLAUDE.md);
    # the Pallas training-attention kernel can't lower on CPU, so init with it
    # off — the param structure/values are identical
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        variables = ByteToMel(hp.replace(use_pallas_attention=False)).init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            **batch, train=True)
    # pin the stop head shut so both paths generate exactly `frames` frames
    sn = dict(variables["params"]["decoder"]["stop_net"])
    sn["bias"] = jnp.full_like(sn["bias"], -10.0)
    dec = dict(variables["params"]["decoder"])
    dec["stop_net"] = sn
    params = dict(variables["params"])
    params["decoder"] = dec
    # COMMITTED placement (explicit device): uncommitted arrays from a bare
    # device_put are re-validated per dispatch by this plugin in degraded
    # tunnel phases — measured at ~10 s per decode call vs 0.2 s committed
    dev = jax.devices()[0]
    variables = {"params": jax.device_put(params, dev),
                 "batch_stats": jax.device_put(variables["batch_stats"], dev)}

    dec_batch = {k: batch[k] for k in
                 ("inputs", "input_lengths", "input_spk_ids",
                  "input_language_vecs")}
    inp, ilen, spk, lvec = prepare_decode_inputs(dec_batch, hp)
    rng = jax.random.PRNGKey(0)
    call_args = (model, variables, jnp.asarray(inp), jnp.asarray(ilen),
                 jnp.asarray(spk), jnp.asarray(lvec), rng)
    kw = dict(max_frames=args.frames, deterministic=True,
              collect_alignments=args.collect_alignments,
              collect_self_alignments=False)

    def run(use_fused):
        tic = time.time()
        out = _decode_loop(*call_args, **kw, use_fused=use_fused)
        jax.block_until_ready(out)
        log("  %s path: first call (compile) %.1fs"
            % ("fused" if use_fused else "xla", time.time() - tic))
        return out

    ref = run(False)
    got = run(True)

    n_ref, n_got = int(ref[5]), int(got[5])
    mel_ref = np.asarray(ref[1], np.float32)[:, :n_ref]
    mel_got = np.asarray(got[1], np.float32)[:, :n_got]
    diff = float(np.max(np.abs(mel_got - mel_ref))) \
        if n_ref == n_got else float("inf")
    ok = n_ref == n_got == args.frames and diff < args.atol
    log("parity: n_steps %d vs %d, max|mel_aft diff| = %.4f (atol %.2f)"
        % (n_ref, n_got, diff, args.atol))

    result = {"ok": bool(ok), "max_abs_diff": round(diff, 5),
              "frames": args.frames, "b": args.b, "t_in": args.t_in,
              "device": jax.devices()[0].device_kind}

    if not args.skip_timing:
        def per_call(use_fused, reps=3):
            # paired-count pipelined dispatch; completion forced by fetching
            # the LAST call's tiny target_lengths (block_until_ready does
            # not block reliably through the tunnel), min over reps
            def run_n(n):
                tic = time.time()
                outs = [_decode_loop(*call_args, **kw, use_fused=use_fused)
                        for _ in range(n)]
                np.asarray(outs[-1][2])
                return time.time() - tic
            run_n(1)
            n = args.timing_calls
            best = None
            for _ in range(reps):
                d = (run_n(n) - run_n(1)) / (n - 1)
                if d > 0 and (best is None or d < best):
                    best = d
            return best if best is not None \
                else max((run_n(n) - run_n(1)) / (n - 1), 1e-9)
        xla_ms = per_call(False) * 1e3
        fused_ms = per_call(True) * 1e3
        log("device-side per call: xla %.1f ms, fused %.1f ms (%d frames, B=%d)"
            % (xla_ms, fused_ms, args.frames, args.b))
        result.update(
            xla_ms_per_call=round(xla_ms, 2),
            fused_ms_per_call=round(fused_ms, 2),
            xla_frames_per_sec=round(args.frames * args.b / (xla_ms / 1e3), 1),
            fused_frames_per_sec=round(
                args.frames * args.b / (fused_ms / 1e3), 1))

    print(json.dumps(result))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
