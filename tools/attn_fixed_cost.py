"""Itemize the training attention kernel's per-grid-program fixed cost.

Round-4 left the kernel 5.6x its VPU bound at B=16/T=448 but only 2.2x at
B=8/T=1024 — a shape dependence that points at a per-program fixed cost
(round-4 VERDICT weak #3 / next #3).  At B=16/T=448 the fwd grid is 16
programs and the step runs 18 attention calls fwd+bwd: ~576 programs/step,
so even ~10 us/program of Mosaic prologue/DMA turnaround is ~6 ms/step —
the size of the unexplained residual.

This tool measures, on the chip:
  1. an EMPTY-BODY pallas_call on the same grid/BlockSpecs (per-program
     floor: prologue/epilogue + block DMA turnaround, no compute);
  2. the real kernel fwd and fwd+bwd at block_b in {1, 2, 4, 8} (batch rows
     per grid program — fewer, fatter programs);
  3. --parity: asserts the block_b variants produce identical outputs/grads
     WITH dropout on (the streams are seeded by global batch row, so any
     block_b is bit-equivalent; interpret-mode tests can't check this
     because pltpu.prng_* doesn't lower on CPU).

Writes ATTN_FIXEDCOST_r05.json.  Timing: paired-count grad+scan chains with
fetch-forced completion, MIN over repeats (signal sized to hundreds of ms,
see CLAUDE.md timing notes).

OUTCOME (committed in ATTN_FIXEDCOST_r05.json and the kernel docstring):
the hypothesis was REFUTED — the empty-body call costs 0.005-0.008 ms
(~1.5% of the real call; ~0.3-0.5 us/program), and block_b>1 makes the
backward SLOWER (0.464/0.490/0.527/0.568 ms at 1/2/4/8).  The kernel's
residual over its composite bound is in-program Mosaic layout handling of
the 96-lane head slices, with every realignment separately measured out.

Usage: python tools/attn_fixed_cost.py [--b 16] [--t 448] [--parity]
"""

import argparse
import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from few_shot_transformer_tts_tpu.ops import pallas_attention_train as pat


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def empty_body_time(b, t, c, block_b, n, repeats, dev):
    """Per-call ms of a pallas_call with the fwd grid/BlockSpecs and a
    near-empty body (writes one zero row per output block)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    tk_pad = pat._rup(t, 128)
    block_q = pat._block_q_for(t, None)
    tq_pad = pat._rup(t, block_q)
    nq = tq_pad // block_q
    num_heads = 8

    def kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref):
        o_ref[...] = jnp.zeros_like(o_ref)
        lse_ref[...] = jnp.zeros_like(lse_ref)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // block_b, nq),
        in_specs=pat._specs(c, block_q, tk_pad, block_b),
        out_specs=[
            pl.BlockSpec((block_b, block_q, c),
                         lambda ib, iq, *_: (ib, iq, 0)),
            pl.BlockSpec((block_b, block_q, num_heads),
                         lambda ib, iq, *_: (ib, iq, 0)),
        ])

    def call(x):
        o, _ = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((b, tq_pad, c), x.dtype),
                       jax.ShapeDtypeStruct((b, tq_pad, num_heads),
                                            jnp.float32)],
            compiler_params=pat._COMPILER_PARAMS)(
                jnp.zeros((1, 1), jnp.int32), x, x, x,
                jnp.zeros((b, 1, tk_pad), jnp.float32))
        return o

    x = jax.device_put(jnp.ones((b, tq_pad, c), jnp.bfloat16), dev)

    @functools.partial(jax.jit, static_argnums=1)
    def chain(x, reps):
        def body(c, _):
            return call(c) + x * 1e-6, None
        out, _ = jax.lax.scan(body, x, None, length=reps)
        return out

    return _paired_ms(lambda r: chain(x, r), n, repeats)


def _paired_ms(run, n, repeats):
    def timed(reps):
        tic = time.time()
        out = run(reps)
        float(out.ravel()[0])
        return time.time() - tic
    timed(1), timed(n)
    best = 1e9
    for _ in range(repeats):
        best = min(best, (timed(n) - timed(1)) / (n - 1))
    return best * 1e3


def kernel_time(b, t, c, heads, rate, block_b, n, repeats, dev,
                with_bwd=True):
    scale = (c // heads) ** -0.5
    rng = np.random.RandomState(0)
    q = jax.device_put(jnp.asarray(rng.randn(b, t, c) * 0.3, jnp.bfloat16),
                       dev)
    bias = jax.device_put(jnp.zeros((b, t), jnp.float32), dev)
    seed = jax.device_put(jnp.zeros((1, 1), jnp.int32), dev)

    def f(x):
        o = pat.mha_train(x, x, x, bias, seed, heads, rate, False, scale,
                          False, None, True, block_b)
        return jnp.sum(o.astype(jnp.float32))

    if with_bwd:
        step = jax.grad(f)
    else:
        step = lambda x: pat.mha_train(x, x, x, bias, seed, heads, rate,
                                       False, scale, False, None, True,
                                       block_b)

    @functools.partial(jax.jit, static_argnums=1)
    def chain(x, reps):
        def body(c, _):
            return step(c).astype(c.dtype) * 0.999 + 0.001, None
        out, _ = jax.lax.scan(body, x, None, length=reps)
        return out

    return _paired_ms(lambda r: chain(q, r), n, repeats)


def parity_check(b, t, c, heads, rate, dev):
    """On-chip: block_b variants must agree bitwise-ish with dropout ON."""
    scale = (c // heads) ** -0.5
    rng = np.random.RandomState(1)
    q = jax.device_put(jnp.asarray(rng.randn(b, t, c) * 0.3, jnp.bfloat16),
                       dev)
    bias = jax.device_put(jnp.zeros((b, t), jnp.float32), dev)
    seed = jax.device_put(jnp.asarray([[13]], jnp.int32), dev)

    def loss(x, bb):
        o = pat.mha_train(x, x, x, bias, seed, heads, rate, False, scale,
                          False, None, True, bb)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    outs = {}
    for bb in (1, 2, 4):
        if b % bb:
            continue
        val, grad = jax.jit(jax.value_and_grad(
            functools.partial(loss, bb=bb)))(q)
        outs[bb] = (float(val), np.asarray(grad, np.float32))
    ref = outs[1]
    for bb, (val, grad) in outs.items():
        np.testing.assert_allclose(val, ref[0], rtol=1e-6,
                                   err_msg="loss block_b=%d" % bb)
        np.testing.assert_allclose(grad, ref[1], atol=0, rtol=0,
                                   err_msg="grad block_b=%d" % bb)
    log("parity ok across block_b=%s at rate=%.1f" % (list(outs), rate))
    return sorted(outs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=16)
    ap.add_argument("--t", type=int, default=448)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--c", type=int, default=768)
    ap.add_argument("--rate", type=float, default=0.1)
    ap.add_argument("--n", type=int, default=401)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--parity", action="store_true")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ATTN_FIXEDCOST_r05.json"))
    args = ap.parse_args()

    os.makedirs("/root/.cache/jax_compile", exist_ok=True)
    from few_shot_transformer_tts_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # honor JAX_PLATFORMS=cpu despite the axon plugin
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compile")
    if jax.default_backend() != "tpu":
        print(json.dumps({"skip": "no tpu backend"}))
        return
    dev = jax.devices()[0]

    if args.parity:
        parity_check(args.b, args.t, args.c, args.heads, args.rate, dev)

    b, t, c = args.b, args.t, args.c
    out = {"shape": {"b": b, "t": t, "heads": args.heads, "c": c,
                     "rate": args.rate},
           "grid_programs_fwd_blockb1": b * max(1, pat._rup(
               t, pat._block_q_for(t, None)) // pat._block_q_for(t, None)),
           "empty_body_ms_per_call": {}, "fwd_ms_per_call": {},
           "fwd_bwd_ms_per_call": {}}
    for bb in (1, 2, 4, 8):
        if b % bb:
            continue
        e = empty_body_time(b, t, c, bb, args.n, args.repeats, dev)
        f = kernel_time(b, t, c, args.heads, args.rate, bb, args.n,
                        args.repeats, dev, with_bwd=False)
        fb = kernel_time(b, t, c, args.heads, args.rate, bb, args.n,
                         args.repeats, dev, with_bwd=True)
        out["empty_body_ms_per_call"][str(bb)] = round(e, 4)
        out["fwd_ms_per_call"][str(bb)] = round(f, 4)
        out["fwd_bwd_ms_per_call"][str(bb)] = round(fb, 4)
        log("block_b=%d: empty %.4f ms, fwd %.4f ms, fwd+bwd %.4f ms"
            % (bb, e, f, fb))

    json.dump(out, open(args.out, "w"), indent=1)
    log("wrote", args.out)
    print(json.dumps({k: out[k] for k in
                      ("empty_body_ms_per_call", "fwd_bwd_ms_per_call")}))


if __name__ == "__main__":
    main()
