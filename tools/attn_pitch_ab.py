"""A/B harness for the attention kernel's head-pitch layout question.

The training kernel (ops/pallas_attention_train.py) reads q/k/v in the packed
[B, T, H*D] projection layout; at the flagship decoder dims D = 768/8 = 96,
so every per-head slice straddles the TPU's 128-lane tiling.  This harness
measures, on the real chip, whether realigning the pitch to 128 lanes pays:

  kernel-96      the shipped layout (C = H*96)
  kernel-128     the kernel alone at an aligned pitch (C = H*128)
  repack-96to128 pad activations 96->128 per head in XLA around the kernel
  chain-96       x -> q/k/v projections -> kernel -> out projection, shipped
  chain-128      same chain with zero-padded projection weights so q/k/v
                 arrive pre-aligned (no activation repack; exact same math --
                 pad lanes are zero through every matmul and the softmax sums
                 over K rows, not lanes)

Round-4 verdicts (B=16, T=448, H=8, v5e; recorded in the kernel docstring):
kernel-128 wins 18% over kernel-96 (0.406 vs 0.497 ms fwd+bwd), but
repack-96to128 gives the win back (~0.10 ms/call of relayout) and chain-128
is a clear net loss (0.719 vs 0.546 ms/call: +33% MXU on four projection
matmuls outweighs the kernel saving).  The shipped 96-lane pitch stands.

Timing: grad-chained lax.scan (next q := dq, so XLA cannot hoist the body),
fetch-terminated 1-vs-N paired counts, MIN over repeats (CLAUDE.md: the
tunneled chip's dispatch RTT is hundreds of ms; size signals to ~100+ ms).
"""

import argparse
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from few_shot_transformer_tts_tpu.ops.pallas_attention_train import mha_train


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=16)
    ap.add_argument("--t", type=int, default=448)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--d", type=int, default=96)
    ap.add_argument("--rate", type=float, default=0.1)
    ap.add_argument("--n", type=int, default=401,
                    help="calls in the big chunk of the paired count")
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_compile")
    dev = jax.devices()[0]
    B, T, H, D = args.b, args.t, args.heads, args.d
    C, C128 = H * D, H * 128
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(ks[0], (B, T, C), jnp.bfloat16)
    Wq = jax.random.normal(ks[1], (C, C), jnp.bfloat16) * 0.02
    Wk = jax.random.normal(ks[2], (C, C), jnp.bfloat16) * 0.02
    Wv = jax.random.normal(ks[3], (C, C), jnp.bfloat16) * 0.02
    Wo = jax.random.normal(ks[4], (C, C), jnp.bfloat16) * 0.02
    bias = jnp.zeros((B, T), jnp.float32)
    seed = jnp.zeros((1, 1), jnp.int32)
    x, Wq, Wk, Wv, Wo, bias, seed = jax.device_put(
        (x, Wq, Wk, Wv, Wo, bias, seed), dev)
    q96 = jax.device_put(jax.random.normal(ks[5], (B, T, C), jnp.bfloat16),
                         dev)
    q128 = jax.device_put(
        jax.random.normal(ks[5], (B, T, C128), jnp.bfloat16), dev)

    def attn(q, k, v, d):
        return mha_train(q, k, v, bias, seed, H, args.rate, False, d ** -0.5)

    def kernel_direct(q, d):
        return jnp.sum(attn(q, q, q, d).astype(jnp.float32))

    def repack(q):
        q4 = q.reshape(B, T, H, D)
        qp = jnp.pad(q4, ((0, 0), (0, 0), (0, 0), (0, 128 - D)))
        qp = qp.reshape(B, T, C128)
        o = attn(qp, qp, qp, D)
        return jnp.sum(
            o.reshape(B, T, H, 128)[..., :D].astype(jnp.float32))

    def pad_w_cols(w):
        w4 = w.reshape(w.shape[0], H, D)
        return jnp.pad(w4, ((0, 0), (0, 0), (0, 128 - D))).reshape(
            w.shape[0], C128)

    def pad_w_rows(w):
        w4 = w.reshape(H, D, w.shape[1])
        return jnp.pad(w4, ((0, 0), (0, 128 - D), (0, 0))).reshape(
            C128, w.shape[1])

    def chain96(xx):
        o = attn(xx @ Wq, xx @ Wk, xx @ Wv, D)
        return jnp.sum((o @ Wo).astype(jnp.float32))

    # Padded weights are prepared ONCE, outside the timed grad+scan body, and
    # committed to the device like the 96-pitch weights: padding inside the
    # body would charge chain-128 for per-call weight repacking if XLA failed
    # to hoist the loop-invariant pads (ADVICE r04), muddying the pure-MXU
    # attribution.
    Wq128, Wk128, Wv128, Wo128 = jax.device_put(
        (pad_w_cols(Wq), pad_w_cols(Wk), pad_w_cols(Wv), pad_w_rows(Wo)), dev)

    def chain128(xx):
        o = attn(xx @ Wq128, xx @ Wk128, xx @ Wv128, D)
        return jnp.sum((o @ Wo128).astype(jnp.float32))

    def timed(fn, init, n):
        def body(q, _):
            return jax.grad(fn)(q).astype(q.dtype), None
        out, _ = jax.lax.scan(body, init, None, length=n)
        return out

    def rate_ms(fn, init, label):
        f = jax.jit(timed, static_argnums=(0, 2))
        float(f(fn, init, 1).ravel()[0])
        float(f(fn, init, args.n).ravel()[0])
        best = 1e9
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            float(f(fn, init, 1).ravel()[0])
            t1 = time.perf_counter()
            float(f(fn, init, args.n).ravel()[0])
            t2 = time.perf_counter()
            best = min(best, ((t2 - t1) - (t1 - t0)) / (args.n - 1))
        print(f"{label}: {best * 1e3:.3f} ms/call (fwd+bwd)", flush=True)
        return best

    rate_ms(functools.partial(kernel_direct, d=D), q96,
            f"kernel-{D} (shipped pitch)  ")
    rate_ms(functools.partial(kernel_direct, d=128), q128,
            "kernel-128 (aligned pitch)  ")
    rate_ms(repack, q96, f"repack-{D}to128 (XLA pad)   ")
    rate_ms(chain96, x, f"chain-{D} (proj+attn+proj)  ")
    rate_ms(chain128, x, "chain-128 (padded weights)  ")


if __name__ == "__main__":
    main()
