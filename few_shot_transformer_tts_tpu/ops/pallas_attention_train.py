"""Training attention kernel: fused softmax + dropout forward with a custom
flash-style backward (Pallas/Mosaic TPU).

Motivation (measured, one TPU v5 lite chip, flagship config): generating the
attention/hidden dropout masks with the default threefry PRNG cost 57 ms of an
87 ms train step; the rbg PRNG cut that to 40 ms, and the remaining overhead
was dominated by (a) materializing [B, H, Tq, Tk] softmax/dropout tensors in
HBM across 18 attention blocks and (b) the split/combine-head transposes
(5.2 ms/step of pure data movement in the device profile).  This kernel keeps
logits, softmax, and the dropout mask in VMEM, regenerates the mask in the
backward pass from the same per-block seed (pltpu.prng_*), and reads Q/K/V in
the packed [B, T, H*D] projection layout with a static unroll over heads
inside the kernel (full-width blocks satisfy the TPU lane-tiling rule; head
slices live in registers), so no head transpose is ever materialized.

Semantics match the reference path exactly: q scaled by d_head**-0.5 (applied
in-kernel), softmax over biased logits, then dropout on the normalized weights
(reference transformer/attention.py:83-91), then the value matmul.

Forward  (per (b, q-tile), whole-K in VMEM, looping heads statically):
    s = (q*scale) @ k^T + bias;  p = softmax-numerator(s);  lse saved
    g = mask(p);  o = (g @ v) / (l * keep)     [dropout 1/keep folded here]
Backward (same grid; dk/dv accumulate across q-tiles):
    p  = exp(s - lse)            (true softmax, recomputed)
    delta = rowsum(do * o)       (== rowsum(dw * p), flash identity -- avoids
                                  a full multiply+reduce over [Tq, Tk])
    dv += g^T @ (do / keep)
    dw = mask(do @ v^T) / keep
    ds = p * (dw - delta)
    dq = (ds @ k) * scale;  dk += (ds*scale)^T @ q

The kernel is VPU-bound on the fp32 score elementwise work (measured: the
MXU matmuls alone would take ~0.07 ms of the ~1.0 ms forward), so the design
minimizes full-rectangle [Tq, Tk] passes: the dropout 1/keep rescale is
folded into the [Tq, d] output scale, the bias add is skipped entirely for
causal calls (the dispatch passes zeros there), and the backward replaces
rowsum(dw * p) with rowsum(do * o).  A chunked-K online-softmax variant that
skipped the fully-masked causal future was benchmarked and REJECTED: at the
reference's sequence lengths (<=~1000) the online rescale bookkeeping costs
more than the ~40% skipped area saves (1.99 ms vs 1.41 ms fwd+bwd at
B=16, T=448, H=8, D=768).  Whole-K with block_q = min(512, Tq_pad) wins.

Round-4 speed-of-light audit (SOL_r04.json; measured on-chip, flagship
shapes, fetch-timed paired-count estimator):

  * The kernel's rectangle VPU work is NOT the residual: a stripped variant
    doing only the two MXU matmuls runs 0.090 ms/fwd-call while the same
    variant with the full causal-mask+max+exp+sum+div chain runs 0.077 ms
    (noise-level) — the VPU pipeline overlaps the MXU, so the round-2
    "bf16 score storage" and "fused bias+exp" ideas are REJECTED: there is
    no serial VPU time to save.
  * Dropout PRNG + mask costs 0.035 ms of the 0.188 ms fwd call at rate 0.1
    (~0.6 ms/step across 18 calls) — kept; regeneration in the backward is
    what keeps the mask out of HBM.
  * Padding K/V time to 8 instead of 128 was tried and REJECTED: 0.508 vs
    0.520 ms fwd+bwd at T=448 (-2%, noise) but 0.171 vs 0.149 ms at T=192
    (+15% — Mosaic handles the 1.5x128-lane misalignment worse than the
    aligned 33% extra work).
  * Two costs the audit DID find and fix (isolated by incrementally adding
    features to a stripped kernel): the per-head elementwise fp32 divide in
    the output epilogue (+0.06 ms/call — now one reciprocal per row and a
    broadcast multiply) and the [H, TQ] lse layout whose per-head column
    store relayouted [TQ, 1] onto lanes (+0.05 ms/call — lse now lives
    [TQ, H], heads on lanes, stored and read by lane-select).  Measured
    fwd 0.222 -> 0.184 ms, fwd+bwd 0.551 -> 0.517 ms at rate 0.1.
  * The rest of the gap to the composite bound sits in Mosaic layout
    handling of the per-head 96-lane slices, not in removable ops.
Round-5 audit (ATTN_FIXEDCOST_r05.json; tools/attn_fixed_cost.py):

  * Per-grid-program fixed cost measured with an EMPTY-BODY pallas_call on
    the same grid/BlockSpecs: 0.005-0.008 ms for a whole 16-program call
    (~0.3-0.5 us/program, ~1.5% of the real 0.46 ms call) — the round-4
    "fixed per-call overhead" hypothesis is REFUTED; the residual is
    in-program.
  * block_b batch rows per program (1/2/4/8): fwd+bwd 0.464/0.490/0.527/
    0.568 ms — fatter programs REJECTED (ship 1); bit-equivalence across
    block_b parity-checked on chip with dropout on.
  * Mosaic grid dimension_semantics hints (fwd both dims "parallel", bwd
    iq "arbitrary" for the dk/dv accumulation): fwd 0.1574 -> 0.1545,
    fwd+bwd 0.466 -> 0.462 ms — small but free, default ON
    (FSTTS_ATTN_DIMSEM=0 restores unhinted grids).

  * Lane-aligning the head pitch (d 96 -> 128) was tried and REJECTED
    (round 4, measured at B=16 T=448 H=8, 401-call paired counts): the
    kernel alone IS 18% faster at an aligned 128-lane pitch even with 33%
    more matmul columns (0.406 vs 0.497 ms/call fwd+bwd), but every way of
    feeding it loses more than that upstream -- repacking q/k/v activations
    96->128 in XLA costs ~0.10 ms/call (0.503 total, a wash), and padding
    the projection WEIGHTS so q/k/v arrive pre-aligned adds 33% to the four
    projection matmuls' MXU time (proj+attn chain 0.719 vs 0.546 ms/call,
    a clear net loss).  The misalignment penalty is real but smaller than
    any available realignment cost at these dims.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e20
_PAD_NEG = -1e30
_MAX_BLOCK_Q = 512

# Mosaic's default scoped-VMEM budget is 16 MB; its accounting includes a
# slowly batch-dependent stack component that tips the whole-K backward just
# past 16 MB at B>=32 (measured: 17.69 MB at B=32, 18.91 MB at B=64 on v5e).
# v5e has 128 MB of physical VMEM per core; raise the kernel budget so the
# TPU-sized packed batches (2-4x the reference's GPU-VRAM-era limits) compile.
_VMEM_LIMIT = 64 * 1024 * 1024
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _compiler_params(bwd: bool):
    """Grid dimension-semantics hints for Mosaic.  The forward has no
    cross-program dependencies (both grid dims "parallel"); the backward
    accumulates dk/dv across q-tiles, so the iq dim must stay "arbitrary"
    (sequential revisits of the same output block).  Gated by
    FSTTS_ATTN_DIMSEM for the A/B; default set by measurement (see the
    module docstring round-5 notes)."""
    import os
    if os.environ.get("FSTTS_ATTN_DIMSEM", "1") == "0":
        return _COMPILER_PARAMS
    sem = ("parallel", "arbitrary") if bwd else ("parallel", "parallel")
    try:
        return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT,
                                    dimension_semantics=sem)
    except TypeError:  # older pallas without the field
        return _COMPILER_PARAMS


def _block_seed(seed_ref, b, h, iq):
    # distinct stream per (batch, head, q-tile); wraparound is fine
    return seed_ref[0, 0] + b * 1000003 + h * 10007 + iq * 101


def _mask_from_bits(shape, rate: float):
    bits = pltpu.prng_random_bits(shape)
    threshold = np.uint32(min(rate, 1.0) * 4294967296.0)
    return pltpu.bitcast(bits, jnp.uint32) >= threshold


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *,
                causal: bool, use_bias: bool, rate: float, tq: int,
                scale: float, num_heads: int, block_b: int):
    bb = pl.program_id(0)
    iq = pl.program_id(1)
    keep = 1.0 - rate
    if causal:
        tk_all = k_ref.shape[1]
        rows = iq * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, tk_all), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (tq, tk_all), 1)
        cmask = cols <= rows

    for i in range(block_b):              # static unroll over batch rows
        # (block_b ships 1: the round-5 itemization measured the per-program
        # fixed cost at ~1.5% of a call and fatter programs slower — see
        # _block_b_for; the knob is kept for experiments)
        b = bb * block_b + i
        q_all = q_ref[i]                          # [TQ, C]
        k_all = k_ref[i]                          # [TKall, C]
        v_all = v_ref[i]
        d = q_all.shape[1] // num_heads
        if use_bias:
            bias_row = bias_ref[i, 0][None, :]

        outs = []
        for h in range(num_heads):                # static unroll over heads
            q = q_all[:, h * d:(h + 1) * d]
            if scale != 1.0:
                q = (q.astype(jnp.float32) * scale).astype(q_all.dtype)
            k = k_all[:, h * d:(h + 1) * d]
            v = v_all[:, h * d:(h + 1) * d]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            if use_bias:
                s = s + bias_row
            if causal:
                s = jnp.where(cmask, s, NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)                    # [TQ, TKall] f32
            l = jnp.sum(p, axis=-1, keepdims=True)
            # lse lives [TQ, H] (time on sublanes, heads on lanes): a
            # per-head column store, where the old [H, TQ] layout forced a
            # relayout of every [TQ, 1] column onto lanes (+0.05 ms/call)
            lse_ref[i, :, h:h + 1] = m + jnp.log(l)
            if rate > 0.0:
                pltpu.prng_seed(_block_seed(seed_ref, b, h, iq))
                p = jnp.where(_mask_from_bits(p.shape, rate), p, 0.0)
            o = jax.lax.dot_general(p.astype(v.dtype), v,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            # one reciprocal per ROW, then a broadcast multiply: the
            # elementwise fp32 divide over [TQ, d] was +0.06 ms/call
            r = 1.0 / jnp.maximum(l * keep, 1e-30)
            outs.append(o * r)
        o_ref[i, :, :] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, lse_ref, do_ref,
                o_ref, dq_ref, dk_ref, dv_ref, *, causal: bool,
                use_bias: bool, rate: float, tq: int, scale: float,
                num_heads: int, block_b: int):
    bb = pl.program_id(0)
    iq = pl.program_id(1)

    @pl.when(iq == 0)
    def _init():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    keep = 1.0 - rate
    if causal:
        tk_all = k_ref.shape[1]
        rows = iq * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, tk_all), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (tq, tk_all), 1)
        cmask = cols <= rows

    for i in range(block_b):              # static unroll over batch rows
        b = bb * block_b + i
        q_all = q_ref[i]
        k_all = k_ref[i]
        v_all = v_ref[i]
        do_all = do_ref[i]
        o_all = o_ref[i]
        d = q_all.shape[1] // num_heads
        if use_bias:
            bias_row = bias_ref[i, 0][None, :]

        dqs = []
        dks = []
        dvs = []
        for h in range(num_heads):                # static unroll over heads
            q_raw = q_all[:, h * d:(h + 1) * d]
            if scale != 1.0:
                q = (q_raw.astype(jnp.float32) * scale).astype(q_raw.dtype)
            else:
                q = q_raw
            k = k_all[:, h * d:(h + 1) * d]
            v = v_all[:, h * d:(h + 1) * d]
            do = do_all[:, h * d:(h + 1) * d].astype(jnp.float32)
            o_h = o_all[:, h * d:(h + 1) * d].astype(jnp.float32)
            # rowsum(dw * p) over K == rowsum(do * o): [TQ, d] work instead
            # of a multiply+reduce pass over the [TQ, TKall] rectangle
            delta = jnp.sum(do * o_h, axis=-1, keepdims=True)

            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            if use_bias:
                s = s + bias_row
            if causal:
                s = jnp.where(cmask, s, NEG_INF)
            p = jnp.exp(s - lse_ref[i, :, h:h + 1])  # softmax, recomputed

            if rate > 0.0:
                pltpu.prng_seed(_block_seed(seed_ref, b, h, iq))
                kmask = _mask_from_bits(p.shape, rate)
                g = jnp.where(kmask, p, 0.0)
            else:
                g = p

            dv = jax.lax.dot_general(g.astype(do_all.dtype),
                                     (do * (1.0 / keep)).astype(do_all.dtype),
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dvs.append(dv)

            dg = jax.lax.dot_general(do, v.astype(jnp.float32),
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            if rate > 0.0:
                dw = jnp.where(kmask, dg, 0.0) * (1.0 / keep)
            else:
                dw = dg
            ds = p * (dw - delta)                  # [TQ, TKall] f32

            # ONE pre-scaled bf16 rectangle feeds both grad matmuls:
            # (ds*scale) @ k == (ds @ k) * scale, so this replaces two
            # separate full-rect converts plus a [TQ, d] fp32 post-multiply
            dss = (ds * scale).astype(q.dtype)
            dq = jax.lax.dot_general(dss, k,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dqs.append(dq)
            dk = jax.lax.dot_general(dss, q_raw,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dks.append(dk)
        dq_ref[i, :, :] = jnp.concatenate(dqs, axis=-1).astype(dq_ref.dtype)
        dk_ref[i, :, :] += jnp.concatenate(dks, axis=-1).astype(dk_ref.dtype)
        dv_ref[i, :, :] += jnp.concatenate(dvs, axis=-1).astype(dv_ref.dtype)


def _rup(x, m):
    return (x + m - 1) // m * m


def _pad_time(x, t_pad):
    if x.shape[1] == t_pad:
        return x
    return jnp.pad(x, ((0, 0), (0, t_pad - x.shape[1]), (0, 0)))


def _block_b_for(block_b=None):
    """Batch rows per grid program.  DEFAULT 1 — measured round 5 and
    REJECTED as a speedup (ATTN_FIXEDCOST_r05.json, B=16/T=448/H=8 chip
    measurements, tools/attn_fixed_cost.py):

      * an EMPTY-BODY pallas_call on the same grid/BlockSpecs runs the whole
        16-program call in 0.005-0.008 ms vs the real call's 0.46 ms — the
        per-program Mosaic fixed cost is ~0.3-0.5 us/program (~1.5% of the
        call), so there is nothing material to amortize;
      * block_b 1/2/4/8 measured fwd+bwd 0.464/0.490/0.527/0.568 ms/call —
        fatter programs make the BACKWARD slower (more live VMEM per
        program shrinks scheduling freedom), and the fwd gain (0.162 ->
        0.154 ms at 4) does not cover it.

    Together with round 4's stripped-kernel result (MXU-matmuls-only variant
    runs at the same speed as the full softmax chain) this pins the kernel's
    residual over its composite bound on in-program Mosaic layout handling
    of the 96-lane head slices — per-program overhead, VPU chain, PRNG, and
    every tried realignment (repack, padded weights, chunked-K, block_b)
    are each measured out.  The knob is kept for experiments; any block_b
    dividing B is bit-equivalent (dropout streams are seeded by global
    batch row — parity-checked on chip with dropout on)."""
    if block_b is not None:
        return block_b
    return 1


def _block_q_for(tq_len, block_q):
    """Adaptive q-tile: one big tile up to 512 rows (measured fastest --
    fewer grid steps, wider matmuls); beyond that, the MINIMUM number of
    EQUAL tiles <= 512 rather than fixed 512-row tiles -- fixed tiles pad
    e.g. the Tout=832 lattice point to 1024 q rows (+23% wasted rectangle),
    where two 416-row tiles cover it exactly.

    Tiles are rounded to 8 (the TPU sublane quantum), not 128: q/o/dq blocks
    carry tq second-to-minor, and the lse block's minor dim is the head
    count, which spans the full array -- the 128-lane rule never binds."""
    if block_q is not None:
        return block_q
    if tq_len <= _MAX_BLOCK_Q:
        return _rup(tq_len, 8)
    n_tiles = -(-tq_len // _MAX_BLOCK_Q)
    return _rup(-(-tq_len // n_tiles), 8)


def _specs(c, block_q, tk_pad, block_b):
    return [
        pl.BlockSpec((block_b, block_q, c), lambda ib, iq, *_: (ib, iq, 0)),
        pl.BlockSpec((block_b, tk_pad, c), lambda ib, iq, *_: (ib, 0, 0)),
        pl.BlockSpec((block_b, tk_pad, c), lambda ib, iq, *_: (ib, 0, 0)),
        pl.BlockSpec((block_b, 1, tk_pad), lambda ib, iq, *_: (ib, 0, 0)),
    ]


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12))
def mha_train(q, k, v, bias, seed, num_heads: int, rate: float, causal: bool,
              scale: float = 1.0, interpret: bool = False, block_q=None,
              use_bias: bool = True, block_b=None):
    """Fused multi-head attention with post-softmax dropout, packed layout.

    q [B,Tq,H*D]; k/v [B,Tk,H*D]; bias [B,Tk] additive (zeros for none;
    pass use_bias=False to skip the add entirely -- the causal dispatch does);
    seed [1,1] int32; scale multiplies q in-kernel (pass d_head**-0.5).
    ``block_b`` batch rows share one grid program (None = 1, the measured
    default — see _block_b_for; must divide B; the dropout streams are
    seeded by GLOBAL batch row, so results are identical across block_b
    choices).  Returns [B,Tq,H*D] with heads already re-packed.
    Differentiable in q/k/v.
    """
    o, _ = _fwd(q, k, v, bias, seed, num_heads, rate, causal, scale,
                interpret, block_q, use_bias, block_b)
    return o


def _fwd(q, k, v, bias, seed, num_heads, rate, causal, scale, interpret,
         block_q, use_bias, block_b=None):
    b, tq_len, c = q.shape
    tk_len = k.shape[1]
    block_q = _block_q_for(tq_len, block_q)
    tq_pad = _rup(tq_len, block_q)
    tk_pad = _rup(tk_len, 128)
    block_b = _block_b_for(block_b)
    assert b % block_b == 0, (
        "block_b=%d must divide batch %d (a non-divisor would silently "
        "leave the last rows' outputs uninitialized)" % (block_b, b))
    qp = _pad_time(q, tq_pad)
    kp = _pad_time(k, tk_pad)
    vp = _pad_time(v, tk_pad)
    biasp = bias
    if tk_pad != tk_len:
        biasp = jnp.pad(bias, ((0, 0), (0, tk_pad - tk_len)),
                        constant_values=_PAD_NEG)
    if causal:
        # beyond-length K columns are unreachable under the triangular mask
        # (valid queries only look backward), so no padding bias is needed
        assert tq_len == tk_len, "causal kernel requires self-attention"
    nq = tq_pad // block_q
    kernel = functools.partial(_fwd_kernel, causal=causal, use_bias=use_bias,
                               rate=float(rate), tq=block_q,
                               scale=float(scale), num_heads=num_heads,
                               block_b=block_b)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // block_b, nq),
        in_specs=_specs(c, block_q, tk_pad, block_b),
        out_specs=[
            pl.BlockSpec((block_b, block_q, c),
                         lambda ib, iq, *_: (ib, iq, 0)),
            pl.BlockSpec((block_b, block_q, num_heads),
                         lambda ib, iq, *_: (ib, iq, 0)),
        ],
    )
    o, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, tq_pad, c), q.dtype),
            jax.ShapeDtypeStruct((b, tq_pad, num_heads), jnp.float32),
        ],
        compiler_params=_compiler_params(bwd=False),
        interpret=interpret,
    )(seed, qp, kp, vp, biasp[:, None, :])
    o = o[:, :tq_len, :]
    return o, (q, k, v, bias, seed, lse, o)


def _fwd_rule(q, k, v, bias, seed, num_heads, rate, causal, scale, interpret,
              block_q, use_bias, block_b):
    return _fwd(q, k, v, bias, seed, num_heads, rate, causal, scale,
                interpret, block_q, use_bias, block_b)


def _bwd_rule(num_heads, rate, causal, scale, interpret, block_q, use_bias,
              block_b, res, do):
    q, k, v, bias, seed, lse, o = res
    b, tq_len, c = q.shape
    tk_len = k.shape[1]
    block_q = _block_q_for(tq_len, block_q)
    tq_pad = _rup(tq_len, block_q)
    tk_pad = _rup(tk_len, 128)
    block_b = _block_b_for(block_b)
    assert b % block_b == 0, (
        "block_b=%d must divide batch %d" % (block_b, b))
    qp = _pad_time(q, tq_pad)
    kp = _pad_time(k, tk_pad)
    vp = _pad_time(v, tk_pad)
    dop = _pad_time(do, tq_pad)
    op = _pad_time(o, tq_pad)
    biasp = bias
    if tk_pad != tk_len:
        biasp = jnp.pad(bias, ((0, 0), (0, tk_pad - tk_len)),
                        constant_values=_PAD_NEG)
    nq = tq_pad // block_q
    kernel = functools.partial(_bwd_kernel, causal=causal, use_bias=use_bias,
                               rate=float(rate), tq=block_q,
                               scale=float(scale), num_heads=num_heads,
                               block_b=block_b)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // block_b, nq),
        in_specs=_specs(c, block_q, tk_pad, block_b) + [
            pl.BlockSpec((block_b, block_q, num_heads),
                         lambda ib, iq, *_: (ib, iq, 0)),
            pl.BlockSpec((block_b, block_q, c),
                         lambda ib, iq, *_: (ib, iq, 0)),
            pl.BlockSpec((block_b, block_q, c),
                         lambda ib, iq, *_: (ib, iq, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_b, block_q, c),
                         lambda ib, iq, *_: (ib, iq, 0)),
            pl.BlockSpec((block_b, tk_pad, c), lambda ib, iq, *_: (ib, 0, 0)),
            pl.BlockSpec((block_b, tk_pad, c), lambda ib, iq, *_: (ib, 0, 0)),
        ],
    )
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, tq_pad, c), q.dtype),
            jax.ShapeDtypeStruct((b, tk_pad, c), k.dtype),
            jax.ShapeDtypeStruct((b, tk_pad, c), v.dtype),
        ],
        compiler_params=_compiler_params(bwd=True),
        interpret=interpret,
    )(seed, qp, kp, vp, biasp[:, None, :], lse, dop, op)
    dq = dq[:, :tq_len, :]
    dk = dk[:, :tk_len, :]
    dv = dv[:, :tk_len, :]
    dbias = jnp.zeros_like(bias)
    dseed = np.zeros(seed.shape, jax.dtypes.float0)
    return dq, dk, dv, dbias, dseed


mha_train.defvjp(_fwd_rule, _bwd_rule)
