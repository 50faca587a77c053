"""Fused AR decode-step kernel: one Pallas call per generated frame runs all
decoder layers (LN -> fused QKV -> cached causal self-attention -> out-proj ->
LN -> cross-attention over encoder memory -> out-proj -> LN -> FFN, with
residuals) for a single frame.

Replaces the ~47-small-XLA-ops-per-frame ``decode_step`` path
(models/modules.py decode_step; reference synthesize.py:35-54 re-forwards the
whole prefix per frame with no cache at all).  Why a kernel (profiled on one
TPU v5 lite chip, flagship config, B=8, 512-frame cap):

  * The XLA einsums over the KV caches read the FULL cache capacity every
    frame (``bhd,bhtd->bht`` lowers to a broadcast-multiply-reduce over
    [B, H, Tcap, D]) — ~92 us/frame at a 512 cap regardless of how little of
    the cache is filled.  The kernel keeps the caches in HBM and DMA-streams
    only ``ceil(step/256)`` blocks, so attention cost follows the true
    prefix length.
  * The ~46 M decoder weights re-stream from HBM every frame.  The kernel
    takes them as grid-blocked VMEM inputs stacked over layers, so Pallas
    double-buffers layer l+1's weights while layer l computes, and the
    (bf16-cast, via infer/synthesize pre-cast) stream is the only copy.
  * The [B, hidden] residual stream stays in a VMEM scratch across all layers
    (fp32); nothing per-frame round-trips HBM except the per-layer weight
    stream, the cache prefix, and the tiny kernel outputs.

Measured outcome (v5e, flagship dims, B=8, 512-frame cap, device-side via
tools/tpu_decode_check.py): v2 closed v1's 1.8x gap but still
trails the XLA KV-cache path slightly — 185 ms vs 173 ms per decode — so
``use_pallas_decode`` defaults to OFF (config.py) and the kernel remains a
parity-tested option.  The XLA while-loop body is already small enough that
the saved cache-prefix HBM traffic does not pay for the kernel's per-block
VPU work at these shapes.

Design notes (the first cut was SLOWER than the XLA path — 611 vs 339
us/frame — for two measured reasons, both fixed here):

  * Per-(head, block) VPU ops with 96-lane (misaligned) slices dominated:
    ~8 heads x 2 ops x 2 passes per block.  v2 reduces over heads with ONE
    one-hot [C, H] "segment" matmul per block on the MXU (logits) and its
    transpose (broadcasting weights back to lanes), so the per-block op count
    is constant in H.  The weight buffers keep heads CONCATENATED
    ([.., T, H*D], the projection layout): Mosaic has no lowering for
    minor-dim-splitting reshapes, and this layout needs none anywhere — the
    cache update on the XLA side is one dynamic_update_slice of [L, B, C].
  * Sequential start->wait DMA per block serialized ~3-5 us of latency per
    block x 4 passes x 6 layers.  v2 double-buffers the cache stream (slot
    i+1's DMA in flight while block i computes) and takes the cross-attention
    memory as grid-blocked VMEM inputs (prefetched during the PREVIOUS
    layer's compute) whenever it fits VMEM, falling back to the manual
    stream for long inputs.

The softmax buffer is laid out [B, T, H] (time on sublanes, heads on lanes)
so block stores, the softmax, and the weight-broadcast matmul all run without
relayouts.

Numerics follow the repo convention: matmuls in the param dtype (bf16 on TPU)
with fp32 accumulation, LN/softmax statistics in fp32.  The fp32 residual
stream is a deliberate (strictly tighter) divergence from the XLA path's
bf16 residuals; parity is tested in fp32 configs at 1e-5 through the
interpreter (tests/test_pallas_decode.py) and on-chip in bf16 at flagship
dims against the XLA path (tests/test_tpu_chip.py, subprocess off the forced
CPU mesh; 0.09 max mel diff over 512 AR frames).

Dropout-on decode (the reference's ``m.eval(); m.decoder.train()`` sampling
mode) and self-alignment collection keep the XLA path — see the dispatch in
infer/synthesize.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PAD_NEG = -1e30
_TB = 256          # cache/memory streaming block (frames)
_MEM_VMEM_MAX = 256  # cross-memory length held as blocked VMEM input

_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=112 * 1024 * 1024)


def _rup(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _ln(x, scale, bias, eps=1e-6):
    """fp32 LayerNorm matching flax nn.LayerNorm(epsilon=1e-6)."""
    m = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - m
    v = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc * jax.lax.rsqrt(v + eps) * scale[None, :] + bias[None, :]


def _mm(a, w):
    """[M, K] x [K, N] -> [M, N] fp32 accumulation on the MXU."""
    return jax.lax.dot_general(a, w, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _head_segments(c: int, h: int, dtype):
    """One-hot [C, H] matrix mapping lane c to its head group (and [H, C]
    transpose), built from iotas — reduces/broadcasts over heads as a single
    MXU matmul instead of per-head 96-lane slices."""
    d = c // h
    seg = (jax.lax.broadcasted_iota(jnp.int32, (c, h), 0) // d ==
           jax.lax.broadcasted_iota(jnp.int32, (c, h), 1)).astype(dtype)
    seg_t = (jax.lax.broadcasted_iota(jnp.int32, (h, c), 1) // d ==
             jax.lax.broadcasted_iota(jnp.int32, (h, c), 0)).astype(dtype)
    return seg, seg_t


def _block_logits(q, kblk, seg):
    """Per-head logits of one query row against a K block.

    q [B, C] fp32 (pre-scaled); kblk [B, TB, C]; seg [C, H] one-hot.
    Returns [B, TB, H] fp32: products in bf16 (matching the XLA path's bf16
    MXU logits), head-summed on the MXU via seg.
    """
    b, tb, c = kblk.shape
    prod = q[:, None, :].astype(kblk.dtype) * kblk          # [B, TB, C]
    flat = prod.reshape(b * tb, c)                          # leading merge
    return _mm(flat, seg).reshape(b, tb, seg.shape[1])


def _block_context(w, vblk, seg_t):
    """Context contribution of one V block.

    w [B, TB, H] fp32 softmax weights; vblk [B, TB, C]; seg_t [H, C].
    Returns [B, C] fp32.
    """
    b, tb, c = vblk.shape
    wrep = _mm(w.reshape(b * tb, -1).astype(seg_t.dtype),
               seg_t).reshape(b, tb, c)                     # lane-broadcast
    return jnp.sum(wrep * vblk.astype(jnp.float32), axis=1)


def _softmax_rows(lg, t_used, fresh_logit=None):
    """Softmax over lg[:, :t_used, :] ([B, T, H] fp32, -1e30 padded), jointly
    with an optional fresh logit [B, H] (the current position, self-attention
    only).  Writes normalized weights back into lg and returns the fresh
    weight [B, H] (zeros when no fresh logit)."""
    rows = lg[:, :t_used, :]
    m = jnp.max(rows, axis=1)                               # [B, H]
    if fresh_logit is not None:
        m = jnp.maximum(m, fresh_logit)
    p = jnp.exp(rows - m[:, None, :])
    den = jnp.sum(p, axis=1)
    if fresh_logit is not None:
        pf = jnp.exp(fresh_logit - m)
        den = den + pf
        fresh_w = pf / den
    else:
        fresh_w = jnp.zeros_like(m)
    lg[:, :t_used, :] = p / den[:, None, :]
    return fresh_w


def _stream_pass(src, l, nb, bufs, sems, consume, init):
    """Double-buffered block stream over src[l, :, i*TB:(i+1)*TB, :].

    ``nb`` may be traced.  consume(i, blk, carry) -> carry runs on block i
    while block i+1's DMA is in flight.
    """
    def dma(slot, i):
        t0 = pl.multiple_of(i * _TB, _TB)
        return pltpu.make_async_copy(
            src.at[l, :, pl.ds(t0, _TB), :], bufs.at[slot], sems.at[slot])

    @pl.when(nb > 0)
    def _warm():
        dma(0, 0).start()

    def body(i, carry):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nb)
        def _next():
            dma(1 - slot, i + 1).start()

        dma(slot, i).wait()
        return consume(i, bufs[slot], carry)

    return jax.lax.fori_loop(0, nb, body, init)


def _kernel(step_ref, x_ref, lns_ref, wqkv_ref, wout_ref, wq_ref, wxout_ref,
            w1_ref, w2_ref, ck_ref, cv_ref, mk_ref, mv_ref, mbias_ref,
            xout_ref, align_ref, knew_ref, vnew_ref,
            xs, kbuf, vbuf, lg, sem, *, num_heads: int, t_mem: int,
            mem_in_vmem: bool):
    l = pl.program_id(0)
    step = step_ref[0]
    b, c = x_ref.shape
    h = num_heads
    d = c // h
    wdt = wqkv_ref.dtype
    scale = float(d) ** -0.5
    seg, seg_t = _head_segments(c, h, wdt)

    @pl.when(l == 0)
    def _seed():
        xs[...] = x_ref[...].astype(jnp.float32)

    x = xs[...]                                        # [B, C] fp32

    # ---------------- causal self-attention over the cached prefix ----------
    xn = _ln(x, lns_ref[0, 0], lns_ref[0, 1])
    qkv = _mm(xn.astype(wdt), wqkv_ref[0])             # [B, 3C] fp32
    q = qkv[:, :c] * scale
    k_f = qkv[:, c:2 * c]
    v_f = qkv[:, 2 * c:]
    knew_ref[0] = k_f.astype(knew_ref.dtype)
    vnew_ref[0] = v_f.astype(vnew_ref.dtype)
    fresh_logit = _mm((q * k_f).astype(wdt), seg)      # [B, H]

    lg[...] = jnp.full(lg.shape, _PAD_NEG, jnp.float32)
    nb = jax.lax.div(step + _TB - 1, _TB)

    def k_consume(i, kblk, _):
        t0 = pl.multiple_of(i * _TB, _TB)
        s = _block_logits(q, kblk, seg)
        # 3-D iota: inserting a minor dim on an i1 mask has no Mosaic lowering
        pos = t0 + jax.lax.broadcasted_iota(jnp.int32, (b, _TB, h), 1)
        s = jnp.where(pos < step, s, _PAD_NEG)
        lg[:, pl.ds(t0, _TB), :] = s
        return 0

    _stream_pass(ck_ref, l, nb, kbuf, sem, k_consume, 0)
    fresh_w = _softmax_rows(lg, lg.shape[1], fresh_logit)

    def v_consume(i, vblk, ctx):
        t0 = pl.multiple_of(i * _TB, _TB)
        return ctx + _block_context(lg[:, pl.ds(t0, _TB), :], vblk, seg_t)

    ctx = _stream_pass(cv_ref, l, nb, vbuf, sem, v_consume,
                       jnp.zeros((b, c), jnp.float32))
    ctx = ctx + _mm(fresh_w.astype(wdt), seg_t) * v_f
    x = x + _mm(ctx.astype(wdt), wout_ref[0])

    # ---------------- cross-attention over the encoder memory ---------------
    xn = _ln(x, lns_ref[0, 2], lns_ref[0, 3])
    qx = _mm(xn.astype(wdt), wq_ref[0]) * scale

    lg[...] = jnp.full(lg.shape, _PAD_NEG, jnp.float32)
    if mem_in_vmem:
        # memory blocks live in VMEM (prefetched during the previous layer)
        s = _block_logits(qx, mk_ref[0], seg)
        lg[:, :t_mem, :] = s + mbias_ref[...][:, :, None]
        _softmax_rows(lg, t_mem)
        ctx = _block_context(lg[:, :t_mem, :], mv_ref[0], seg_t)
    else:
        nmb = t_mem // _TB                             # static trip count

        def mk_consume(i, kblk, _):
            t0 = pl.multiple_of(i * _TB, _TB)
            s = _block_logits(qx, kblk, seg)
            lg[:, pl.ds(t0, _TB), :] = \
                s + mbias_ref[:, pl.ds(t0, _TB)][:, :, None]
            return 0

        _stream_pass(mk_ref, l, nmb, kbuf, sem, mk_consume, 0)
        _softmax_rows(lg, t_mem)

        def mv_consume(i, vblk, ctx):
            t0 = pl.multiple_of(i * _TB, _TB)
            return ctx + _block_context(lg[:, pl.ds(t0, _TB), :], vblk, seg_t)

        ctx = _stream_pass(mv_ref, l, nmb, vbuf, sem, mv_consume,
                           jnp.zeros((b, c), jnp.float32))
    align_ref[0] = lg[:, :t_mem, :]                    # [B, Tm, H] weights
    x = x + _mm(ctx.astype(wdt), wxout_ref[0])

    # ---------------- FFN ----------------------------------------------------
    xn = _ln(x, lns_ref[0, 4], lns_ref[0, 5])
    hid = jnp.maximum(_mm(xn.astype(wdt), w1_ref[0]), 0.0)
    x = x + _mm(hid.astype(wdt), w2_ref[0])

    xs[...] = x
    xout_ref[...] = x


def decoder_frame_step(x, step, w, cache_k, cache_v, mem_k, mem_v, mem_bias,
                       *, num_heads: int, interpret: bool = False):
    """One frame through all decoder layers.

    x [B, C] fp32 (prenet output + PE, dropout off); step scalar int32;
    w: dict from stack_decoder_params; cache_k/v [L, B, Tcap, C] (packed-head
    projection layout) with Tcap a multiple of 256 and positions < step valid;
    mem_k/v [L, B, Tm, C] with Tm a multiple of 256; mem_bias [B, Tm] fp32
    additive padding bias.

    Returns (x_out [B, C] fp32 pre-final-LN, align [L, B, Tm, H] fp32
    cross-attention weights, k_new [L, B, C], v_new [L, B, C]) — the caller
    writes k/v_new into the caches at ``step`` with one dynamic_update_slice
    (kept outside the kernel: the while-carry caches are donated, so XLA
    updates in place).
    """
    n_layers, b, t_cap, c = cache_k.shape
    h = num_heads
    t_mem = mem_k.shape[2]
    assert t_cap % _TB == 0 and t_mem % _TB == 0, (t_cap, t_mem)
    f = w["w_ffn1"].shape[2]
    cdt = cache_k.dtype
    mem_in_vmem = t_mem <= _MEM_VMEM_MAX

    kernel = functools.partial(_kernel, num_heads=h, t_mem=t_mem,
                               mem_in_vmem=mem_in_vmem)
    full = lambda *shape: pl.BlockSpec(shape, lambda l, *_: (0,) * len(shape))
    per_l = lambda *shape: pl.BlockSpec(
        (1,) + shape, lambda l, *_: (l,) + (0,) * len(shape))
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    mem_spec = per_l(b, t_mem, c) if mem_in_vmem else any_spec

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_layers,),
        in_specs=[
            full(b, c),                    # x
            per_l(6, c),                   # lns
            per_l(c, 3 * c),               # w_qkv
            per_l(c, c),                   # w_out
            per_l(c, c),                   # w_q
            per_l(c, c),                   # w_xout
            per_l(c, f),                   # w_ffn1
            per_l(f, c),                   # w_ffn2
            any_spec, any_spec,            # cache_k, cache_v
            mem_spec, mem_spec,            # mem_k, mem_v
            full(b, t_mem),                # mem_bias
        ],
        out_specs=[
            full(b, c),                    # x_out
            per_l(b, t_mem, h),            # align
            per_l(b, c),                   # k_new
            per_l(b, c),                   # v_new
        ],
        scratch_shapes=[
            pltpu.VMEM((b, c), jnp.float32),               # xs
            pltpu.VMEM((2, b, _TB, c), cdt),               # kbuf x2 slots
            pltpu.VMEM((2, b, _TB, c), cdt),               # vbuf x2 slots
            pltpu.VMEM((b, max(t_cap, t_mem), h), jnp.float32),  # lg
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, c), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, b, t_mem, h), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, b, c), cdt),
            jax.ShapeDtypeStruct((n_layers, b, c), cdt),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(jnp.asarray(step, jnp.int32).reshape(1), x, w["lns"], w["w_qkv"],
      w["w_out"], w["w_q"], w["w_xout"], w["w_ffn1"], w["w_ffn2"],
      cache_k, cache_v, mem_k, mem_v, mem_bias)


def stack_decoder_params(dec_params, n_layers: int):
    """Stack the TransformerDecoder per-layer params over a leading layer dim.

    dec_params: ``variables['params']['decoder']['decoder']`` (the flax
    TransformerDecoder subtree; layer0 width == hidden is enforced by
    models/modules.py).  Matmul kernels keep their stored dtype (bf16 when the
    caller pre-cast them — infer/synthesize.py); LN params are stacked fp32.
    ``w_kv`` (cross-attention K/V projection) is returned for the XLA-side
    encoder-memory precompute, not passed to the kernel.
    """
    def over(fmt, *path):
        leaves = []
        for i in range(n_layers):
            node = dec_params[fmt % i]
            for p in path:
                node = node[p]
            leaves.append(node)
        return jnp.stack(leaves)

    lns = jnp.stack([
        jnp.stack([
            dec_params["attn_layer_norms_%d" % i]["scale"],
            dec_params["attn_layer_norms_%d" % i]["bias"],
            dec_params["encdec_layer_norms_%d" % i]["scale"],
            dec_params["encdec_layer_norms_%d" % i]["bias"],
            dec_params["ffn_layer_norms_%d" % i]["scale"],
            dec_params["ffn_layer_norms_%d" % i]["bias"],
        ]).astype(jnp.float32)
        for i in range(n_layers)])
    return {
        "lns": lns,
        "w_qkv": over("self_attentions_%d", "qkv_transform", "kernel"),
        "w_out": over("self_attentions_%d", "output_transform", "kernel"),
        "w_q": over("encdec_attentions_%d", "q_transform", "kernel"),
        "w_kv": over("encdec_attentions_%d", "kv_transform", "kernel"),
        "w_xout": over("encdec_attentions_%d", "output_transform", "kernel"),
        "w_ffn1": over("ffn_layers_%d", "input_layer", "kernel"),
        "w_ffn2": over("ffn_layers_%d", "output_layer", "kernel"),
    }


def project_memory(enc, w_kv, out_dtype, pad_to: int = _TB):
    """Cross-attention K/V for all layers in the packed [L, B, TmP, C] layout.

    enc [B, Tm, C_mem] (the encoder memory concat); w_kv [L, C_mem, 2C].
    Equivalent to the per-layer kv_transform + split of the XLA path
    (models/attention.py project_kv) without the head split; the time axis is
    padded to a multiple of ``pad_to`` (kernel DMA block size).
    """
    c2 = w_kv.shape[2]
    c = c2 // 2
    kv = jnp.einsum("btc,lcd->lbtd", enc.astype(w_kv.dtype), w_kv,
                    preferred_element_type=jnp.float32)
    tm = kv.shape[2]
    tmp = _rup(max(tm, 1), pad_to)
    if tmp != tm:
        kv = jnp.pad(kv, [(0, 0), (0, 0), (0, tmp - tm), (0, 0)])
    return kv[..., :c].astype(out_dtype), kv[..., c:].astype(out_dtype)


def padded_cap(max_frames: int) -> int:
    return _rup(max(max_frames, 1), _TB)
