"""Flash-style blockwise attention kernel (Pallas/Mosaic TPU).

Replaces the materialized [B, H, Tq, Tk] softmax of the reference's attention
(reference transformer/attention.py:72-92, cuDNN matmuls + full attention
matrix in HBM) with an online-softmax kernel: logits never leave VMEM, memory
is O(Tq x D) per block, and the q@k^T / p@v matmuls run back-to-back on the
MXU.

Grid layout: (B, H, Tq_tiles, Tk_tiles) with the key dimension innermost;
running max / normalizer / accumulator live in VMEM scratch across the key
loop.  Additive key bias (the padding mask) is a [B, Tk] vector; causal
masking is generated in-kernel from tile indices.

Used on the full-sequence path when no alignment tensor is requested and
dropout is off (MultiheadAttention routes here); the jnp einsum path remains
the reference semantics.  Forward-only for now — training (which needs
attention-weight dropout and the backward pass) uses the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e20


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref,
                 m_scr, l_scr, acc_scr, *, causal: bool, nk: int,
                 tq: int, tk: int):
    ik = pl.program_id(3)
    iq = pl.program_id(2)

    # last key tile this query tile attends to (skip above-diagonal work)
    if causal:
        last_ik = jnp.minimum(nk - 1, (iq * tq + tq - 1) // tk)
    else:
        last_ik = nk - 1

    @pl.when(ik == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(ik <= last_ik)
    def _compute():
        q = q_ref[0, 0]                          # [TQ, D] native dtype (MXU)
        k = k_ref[0, 0]
        v = v_ref[0, 0]

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [TQ, TK]
        s = s + bias_ref[0, 0][None, :]          # key padding bias
        if causal:
            rows = iq * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0)
            cols = ik * tk + jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
            s = jnp.where(cols <= rows, s, NEG_INF)

        m_prev = m_scr[:, 0:1]                   # [TQ, 1]
        l_prev = l_scr[:, 0:1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)                   # [TQ, TK] f32
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

        pv = jax.lax.dot_general(p.astype(v.dtype), v,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # [TQ, D]
        acc_scr[...] = acc_scr[...] * alpha + pv
        m_scr[:, 0:1] = m_new
        l_scr[:, 0:1] = l_new

    @pl.when(ik == last_ik)
    def _finalize():
        o_ref[0, 0, :, :] = (acc_scr[...] /
                             jnp.maximum(l_scr[:, 0:1], 1e-30)
                             ).astype(o_ref.dtype)


def _attn_kernel_full(q_ref, k_ref, v_ref, bias_ref, o_ref, *,
                      causal: bool, tq: int):
    """Single-pass variant: the whole K/V for one (b, h) resides in VMEM
    (this model's sequences are <= ~1.1k, so K/V are a few hundred KB —
    SURVEY.md section 5 long-context note).  Grid is (B, H, Tq_tiles); no
    online-softmax state needed."""
    iq = pl.program_id(2)
    q = q_ref[0, 0]                              # [TQ, D]
    k = k_ref[0, 0]                              # [TK_all, D]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [TQ, TK_all]
    s = s + bias_ref[0, 0][None, :]
    if causal:
        tk_all = k.shape[0]
        rows = iq * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, tk_all), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (tq, tk_all), 1)
        s = jnp.where(cols <= rows, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    o_ref[0, 0, :, :] = (pv / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "interpret",
                                             "block_q", "block_k"))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    bias=None, causal: bool = False,
                    interpret: bool = False, block_q: int = 128,
                    block_k: int = 128) -> jnp.ndarray:
    """q [B,H,Tq,D] (pre-scaled), k/v [B,H,Tk,D].

    bias: None, a [B,1,1,Tk]/[B,Tk] additive key-padding bias, or a
    [1,1,T,T] causal bias tensor (detected and converted to in-kernel
    masking).  Returns [B, H, Tq, D] in q's dtype.
    """
    b, h, tq_len, d = q.shape
    tk_len = k.shape[2]

    if bias is not None and bias.ndim == 4:
        if bias.shape[0] == 1 and bias.shape[2] == bias.shape[3]:
            # reference causal bias tensor (transformer/common.py:41-43)
            causal = True
            bias = None
        else:
            bias = bias[:, 0, 0, :]              # [B, Tk]
    if bias is None:
        bias = jnp.zeros((b, tk_len), jnp.float32)
    bias = bias.astype(jnp.float32)

    # pad sequence dims to tile multiples; padded keys get NEG_INF bias
    def rup(x, m):
        return (x + m - 1) // m * m
    tq_pad = rup(tq_len, block_q)
    tk_pad = rup(tk_len, block_k)
    if tq_pad != tq_len:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, tq_pad - tq_len), (0, 0)))
    if tk_pad != tk_len:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, tk_pad - tk_len), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, tk_pad - tk_len), (0, 0)))
        # strictly below the reference's -1e20 masking value, so that rows
        # whose every real key is masked still softmax uniformly over the
        # real keys (matching jnp semantics), not over kernel padding
        bias = jnp.pad(bias, ((0, 0), (0, tk_pad - tk_len)),
                       constant_values=-1e30)

    nq = tq_pad // block_q
    nk = tk_pad // block_k

    # whole-K single-pass kernel while K/V fit comfortably in VMEM; blocked
    # online-softmax kernel beyond that (long-context path)
    if tk_pad <= 2048:
        kernel = functools.partial(_attn_kernel_full, causal=causal,
                                   tq=block_q)
        out = pl.pallas_call(
            kernel,
            grid=(b, h, nq),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d),
                             lambda ib, ih, iq: (ib, ih, iq, 0)),
                pl.BlockSpec((1, 1, tk_pad, d),
                             lambda ib, ih, iq: (ib, ih, 0, 0)),
                pl.BlockSpec((1, 1, tk_pad, d),
                             lambda ib, ih, iq: (ib, ih, 0, 0)),
                pl.BlockSpec((1, 1, tk_pad),
                             lambda ib, ih, iq: (ib, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, d),
                                   lambda ib, ih, iq: (ib, ih, iq, 0)),
            out_shape=jax.ShapeDtypeStruct((b, h, tq_pad, d), q.dtype),
            interpret=interpret,
        )(q, k, v, bias[:, None, :])
        return out[:, :, :tq_len, :]

    kernel = functools.partial(_attn_kernel, causal=causal, nk=nk,
                               tq=block_q, tk=block_k)
    out = pl.pallas_call(
        kernel,
        grid=(b, h, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d),
                         lambda ib, ih, iq, ik: (ib, ih, iq, 0)),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda ib, ih, iq, ik: (ib, ih, ik, 0)),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda ib, ih, iq, ik: (ib, ih, ik, 0)),
            pl.BlockSpec((1, 1, block_k),
                         lambda ib, ih, iq, ik: (ib, 0, ik)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda ib, ih, iq, ik: (ib, ih, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, tq_pad, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),   # running max
            pltpu.VMEM((block_q, 128), jnp.float32),   # running sum
            pltpu.VMEM((block_q, d), jnp.float32),     # output accumulator
        ],
        interpret=interpret,
    )(q, k, v, bias[:, None, :])

    return out[:, :, :tq_len, :]
