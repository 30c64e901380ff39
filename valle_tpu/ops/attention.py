"""Fused attention kernels (Pallas/TPU) with an XLA fallback.

The reference's innermost hot path is torch's fused MHA
(``valle/modules/activation.py:341,383-427``, SURVEY N2). Here:

- ``flash_attention``: blocked online-softmax attention with an additive
  bias, computed tile-by-tile in VMEM — the (S, T) score matrix never
  touches HBM. Used by training/NAR full-sequence passes and prefill.
  Backward recomputes attention (flash-style memory: residuals are just
  q, k, v, bias — XLA's AD of naive attention would save the (B,H,S,T)
  probabilities).
- ``naive_attention``: the einsum reference path (always available; used
  for small shapes and as the correctness oracle).

Kernel layout: grid (B, H, S/bq, T/bk); the T dimension is the innermost
("arbitrary") axis accumulating into VMEM scratch (m, l, acc).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
NEG_INF = -1e30  # finite: tiles can be fully masked (padding), exp() -> 0


def naive_attention(q, k, v, bias):
    """q (B,H,S,D); k,v (B,H,T,D); bias broadcastable (B,1|H,S,T)."""
    dh = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(dh)
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref,
                  m_scr, l_scr, acc_scr, *, sm_scale, nk):
    ik = jax.lax.axis_index if False else None  # doc: innermost grid axis
    import jax.experimental.pallas as pl

    kk = pl.program_id(3)

    @pl.when(kk == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0].astype(jnp.float32)          # (bq, D)
    k = k_ref[0, 0].astype(jnp.float32)          # (bk, D)
    v = v_ref[0, 0].astype(jnp.float32)          # (bk, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale  # (bq, bk)
    s = s + bias_ref[0, 0].astype(jnp.float32)

    m_prev = m_scr[:]                             # (bq, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)                        # (bq, bk)
    alpha = jnp.exp(m_prev - m_new)               # (bq, 1)
    l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    m_scr[:] = m_new

    @pl.when(kk == nk - 1)
    def _finish():
        o_ref[0, 0] = (acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)).astype(
            o_ref.dtype)


def _flash_forward(q, k, v, bias, *, block_q, block_k, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, S, D = q.shape
    T = k.shape[2]
    bq = min(block_q, S)
    bk = min(block_k, T)
    assert S % bq == 0 and T % bk == 0, (S, T, bq, bk)
    nq, nk = S // bq, T // bk
    sm_scale = 1.0 / math.sqrt(D)

    bias_h = bias.shape[1]  # 1 or H

    grid = (B, H, nq, nk)
    kernel = functools.partial(_flash_kernel, sm_scale=sm_scale, nk=nk)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, D), lambda b, h, iq, ik: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, bk, D), lambda b, h, iq, ik: (b, h, ik, 0)),
            pl.BlockSpec((1, 1, bk, D), lambda b, h, iq, ik: (b, h, ik, 0)),
            pl.BlockSpec(
                (1, 1, bq, bk),
                lambda b, h, iq, ik: (b, h if bias_h > 1 else 0, iq, ik)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, D),
                               lambda b, h, iq, ik: (b, h, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, S, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(q, k, v, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_attention(q, k, v, bias, block_q=DEFAULT_BLOCK_Q,
                    block_k=DEFAULT_BLOCK_K, interpret=False):
    """Fused attention. bias must be additive (B, 1|H, S, T), finite values
    or -inf (clamped to a finite NEG_INF inside)."""
    bias = jnp.maximum(bias.astype(jnp.float32), NEG_INF)
    return _flash_forward(q, k, v, bias, block_q=block_q, block_k=block_k,
                          interpret=interpret)


def _fa_fwd(q, k, v, bias, block_q, block_k, interpret):
    out = flash_attention(q, k, v, bias, block_q, block_k, interpret)
    return out, (q, k, v, bias)


def _fa_bwd(block_q, block_k, interpret, res, g):
    q, k, v, bias = res
    # recompute-based backward: correct gradients at naive-attention compute
    # cost, but without having saved the (B,H,S,T) probabilities in fwd
    bias = jnp.maximum(bias.astype(jnp.float32), NEG_INF)
    _, vjp = jax.vjp(lambda q_, k_, v_: naive_attention(q_, k_, v_, bias),
                     q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_attention.defvjp(_fa_fwd, _fa_bwd)


def _flash_lens_kernel(x_lens_ref, y_lens_ref, q_ref, k_ref, v_ref, o_ref,
                       m_scr, l_scr, acc_scr, *, sm_scale, nk, bq, bk,
                       S_text, audio_causal):
    """Flash attention with the mask computed INLINE from lengths.

    The bias-array variant streams (B, S, T) f32 bias tiles from HBM — as
    much traffic as the score matrix it avoids materializing. Here the
    composite [text; audio] mask (text bidirectional, audio causal, padded
    keys dropped — ops/masks.ar_xy_attn_bias) or the padding-only NAR mask
    is rebuilt from two scalar-prefetched length vectors, so the kernel
    reads ONLY q/k/v.
    """
    import jax.experimental.pallas as pl

    b = pl.program_id(0)
    iq = pl.program_id(2)
    kk = pl.program_id(3)

    @pl.when(kk == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]                               # (bq, D) compute dtype
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale  # (bq, bk)

    # inline mask (f32 math; Mosaic rejects some i1 vector casts)
    qpos = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    kpos = kk * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    x_len = x_lens_ref[b]
    y_len = y_lens_ref[b]
    k_text = jnp.where(kpos < S_text, 1.0, 0.0)
    key_valid = jnp.where(
        kpos < S_text, jnp.where(kpos < x_len, 1.0, 0.0),
        jnp.where(kpos - S_text < y_len, 1.0, 0.0))
    if audio_causal:
        q_text = jnp.where(qpos < S_text, 1.0, 0.0)
        struct = (q_text * k_text
                  + (1.0 - q_text) * jnp.maximum(
                      k_text, jnp.where(kpos <= qpos, 1.0, 0.0)))
        visible = jnp.minimum(struct, 1.0) * key_valid
    else:
        visible = key_valid
    s = s * visible + (1.0 - visible) * NEG_INF

    m_prev = m_scr[:]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[:] = m_new

    @pl.when(kk == nk - 1)
    def _finish():
        o_ref[0, 0] = (acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)).astype(
            o_ref.dtype)


def _flash_lens_forward(q, k, v, x_lens, y_lens, *, S_text, audio_causal,
                        block_q, block_k, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, S, D = q.shape
    T = k.shape[2]
    bq = min(block_q, S)
    bk = min(block_k, T)
    assert S % bq == 0 and T % bk == 0, (S, T, bq, bk)
    nq, nk = S // bq, T // bk
    sm_scale = 1.0 / math.sqrt(D)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, H, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, bq, D),
                         lambda b, h, iq, ik, *_: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, bk, D),
                         lambda b, h, iq, ik, *_: (b, h, ik, 0)),
            pl.BlockSpec((1, 1, bk, D),
                         lambda b, h, iq, ik, *_: (b, h, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, D),
                               lambda b, h, iq, ik, *_: (b, h, iq, 0)),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _flash_lens_kernel, sm_scale=sm_scale, nk=nk, bq=bq, bk=bk,
        S_text=S_text, audio_causal=audio_causal)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, S, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(x_lens.astype(jnp.int32), y_lens.astype(jnp.int32), q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def flash_attention_lens(q, k, v, x_lens, y_lens, S_text,
                         audio_causal=True, block_q=DEFAULT_BLOCK_Q,
                         block_k=DEFAULT_BLOCK_K, interpret=False):
    """Fused attention over ``[text; audio]`` with the mask built in-kernel
    from per-sample lengths (no bias array in HBM). ``audio_causal=True``
    gives the AR composite mask, False the NAR padding-only mask."""
    return _flash_lens_forward(
        q, k, v, x_lens, y_lens, S_text=S_text, audio_causal=audio_causal,
        block_q=block_q, block_k=block_k, interpret=interpret)


def _lens_bias(x_lens, y_lens, S_text, audio_causal, S, T):
    from . import masks as M

    if audio_causal:
        return M.ar_xy_attn_bias(x_lens, y_lens, S_text, S - S_text)
    return M.padding_attn_bias(x_lens, y_lens, S_text, T - S_text)


def _fal_fwd(q, k, v, x_lens, y_lens, S_text, audio_causal, block_q,
             block_k, interpret):
    out = flash_attention_lens(q, k, v, x_lens, y_lens, S_text,
                               audio_causal, block_q, block_k, interpret)
    return out, (q, k, v, x_lens, y_lens)


def _fal_bwd(S_text, audio_causal, block_q, block_k, interpret, res, g):
    q, k, v, x_lens, y_lens = res
    bias = _lens_bias(x_lens, y_lens, S_text, audio_causal,
                      q.shape[2], k.shape[2])
    bias = jnp.maximum(bias.astype(jnp.float32), NEG_INF)
    _, vjp = jax.vjp(lambda q_, k_, v_: naive_attention(q_, k_, v_, bias),
                     q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None


flash_attention_lens.defvjp(_fal_fwd, _fal_bwd)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def fused_attention(q, k, v, bias, *, use_pallas: Optional[bool] = None,
                    interpret: bool = False):
    """Dispatch: Pallas flash kernel on TPU (padding S/T up to tile
    multiples; padded keys are masked with NEG_INF bias), else XLA einsum."""
    B, H, S, D = q.shape
    T = k.shape[2]
    if use_pallas is None:
        # Measured on v5e (benchmarks/bench_kernels.py): XLA's fused
        # attention beats this kernel at VALL-E shapes (14.6 vs 17.0 ms at
        # B8/H16/S1536), so the kernel is opt-in pending further tuning.
        import os

        use_pallas = (
            os.environ.get("VALLE_TPU_FLASH_ATTENTION") == "1"
            and jax.default_backend() != "cpu" and D in (64, 128)
            and S > 1 and T >= DEFAULT_BLOCK_K)
    if not use_pallas:
        return naive_attention(q, k, v, bias)
    if bias is None:
        bias = jnp.zeros((B, 1, S, T), jnp.float32)
    bias = jnp.broadcast_to(bias.astype(jnp.float32),
                            (B, bias.shape[1], S, T))
    bq = min(DEFAULT_BLOCK_Q, _round_up(S, 8))
    bk = min(DEFAULT_BLOCK_K, _round_up(T, 128))
    Sp, Tp = _round_up(S, bq), _round_up(T, bk)
    if Sp != S or Tp != T:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, Sp - S), (0, Tp - T)),
                       constant_values=NEG_INF)
    out = flash_attention(q, k, v, bias, bq, bk, interpret)
    return out[:, :, :S]
