"""Lane-combined decode attention: contiguous-DMA cache layout.

Fourth-generation decode-attention kernel, shaped by round-3 measurement:
the combined-KV kernel (``decode_attention_kv.py``, cache (B,H,T,2Dh))
lost ~2x to XLA at cache 512 even though it reads fewer bytes. Its DMAs
are the suspect: each (sample, block) copy is H=16 strided segments of
32 KB (head-major cache puts T inside H), while the WINNING fused dense
kernels stream contiguous 1 MB weight chunks at ~700 GB/s — roughly 2x
the rate XLA's attention loop fusions reach (round-2 profile).

This kernel restructures the cache so attention reads look like weight
streaming:

- cache (B, T, H*2Dh): one row per position, all heads in lanes, head h
  occupying lanes [h*2Dh, (h+1)*2Dh) as [K_h (Dh) | V_h (Dh)].
- the per-step write is ONE natural-layout row DUS of (B, 1, H*2Dh) —
  built from the projected k/v by an H-major flatten (no transpose);
  cheaper than the previous layouts' per-head sublane scatter.
- each (sample, block) DMA is a CONTIGUOUS bk x (H*2Dh) block (512 KB at
  bk=128, d_model 1024) into a shared (G*bk, H*2Dh) buffer at sublane
  offset g*bk; double-buffered so the next block rides out the dots.
- per head, the combined-KV dot trick (see decode_attention_kv.py)
  applies to the STATIC 2Dh-lane slice of the buffer: one MXU dot of
  [Qh | 0] (G, 2Dh) against buf[:, h*2Dh:(h+1)*2Dh] (G*bk, 2Dh) yields
  all pairwise scores; the probability dot against the same slice
  returns P@V in its V half. Block-diagonal masking keeps each sample's
  own columns; only blocks up to the group max write position are read.

Exactness: identical math to the XLA path at fp32 (tests pin exact
greedy-token equality). Replaces reference hot path
/root/reference/valle/models/valle.py:1012-1057.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

NEG_INF = -1e30
_VMEM_BUDGET = 4 * 1024 * 1024


def _block_k(G: int, lanes: int, T: int, itemsize: int) -> int:
    """Budget block, reduced (8-aligned) until it divides T so the block
    loop never reads past the cache end and the wrapper's T % bk
    contract holds for any 8-multiple cache length."""
    bk = _VMEM_BUDGET // (G * lanes * itemsize)
    bk = max(8, (bk // 8) * 8)
    bk = min(bk, T)
    while T % bk:
        bk -= 8
    return bk


def combine_kv_lanes(k, v):
    """k/v (..., H, T, Dh) -> cache rows (..., T, H*2Dh), head-major
    [K_h | V_h] lane blocks (a transpose of H,T then a flatten)."""
    kv = jnp.concatenate([k, v], axis=-1)          # (..., H, T, 2Dh)
    kv = jnp.moveaxis(kv, -3, -2)                  # (..., T, H, 2Dh)
    return kv.reshape(kv.shape[:-2] + (-1,))       # (..., T, H*2Dh)


def step_row_lanes(k, v):
    """Single-step k/v (B, H, 1, Dh) -> the (B, 1, H*2Dh) cache row."""
    B, H, _, Dh = k.shape
    kv = jnp.concatenate([k, v], axis=-1)          # (B, H, 1, 2Dh)
    return kv[:, :, 0, :].reshape(B, 1, H * 2 * Dh)


def _kernel(x_lens_ref, wp_ref, q_ref, kv_hbm, o_ref, *, S, bk, G, H,
            sm_scale):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bg = pl.program_id(0)
    _, _, D = q_ref.shape          # q (H, G, Dh)
    GB = G * bk
    lanes = H * 2 * D

    wp_max = wp_ref[bg * G]
    for g in range(1, G):
        wp_max = jnp.maximum(wp_max, wp_ref[bg * G + g])
    n_blocks = wp_max // bk + 1

    def body(kvbuf, sems, m_scr, l_scr, acc_scr):
        def dma(slot, blk, start):
            for g in range(G):
                cp = pltpu.make_async_copy(
                    kv_hbm.at[bg * G + g, pl.ds(blk * bk, bk), :],
                    kvbuf.at[slot, pl.ds(g * bk, bk), :],
                    sems.at[slot, g])
                cp.start() if start else cp.wait()

        dma(0, 0, True)
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

        lane = jax.lax.broadcasted_iota(jnp.int32, (G, GB), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (G, GB), 0)
        own_f = jnp.where((lane // bk) == row, 1.0, 0.0)

        def loop(blk, _):
            slot = blk % 2
            nxt = (blk + 1) % 2

            @pl.when(blk + 1 < n_blocks)
            def _():
                dma(nxt, blk + 1, True)

            dma(slot, blk, False)

            col = blk * bk + (lane % bk)
            valid_f = own_f
            for g in range(G):
                in_text = jnp.where(col < x_lens_ref[bg * G + g], 1.0, 0.0)
                in_audio = jnp.where(col >= S, 1.0, 0.0) * jnp.where(
                    col <= wp_ref[bg * G + g], 1.0, 0.0)
                vg = jnp.minimum(in_text + in_audio, 1.0)
                row_g = jnp.where(row == g, 1.0, 0.0)
                valid_f = valid_f * (1.0 - row_g * (1.0 - vg))

            for h in range(H):
                # static 2Dh-lane window of the contiguous row buffer.
                # NO input up-cast: the MXU takes bf16 operands with fp32
                # accumulation natively (preferred_element_type) — an
                # .astype(f32) here converts the FULL buffer per head on
                # the VPU (~64 MB/layer-call of pure overhead). fp32
                # inputs still flow through identically (exactness tests
                # run at fp32).
                KVh = kvbuf[slot, :, h * 2 * D:(h + 1) * 2 * D]
                Qh = q_ref[h]                              # (G, Dh)
                Q2 = jnp.concatenate(
                    [Qh, jnp.zeros_like(Qh)], axis=1)      # (G, 2Dh)
                s = jax.lax.dot_general(
                    Q2, KVh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)    # (G, G*bk) f32
                s = s * sm_scale
                s = s * valid_f + (1.0 - valid_f) * NEG_INF
                m_prev = m_scr[h]
                m_new = jnp.maximum(
                    m_prev, jnp.max(s, axis=-1, keepdims=True))
                p = jnp.exp(s - m_new)                     # f32
                alpha = jnp.exp(m_prev - m_new)
                l_scr[h] = l_scr[h] * alpha + jnp.sum(p, axis=-1,
                                                      keepdims=True)
                pv = jax.lax.dot_general(
                    p.astype(KVh.dtype), KVh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)    # (G, 2Dh) f32
                acc_scr[h] = acc_scr[h] * alpha + pv[:, D:]
                m_scr[h] = m_new
            return _

        jax.lax.fori_loop(0, n_blocks, loop, None)
        o_ref[:] = (acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)).astype(
            o_ref.dtype)

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pl.run_scoped(
        body,
        kvbuf=pltpu.VMEM((2, GB, lanes), kv_hbm.dtype),
        sems=pltpu.SemaphoreType.DMA((2, G)),
        m_scr=pltpu.VMEM((H, G, 1), jnp.float32),
        l_scr=pltpu.VMEM((H, G, 1), jnp.float32),
        acc_scr=pltpu.VMEM((H, G, D), jnp.float32),
    )


@functools.partial(jax.jit,
                   static_argnames=("S", "nhead", "group", "interpret"))
def decode_attention_lanes(q, kv_cache, x_lens, write_pos, *, S: int,
                           nhead: int, group: int = 8,
                           interpret: bool = False):
    """q: (B, H, 1, Dh); kv_cache (B, T, H*2Dh) head-major lane rows
    (see ``combine_kv_lanes``). Returns (B, H, 1, Dh).
    Requires B % group == 0 and T % bk == 0."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, lanes = kv_cache.shape
    H = nhead
    D = lanes // (2 * H)
    G = group
    sm_scale = 1.0 / math.sqrt(D)
    bk = _block_k(G, lanes, T, kv_cache.dtype.itemsize)
    assert B % G == 0 and T % bk == 0, (B, G, T, bk)

    q_t = jnp.transpose(q[:, :, 0, :], (1, 0, 2))  # (H, B, Dh)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((H, G, D), lambda bg, *_: (0, bg, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((H, G, D), lambda bg, *_: (0, bg, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_kernel, S=S, bk=bk, G=G, H=H,
                               sm_scale=sm_scale)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, B, D), q.dtype),
        interpret=interpret,
    )(x_lens.astype(jnp.int32), write_pos.astype(jnp.int32), q_t,
      kv_cache)
    return jnp.transpose(out, (1, 0, 2))[:, :, None, :]
