"""Int8 grouped-batch Pallas decode attention: the HBM-traffic kernel.

Decode is KV-cache-read bound (benchmarks/README.md cost model: ~1.4 GB/step
of bf16 cache reads at B=32/cache 440 vs ~0.3 GB of weights). This kernel
halves and trims that traffic:

- the cache is stored int8 with per-position scales in the NATURAL
  (B, H, T, D) layout — the per-step cache write stays a cheap sublane
  scatter (round 1's transposed layout made it a lane scatter, which XLA
  realized expensively);
- dequantization is fused IN-KERNEL: int8 blocks are DMA'd, cast, and the
  per-position scales are applied to the score/probability matrices after
  the MXU dots (q.(kq*s) == (q.kq)*s), so no dequantized copy ever touches
  HBM (round 1's XLA int8 path was slower because XLA materialized the
  bf16 dequant: int8 read + bf16 write + bf16 read);
- only blocks up to the GROUP's max write position are read
  (scalar-prefetched lengths), skipping the unwritten tail of the
  max_gen_len-sized buffer;
- G samples ride one grid program: one (G, H, bk, D) DMA per block and one
  MXU dot per head covers all G samples with block-diagonal masking (the
  extra FLOPs are free — the loop is bandwidth-bound).

Exactness: scores differ from the bf16 path only by int8 quantization of
K/V (q itself stays full precision). Greedy tokens can flip at near-ties;
tests guard agreement and the exact path remains the default elsewhere.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

BLOCK_K = 128
NEG_INF = -1e30


def _kernel(x_lens_ref, wp_ref, q_ref, k_hbm, ks_hbm, v_hbm, vs_hbm, o_ref,
            *, S, bk, G, sm_scale):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bg = pl.program_id(0)
    H, _, D = q_ref.shape

    wp_max = wp_ref[bg * G]
    for g in range(1, G):
        wp_max = jnp.maximum(wp_max, wp_ref[bg * G + g])
    n_blocks = wp_max // bk + 1

    def body(kbuf, ksbuf, vbuf, vsbuf, sems, m_scr, l_scr, acc_scr):
        def dma(slot, blk, start):
            pairs = (
                (k_hbm, kbuf, 0), (ks_hbm, ksbuf, 1),
                (v_hbm, vbuf, 2), (vs_hbm, vsbuf, 3),
            )
            for src, dst, si in pairs:
                if src.ndim == 4:
                    cp = pltpu.make_async_copy(
                        src.at[pl.ds(bg * G, G), :,
                               pl.ds(blk * bk, bk), :],
                        dst.at[slot], sems.at[slot, si])
                else:  # scales (B, H, T)
                    cp = pltpu.make_async_copy(
                        src.at[pl.ds(bg * G, G), :, pl.ds(blk * bk, bk)],
                        dst.at[slot], sems.at[slot, si])
                cp.start() if start else cp.wait()

        dma(0, 0, True)
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

        # block-diagonal (own-sample) + validity masks, shared by heads;
        # f32 mask math (Mosaic rejects some i1 vector casts)
        lane = jax.lax.broadcasted_iota(jnp.int32, (G, G * bk), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (G, G * bk), 0)
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
                # (G, bk, D) int8 -> (G*bk, D) f32; scales (G, bk)->(G*bk,)
                Kh = kbuf[slot, :, h].reshape(G * bk, D).astype(jnp.float32)
                Vh = vbuf[slot, :, h].reshape(G * bk, D).astype(jnp.float32)
                ksh = ksbuf[slot, :, h].reshape(1, G * bk)
                vsh = vsbuf[slot, :, h].reshape(1, G * bk)
                Qh = q_ref[h].astype(jnp.float32)          # (G, D)
                s = jax.lax.dot_general(
                    Qh, Kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                s = s * ksh * sm_scale                     # dequant scores
                s = s * valid_f + (1.0 - valid_f) * NEG_INF
                m_prev = m_scr[h]
                m_new = jnp.maximum(
                    m_prev, jnp.max(s, axis=-1, keepdims=True))
                p = jnp.exp(s - m_new)
                alpha = jnp.exp(m_prev - m_new)
                l_scr[h] = l_scr[h] * alpha + jnp.sum(p, axis=-1,
                                                      keepdims=True)
                acc_scr[h] = acc_scr[h] * alpha + jax.lax.dot_general(
                    p * vsh, Vh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                m_scr[h] = m_new
            return _

        jax.lax.fori_loop(0, n_blocks, loop, None)
        o_ref[:] = (acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)).astype(
            o_ref.dtype)

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pl.run_scoped(
        body,
        kbuf=pltpu.VMEM((2, G, H, bk, D), k_hbm.dtype),
        ksbuf=pltpu.VMEM((2, G, H, bk), ks_hbm.dtype),
        vbuf=pltpu.VMEM((2, G, H, bk, D), v_hbm.dtype),
        vsbuf=pltpu.VMEM((2, G, H, bk), vs_hbm.dtype),
        sems=pltpu.SemaphoreType.DMA((2, 4)),
        m_scr=pltpu.VMEM((H, G, 1), jnp.float32),
        l_scr=pltpu.VMEM((H, G, 1), jnp.float32),
        acc_scr=pltpu.VMEM((H, G, D), jnp.float32),
    )


@functools.partial(jax.jit,
                   static_argnames=("S", "group", "block_k", "interpret"))
def decode_attention_int8_grouped(q, k_cache, k_scale, v_cache, v_scale,
                                  x_lens, write_pos, *, S: int,
                                  group: int = 8, block_k: int = BLOCK_K,
                                  interpret: bool = False):
    """q: (B, H, 1, D); k/v_cache (B, H, T, D) int8 (NATURAL layout);
    k/v_scale (B, H, T) f32. Returns (B, H, 1, D). Requires B % group == 0
    and T % block_k == 0."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, T, D = k_cache.shape
    G = group
    assert B % G == 0 and T % block_k == 0, (B, G, T, block_k)
    sm_scale = 1.0 / math.sqrt(D)

    q_t = jnp.transpose(q[:, :, 0, :], (1, 0, 2))  # (H, B, D)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((H, G, D), lambda bg, *_: (0, bg, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((H, G, D), lambda bg, *_: (0, bg, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_kernel, S=S, bk=block_k, G=G,
                               sm_scale=sm_scale)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, B, D), q.dtype),
        interpret=interpret,
    )(x_lens.astype(jnp.int32), write_pos.astype(jnp.int32), q_t,
      k_cache, k_scale.astype(jnp.float32), v_cache,
      v_scale.astype(jnp.float32))
    return jnp.transpose(out, (1, 0, 2))[:, :, None, :]
