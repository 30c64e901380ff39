"""Grouped-batch Pallas decode attention (G samples per grid step).

The per-sample kernel in ``decode_attention.py`` is correct but serializes
B grid programs per layer per step — DMA latency dominates. This variant
processes G samples per grid program:

- K/V blocks for the G samples are DMA'd side by side into VMEM as
  (H, D, G*bk) (G copies per buffer, lane offsets bk-aligned);
- per head, ONE MXU dot (G, D) x (D, G*bk) computes all pairwise scores;
  a block-diagonal mask keeps only each sample's own columns (the extra
  FLOPs are free — the loop is bandwidth-bound);
- the P @ V contraction works the same way: off-diagonal probabilities are
  exactly zero, so (G, G*bk) x (G*bk -> D) yields each sample's output.

Cache layout: TRANSPOSED (B, H, D, T) like decode_attention.py. q/out are
passed as (H, B, D) so all kernel indexing is leading-dimension only.
Valid-prefix skipping uses the GROUP max write position.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

BLOCK_K = 128
NEG_INF = -1e30


def _kernel(x_lens_ref, wp_ref, q_ref, k_hbm, v_hbm, o_ref, *, S, bk, G,
            sm_scale):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bg = pl.program_id(0)
    H, _, D = q_ref.shape

    # group max write position -> number of valid blocks
    wp_max = wp_ref[bg * G]
    for g in range(1, G):
        wp_max = jnp.maximum(wp_max, wp_ref[bg * G + g])
    n_blocks = wp_max // bk + 1

    def body(kbuf, vbuf, sems, m_scr, l_scr, acc_scr):
        def start_dmas(slot, blk):
            for g in range(G):
                pltpu.make_async_copy(
                    k_hbm.at[bg * G + g, :, :, pl.ds(blk * bk, bk)],
                    kbuf.at[slot, :, :, pl.ds(g * bk, bk)],
                    sems.at[slot, 2 * g]).start()
                pltpu.make_async_copy(
                    v_hbm.at[bg * G + g, :, :, pl.ds(blk * bk, bk)],
                    vbuf.at[slot, :, :, pl.ds(g * bk, bk)],
                    sems.at[slot, 2 * g + 1]).start()

        def wait_dmas(slot, blk):
            for g in range(G):
                pltpu.make_async_copy(
                    k_hbm.at[bg * G + g, :, :, pl.ds(blk * bk, bk)],
                    kbuf.at[slot, :, :, pl.ds(g * bk, bk)],
                    sems.at[slot, 2 * g]).wait()
                pltpu.make_async_copy(
                    v_hbm.at[bg * G + g, :, :, pl.ds(blk * bk, bk)],
                    vbuf.at[slot, :, :, pl.ds(g * bk, bk)],
                    sems.at[slot, 2 * g + 1]).wait()

        start_dmas(0, 0)
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

        # block-diagonal structure + per-sample validity, shared by heads.
        # All mask math in f32 (Mosaic rejects some i1 vector casts).
        lane = jax.lax.broadcasted_iota(jnp.int32, (G, G * bk), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (G, G * bk), 0)
        own_f = jnp.where((lane // bk) == row, 1.0, 0.0)  # block diagonal

        def loop(blk, _):
            slot = blk % 2
            nxt = (blk + 1) % 2

            @pl.when(blk + 1 < n_blocks)
            def _():
                start_dmas(nxt, blk + 1)

            wait_dmas(slot, blk)

            col = blk * bk + (lane % bk)               # key position
            valid_f = own_f
            for g in range(G):
                in_text = jnp.where(col < x_lens_ref[bg * G + g], 1.0, 0.0)
                in_audio = jnp.where(col >= S, 1.0, 0.0) * jnp.where(
                    col <= wp_ref[bg * G + g], 1.0, 0.0)
                vg = jnp.minimum(in_text + in_audio, 1.0)
                row_g = jnp.where(row == g, 1.0, 0.0)
                valid_f = valid_f * (1.0 - row_g * (1.0 - vg))

            for h in range(H):
                Kh = kbuf[slot, h].astype(jnp.float32)     # (D, G*bk)
                Vh = vbuf[slot, h].astype(jnp.float32)
                Qh = q_ref[h].astype(jnp.float32)          # (G, D)
                s = jax.lax.dot_general(
                    Qh, Kh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * sm_scale
                s = s * valid_f + (1.0 - valid_f) * NEG_INF  # (G, G*bk)
                m_prev = m_scr[h]                          # (G, 1)
                m_new = jnp.maximum(
                    m_prev, jnp.max(s, axis=-1, keepdims=True))
                p = jnp.exp(s - m_new)                     # 0 off-diagonal
                alpha = jnp.exp(m_prev - m_new)
                l_scr[h] = l_scr[h] * alpha + jnp.sum(p, axis=-1,
                                                      keepdims=True)
                acc_scr[h] = acc_scr[h] * alpha + jax.lax.dot_general(
                    p, Vh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)    # (G, D)
                m_scr[h] = m_new
            return _

        jax.lax.fori_loop(0, n_blocks, loop, None)
        o_ref[:] = (acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)).astype(
            o_ref.dtype)

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pl.run_scoped(
        body,
        kbuf=pltpu.VMEM((2, H, D, G * bk), k_hbm.dtype),
        vbuf=pltpu.VMEM((2, H, D, G * bk), v_hbm.dtype),
        sems=pltpu.SemaphoreType.DMA((2, 2 * G)),
        m_scr=pltpu.VMEM((H, G, 1), jnp.float32),
        l_scr=pltpu.VMEM((H, G, 1), jnp.float32),
        acc_scr=pltpu.VMEM((H, G, D), jnp.float32),
    )


@functools.partial(jax.jit,
                   static_argnames=("S", "group", "block_k", "interpret"))
def decode_attention_grouped(q, k_cache, v_cache, x_lens, write_pos, *,
                             S: int, group: int = 8,
                             block_k: int = BLOCK_K,
                             interpret: bool = False):
    """q: (B, H, 1, D); k/v_cache TRANSPOSED (B, H, D, T); returns
    (B, H, 1, D). Requires B % group == 0 and T % block_k == 0."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, D, T = k_cache.shape
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
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
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
    )(x_lens.astype(jnp.int32), write_pos.astype(jnp.int32), q_t, k_cache,
      v_cache)
    return jnp.transpose(out, (1, 0, 2))[:, :, None, :]
