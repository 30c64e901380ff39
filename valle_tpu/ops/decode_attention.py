"""Pallas incremental-decode attention over a static KV cache.

The AR decode loop attends one query token against a pre-allocated cache
stored TRANSPOSED as (B, H, D, Tmax) — the block axis is minor so HBM DMA
slices are 128-lane aligned. XLA's attention reads the ENTIRE static buffer
every step;
this kernel scalar-prefetches each sample's current write position and
DMA's only the valid cache blocks (double-buffered HBM->VMEM), skipping the
unwritten tail — the decode loop's HBM traffic scales with the true
sequence length instead of Tmax.

Mask semantics match the decode step bias in ``models/inference.py``:
key position p is valid iff p < x_len (text region) or S <= p <= wp
(audio region incl. the token just written).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

BLOCK_K = 256
NEG_INF = -1e30


def _kernel(x_lens_ref, wp_ref, q_ref, k_hbm, v_hbm, o_ref, *, S, T, bk,
            sm_scale):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    H, D = q_ref.shape[1], q_ref.shape[2]
    q = q_ref[0].astype(jnp.float32)  # (H, D)
    del T  # unused (grid bound comes from wp)
    x_len = x_lens_ref[b]
    wp = wp_ref[b]
    n_blocks = wp // bk + 1  # only blocks that contain any valid key

    def body(kbuf, vbuf, sems, m_scr, l_scr, acc_scr):
        def get_dma(slot, blk):
            kd = pltpu.make_async_copy(
                k_hbm.at[b, :, :, pl.ds(blk * bk, bk)], kbuf.at[slot],
                sems.at[slot, 0])
            vd = pltpu.make_async_copy(
                v_hbm.at[b, :, :, pl.ds(blk * bk, bk)], vbuf.at[slot],
                sems.at[slot, 1])
            return kd, vd

        kd0, vd0 = get_dma(0, 0)
        kd0.start()
        vd0.start()

        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

        def loop(blk, _):
            slot = blk % 2
            nxt = (blk + 1) % 2

            @pl.when(blk + 1 < n_blocks)
            def _():
                kd, vd = get_dma(nxt, blk + 1)
                kd.start()
                vd.start()

            kd, vd = get_dma(slot, blk)
            kd.wait()
            vd.wait()

            # All-2D math (Mosaic rejects batched dots / trailing-1 dims):
            # per-head (1,D)x(D,bk) and (1,bk)x(bk,D) matmuls, unrolled.
            col = blk * bk + jax.lax.broadcasted_iota(
                jnp.int32, (1, bk), 1)
            valid = (col < x_len) | ((col >= S) & (col <= wp))
            for h in range(H):
                kh = kbuf[slot, h].astype(jnp.float32)   # (D, bk)
                vh = vbuf[slot, h].astype(jnp.float32)
                qh = q[h:h + 1, :]                       # (1, D)
                s = jax.lax.dot_general(
                    qh, kh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * sm_scale  # (1,bk)
                s = jnp.where(valid, s, NEG_INF)
                m_prev = m_scr[h:h + 1, :]               # (1, 1)
                m_new = jnp.maximum(m_prev,
                                    jnp.max(s, axis=-1, keepdims=True))
                p = jnp.exp(s - m_new)                   # (1, bk)
                alpha = jnp.exp(m_prev - m_new)          # (1, 1)
                l_scr[h:h + 1, :] = (l_scr[h:h + 1, :] * alpha
                                     + jnp.sum(p, axis=-1, keepdims=True))
                acc_scr[h:h + 1, :] = acc_scr[h:h + 1, :] * alpha + (
                    jax.lax.dot_general(
                        p, vh, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32))  # (1, D)
                m_scr[h:h + 1, :] = m_new
            return _

        jax.lax.fori_loop(0, n_blocks, loop, None)
        o_ref[0] = (acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)).astype(
            o_ref.dtype)

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pl.run_scoped(
        body,
        kbuf=pltpu.VMEM((2, H, D, bk), k_hbm.dtype),
        vbuf=pltpu.VMEM((2, H, D, bk), v_hbm.dtype),
        sems=pltpu.SemaphoreType.DMA((2, 2)),
        m_scr=pltpu.VMEM((H, 1), jnp.float32),
        l_scr=pltpu.VMEM((H, 1), jnp.float32),
        acc_scr=pltpu.VMEM((H, D), jnp.float32),
    )


@functools.partial(jax.jit,
                   static_argnames=("S", "block_k", "interpret"))
def decode_attention(q, k_cache, v_cache, x_lens, write_pos, *, S: int,
                     block_k: int = BLOCK_K, interpret: bool = False):
    """q: (B, H, 1, D); k/v_cache: (B, H, D, T) TRANSPOSED; x_lens,
    write_pos: (B,).

    Returns (B, H, 1, D). T must be a multiple of block_k (pad the cache
    allocation accordingly); unwritten blocks are never read.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, D, T = k_cache.shape
    assert T % block_k == 0, (T, block_k)
    sm_scale = 1.0 / math.sqrt(D)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, D), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, H, D), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_kernel, S=S, T=T, bk=block_k,
                               sm_scale=sm_scale)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, D), q.dtype),
        interpret=interpret,
    )(x_lens.astype(jnp.int32), write_pos.astype(jnp.int32), q[:, :, 0, :],
      k_cache, v_cache)
    return out[:, :, None, :]
