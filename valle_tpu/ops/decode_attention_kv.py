"""Token-exact combined-KV Pallas decode attention (bf16/f32 cache).

The round-2 profile (BASELINE.md) attributed 72% of decode layer time to
the attention matvecs, lowered by XLA as VPU loop fusions streaming the
KV cache at only ~300-375 GB/s — half the rate the dense-path fusions
reach. The int8 kernel (``decode_attention_int8_grouped.py``) beat XLA at
long caches, and the follow-up XLA A/B (``bench_attn_int8_xla.py``)
showed its win comes from reading only VALID cache blocks, not from byte
halving (int8 + post-dot dequant on the XLA path bought ~6%). This
kernel keeps the winning mechanism and drops the quantization, so its
outputs match the exact path to float round-off:

- cache (B, H, T, 2D) in the COMPUTE dtype with K in lanes 0:D and V in
  lanes D:2D. The per-step write stays the natural-layout sublane DUS
  (the only cheap write XLA has — see the int8 module's failed-layout
  history); lanes are a full 128 tile at D=64 so Mosaic DMA-slices it.
- the kernel DMAs each group sample's (H, bk, 2D) block to a sublane
  offset g*bk of a shared (H, G*bk, 2D) buffer, double-buffered so the
  next block's DMA rides out the current block's dots;
- per head, one MXU dot of the zero-padded query [Qh | 0] (G, 2D)
  against the block (G*bk, 2D) gives all pairwise scores (V lanes
  contribute exactly zero); the probability dot against the same buffer
  recovers [junk | P@V] (G, 2D) whose V half is the output.
  Block-diagonal masking keeps each sample's own columns (the
  off-diagonal FLOPs are free; the loop is bandwidth-bound);
- only blocks up to the GROUP max write position are read
  (scalar-prefetched lengths), skipping the unwritten cache tail.

Exactness: Q/K/V are the same values the XLA path attends over; the only
difference from ``jax.nn.softmax(q@k)@v`` is online-softmax accumulation
order (fp32 either way), so greedy tokens match the exact path
bit-for-bit in practice and to round-off by construction
(tests/test_attention.py::test_ar_decode_kv_grouped_token_equality pins
fp32 token equality).

Replaces reference hot path /root/reference/valle/models/valle.py:1012-1057
(full-sequence recompute per token) with an O(valid-cache) kernel read.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

NEG_INF = -1e30
# Per-slot KV buffer budget (see the int8 module: scoped VMEM is 16 MiB
# with ~8 MiB of fixed pallas_call window overhead at decode shapes).
_VMEM_BUDGET = 4 * 1024 * 1024


def _block_k(H: int, G: int, T: int, D2: int, itemsize: int) -> int:
    """Largest 128-multiple block such that the (H, G*bk, D2) slot fits
    the per-slot VMEM budget AND bk divides T (the block loop reads
    [blk*bk, blk*bk+bk) up to ceil over the max write position — a
    non-dividing bk would let the last block read past the cache end).
    128 is the minimum DMA-sliceable block; if the budget computes
    smaller (e.g. fp32 cache at flagship shape), the floor wins and the
    buffer exceeds the soft budget — the Mosaic-compile-OOM regime the
    int8 module documents, acceptable for this measured-and-falsified
    design (kept for the record; not a default mode)."""
    bk = (_VMEM_BUDGET // (H * G * D2 * itemsize) // 128) * 128
    bk = max(128, min(bk, T))
    while T % bk:
        bk -= 128
    return bk


def combine_kv(k, v):
    """(..., T, D) K and V -> (..., T, 2D) lane-combined cache."""
    return jnp.concatenate([k, v], axis=-1)


def _kernel(*refs, S, bk, G, sm_scale, stacked):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if stacked:
        # cache is the full (L, B, H, T, 2D) stack; the layer index is a
        # scalar-prefetch arg — no (B,H,T,2D) slice ever materializes
        x_lens_ref, wp_ref, l_ref, q_ref, kv_hbm, o_ref = refs
        lyr = l_ref[0]
    else:
        x_lens_ref, wp_ref, q_ref, kv_hbm, o_ref = refs
        lyr = None

    bg = pl.program_id(0)
    H, _, D = q_ref.shape          # q (H, G, D); cache lanes are 2D
    GB = G * bk

    wp_max = wp_ref[bg * G]
    for g in range(1, G):
        wp_max = jnp.maximum(wp_max, wp_ref[bg * G + g])
    n_blocks = wp_max // bk + 1

    def body(kvbuf, sems, m_scr, l_scr, acc_scr):
        def dma(slot, blk, start):
            for g in range(G):
                src = (kv_hbm.at[lyr, bg * G + g, :, pl.ds(blk * bk, bk), :]
                       if stacked else
                       kv_hbm.at[bg * G + g, :, pl.ds(blk * bk, bk), :])
                cp = pltpu.make_async_copy(
                    src,
                    kvbuf.at[slot, :, pl.ds(g * bk, bk), :],
                    sems.at[slot, g])
                cp.start() if start else cp.wait()

        dma(0, 0, True)
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

        # (G, G*bk) masks, shared by heads; f32 mask math (Mosaic rejects
        # some i1 vector casts)
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
                KVh = kvbuf[slot, h].astype(jnp.float32)   # (G*bk, 2D)
                Qh = q_ref[h].astype(jnp.float32)          # (G, D)
                Q2 = jnp.concatenate(
                    [Qh, jnp.zeros_like(Qh)], axis=1)      # (G, 2D)
                s = jax.lax.dot_general(
                    Q2, KVh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)    # (G, G*bk)
                s = s * sm_scale
                s = s * valid_f + (1.0 - valid_f) * NEG_INF
                m_prev = m_scr[h]
                m_new = jnp.maximum(
                    m_prev, jnp.max(s, axis=-1, keepdims=True))
                p = jnp.exp(s - m_new)
                alpha = jnp.exp(m_prev - m_new)
                l_scr[h] = l_scr[h] * alpha + jnp.sum(p, axis=-1,
                                                      keepdims=True)
                pv = jax.lax.dot_general(
                    p, KVh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)    # (G, 2D)
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
        kvbuf=pltpu.VMEM((2, H, GB, 2 * D), kv_hbm.dtype),
        sems=pltpu.SemaphoreType.DMA((2, G)),
        m_scr=pltpu.VMEM((H, G, 1), jnp.float32),
        l_scr=pltpu.VMEM((H, G, 1), jnp.float32),
        acc_scr=pltpu.VMEM((H, G, D), jnp.float32),
    )


@functools.partial(jax.jit,
                   static_argnames=("S", "group", "interpret"))
def decode_attention_kv(q, kv_cache, x_lens, write_pos, layer=None, *,
                        S: int, group: int = 8, interpret: bool = False):
    """q: (B, H, 1, D); kv_cache (B, H, T, 2D) in the compute dtype (K
    lanes 0:D, V lanes D:2D, natural layout — see ``combine_kv``), OR the
    full per-layer stack (L, B, H, T, 2D) with ``layer`` the index to
    read (avoids slicing the stack outside the kernel).
    Returns (B, H, 1, D). Requires B % group == 0 and T % 128 == 0."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    stacked = kv_cache.ndim == 5
    B, H, T, D2 = kv_cache.shape[-4:]
    D = D2 // 2
    G = group
    assert B % G == 0 and T % 128 == 0, (B, G, T)
    sm_scale = 1.0 / math.sqrt(D)
    bk = _block_k(H, G, T, D2, kv_cache.dtype.itemsize)

    q_t = jnp.transpose(q[:, :, 0, :], (1, 0, 2))  # (H, B, D)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3 if stacked else 2,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((H, G, D), lambda bg, *_: (0, bg, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((H, G, D), lambda bg, *_: (0, bg, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_kernel, S=S, bk=bk, G=G,
                               sm_scale=sm_scale, stacked=stacked)
    args = [x_lens.astype(jnp.int32), write_pos.astype(jnp.int32)]
    if stacked:
        args.append(jnp.asarray(layer, jnp.int32).reshape(1))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, B, D), q.dtype),
        interpret=interpret,
    )(*args, q_t, kv_cache)
    return jnp.transpose(out, (1, 0, 2))[:, :, None, :]
