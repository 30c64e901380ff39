"""Int8 combined-KV Pallas decode attention: the HBM-traffic kernel.

Decode is KV-cache-read bound (benchmarks/README.md cost model: ~1.4 GB/step
of bf16 cache reads at B=32/cache 440 vs ~0.3 GB of weights). Three earlier
shapes of this kernel lost to XLA and shaped this one:

- round 1's per-sample grid serialized B programs (DMA latency dominated);
- an int8 cache in the natural (B,H,T,D) layout cannot be DMA-sliced at
  all: Mosaic tiles int8 as (32,128) and the D=64 head dim is minor;
- transposed / pre-grouped int8 layouts compile and DMA efficiently but
  their PER-STEP WRITES become XLA scatters with computed lane indices —
  measured at ~2.5 ms/step of pure overhead (5.9 vs 3.35 ms). The only
  cheap write XLA has is the natural layout's sublane DUS, which is what
  the default path uses.

This design keeps BOTH the cheap write and the aligned int8 read by
packing K and V side by side in the lane dimension:

- cache (B, H, T, 128) int8 with K in lanes 0:64 and V in lanes 64:128,
  plus per-position scales (B, H, T) f32 for each. The per-step write is
  ONE natural-layout sublane DUS per layer (same machinery as the bf16
  default path); lanes are a full 128 tile so Mosaic slices it fine.
- the kernel DMAs each group sample's (H, bk, 128) block to a SUBLANE
  offset g*bk of a shared (H, G*bk, 128) buffer; per head, one MXU dot
  of the zero-padded query [Qh | 0] (G, 128) against the block (G*bk, 128)
  yields all pairwise scores (the V lanes contribute exactly zero), and
  one dot of the masked probabilities recovers [junk | P@V] (G, 128) whose
  V half is the output. Block-diagonal masking keeps each sample's own
  columns; the off-diagonal FLOPs are free (the loop is bandwidth-bound).
- dequantization is fused IN-KERNEL: scales multiply the score /
  probability matrices after the dots (q.(kq*s) == (q.kq)*s), so no
  dequantized copy ever touches HBM;
- only blocks up to the GROUP max write position are read
  (scalar-prefetched lengths), skipping the unwritten buffer tail.

Exactness: scores differ from the bf16 path only by int8 quantization of
K/V (q itself stays full precision). Greedy tokens can flip at near-ties;
tests guard agreement and the exact path remains the default elsewhere.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

NEG_INF = -1e30
# per-slot KV buffer bytes. The TPU scoped-vmem limit is 16 MiB total and
# the pallas_call carries ~8 MiB of fixed window overhead at these shapes:
# bk=256 buffers (9.4 MiB) OOM'd at 17.57/16 MiB, bk=128 compiles and runs.
_VMEM_BUDGET = 4 * 1024 * 1024


def _block_k(H: int, G: int, T: int) -> int:
    """Largest 128-multiple block such that the (H, G*bk, 128) slot fits
    VMEM AND bk divides T: the block loop reads [blk*bk, blk*bk+bk) up
    to ceil over the group's max write position, so a non-dividing bk
    would DMA past the cache end (silently — the overread columns are
    masked, but the read itself is out of bounds). Cache lengths that
    are multiples of 256 keep the budget-optimal bk=256 at flagship
    shape (the long-cache win needs it — BASELINE.md round-3); other
    128-multiples fall back to smaller aligned blocks."""
    bk = min(preferred_block(H, G), T)
    while T % bk:
        bk -= 128
    return bk


def preferred_block(H: int, G: int = 8) -> int:
    """The budget-optimal block before the divide-T reduction: cache
    allocators should round T up to a multiple of this so ``_block_k``
    keeps the full block size (bk=256 at flagship H=16 — the long-cache
    win depends on it; models/inference.py uses this for the int8
    modes' cache rounding)."""
    bk = _VMEM_BUDGET // (H * G * 128)
    return max(128, (bk // 128) * 128)


def combine_kv_int8(kq, vq):
    """(..., T, D) int8 K and V -> (..., T, 2D) lane-combined cache."""
    return jnp.concatenate([kq, vq], axis=-1)


def stack_scales(ks, vs):
    """(..., H, T) K and V scales -> (..., 2H, T) sublane-stacked."""
    return jnp.concatenate([ks, vs], axis=-2)


def _kernel(x_lens_ref, wp_ref, q_ref, kv_hbm, sc_hbm, o_ref,
            *, S, T, bk, G, sm_scale):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bg = pl.program_id(0)
    H, _, D = q_ref.shape          # q (H, G, D); cache lanes are 2D
    GB = G * bk

    wp_max = wp_ref[bg * G]
    for g in range(1, G):
        wp_max = jnp.maximum(wp_max, wp_ref[bg * G + g])
    n_blocks = wp_max // bk + 1

    def body(kvbuf, scbuf, sems, m_scr, l_scr, acc_scr):
        def dma(slot, blk, start):
            for g in range(G):
                pairs = (
                    (kv_hbm.at[bg * G + g, :, pl.ds(blk * bk, bk), :],
                     kvbuf.at[slot, :, pl.ds(g * bk, bk), :], 0),
                    (sc_hbm.at[bg * G + g, :, pl.ds(blk * bk, bk)],
                     scbuf.at[slot, :, pl.ds(g * bk, bk)], 1),
                )
                for src, dst, si in pairs:
                    cp = pltpu.make_async_copy(src, dst, sems.at[slot, si, g])
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
                ksh = scbuf[slot, h].reshape(1, GB)
                vsh = scbuf[slot, H + h].reshape(1, GB)
                Qh = q_ref[h].astype(jnp.float32)          # (G, D)
                Q2 = jnp.concatenate(
                    [Qh, jnp.zeros_like(Qh)], axis=1)      # (G, 2D)
                s = jax.lax.dot_general(
                    Q2, KVh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)    # (G, G*bk)
                s = s * ksh * sm_scale                     # dequant scores
                s = s * valid_f + (1.0 - valid_f) * NEG_INF
                m_prev = m_scr[h]
                m_new = jnp.maximum(
                    m_prev, jnp.max(s, axis=-1, keepdims=True))
                p = jnp.exp(s - m_new)
                alpha = jnp.exp(m_prev - m_new)
                l_scr[h] = l_scr[h] * alpha + jnp.sum(p, axis=-1,
                                                      keepdims=True)
                pv = jax.lax.dot_general(
                    p * vsh, KVh, (((1,), (0,)), ((), ())),
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
        scbuf=pltpu.VMEM((2, 2 * H, GB), sc_hbm.dtype),
        sems=pltpu.SemaphoreType.DMA((2, 2, G)),
        m_scr=pltpu.VMEM((H, G, 1), jnp.float32),
        l_scr=pltpu.VMEM((H, G, 1), jnp.float32),
        acc_scr=pltpu.VMEM((H, G, D), jnp.float32),
    )


@functools.partial(jax.jit,
                   static_argnames=("S", "group", "interpret"))
def decode_attention_int8_grouped(q, kv_cache, scales,
                                  x_lens, write_pos, *, S: int,
                                  group: int = 8,
                                  interpret: bool = False):
    """q: (B, H, 1, D); kv_cache (B, H, T, 2D) int8 (K lanes 0:D, V lanes
    D:2D, natural layout — see ``combine_kv_int8``); scales (B, 2H, T) f32
    (K rows 0:H, V rows H:2H — see ``stack_scales``).
    Returns (B, H, 1, D). Requires B % group == 0 and T % 128 == 0."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, T, D2 = kv_cache.shape
    D = D2 // 2
    G = group
    assert B % G == 0 and T % 128 == 0, (B, G, T)
    sm_scale = 1.0 / math.sqrt(D)
    bk = _block_k(H, G, T)

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
    kernel = functools.partial(_kernel, S=S, T=T, bk=bk, G=G,
                               sm_scale=sm_scale)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, B, D), q.dtype),
        interpret=interpret,
    )(x_lens.astype(jnp.int32), write_pos.astype(jnp.int32), q_t,
      kv_cache, scales.astype(jnp.float32))
    return jnp.transpose(out, (1, 0, 2))[:, :, None, :]
