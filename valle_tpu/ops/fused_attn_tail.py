"""Merged attention + dense-tail Pallas kernel for the AR decode step.

Round-2 measured two facts that shape this kernel (BASELINE.md):

1. the decode bottleneck is the attention matvecs — XLA lowers them as
   VPU loop fusions streaming the KV cache at ~300-375 GB/s, 72% of
   layer time — while the weight-streaming pallas kernels
   (ops/fused_dense.py) run the dense path at ~700 GB/s;
2. composing the fused dense kernels WITH a separate attention kernel
   (three pallas_calls per layer, mode "fused_int8") LOSES outright:
   4.75 vs 3.05 ms/step — pallas_calls serialize at their boundaries and
   the fixed per-call cost trebles.

This kernel attacks both at once: ONE pallas_call runs grouped
valid-block attention over the combined-KV cache (the token-exact
mechanism of ops/decode_attention_kv.py) AND the whole dense tail
(out-proj + residual + LayerNorm2 + FFN + residual, the weight-streaming
structure of ops/fused_dense.py's ``fused_tail``), so a decode layer is
two pallas_calls total (``fused_ln_qkv`` + this) — the same call count
as the round-2 "fused" mode but with the attention reads now DMA'd at
the streaming rate and skipping the unwritten cache tail.

Key layout choice: attention output stays in the kernel's (H, B, Dh)
register layout and the out-projection consumes it HEAD-WISE —
``y = sum_h attn[h] @ out_w[h*Dh:(h+1)*Dh, cols]`` — sublane slices of
the streamed weight chunk, so the (H, B, Dh) -> (B, D) head-merge
relayout that forced separate kernels never happens.

Scheduling: the first weight-chunk DMAs (out_w col 0, w2 row 0) start at
kernel entry, so the dense weights stream from HBM WHILE the attention
block loop computes — the overlap no multi-call composition can express.

Weights stay STACKED (L, ...) in HBM; the layer index arrives as a
scalar-prefetch argument (works unchanged under an unrolled or fori_loop
layer loop). The KV cache is the per-layer LANE-ROW slice
(B, T, H*2Dh) in ANY memory space (ops/decode_attention_lanes.py
layout: contiguous per-sample block DMAs, one-row DUS write in XLA
before the call).

Exactness: same math as the XLA path (fp32 softmax and matmul
accumulation, element-wise ops in the compute dtype); at fp32 the decode
tokens match the exact path bit-for-bit (tests/test_fused_layer.py).

Reference hot path replaced: the per-token full-sequence
``nn.TransformerEncoder`` re-run in /root/reference/valle/models/valle.py:1004-1057.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp

NEG_INF = -1e30

# Attention KV block (sublanes per sample per block). 64 keeps the
# double-buffered (2, H, G*bk, 2Dh) buffer at 4 MiB (bf16, H=16, G=8) so
# it coexists with the weight-chunk buffers inside scoped VMEM.
_BK = int(os.environ.get("VALLE_TPU_MEGA_BK", "64"))
# Weight-chunk width (columns of out_w/w1, rows of w2).
_CHUNK = int(os.environ.get("VALLE_TPU_MEGA_CHUNK", "512"))


def _pick_chunk(*dims: int) -> int:
    c = min(_CHUNK, *dims)
    while any(d % c for d in dims):
        c -= 1
    return c


def _layer_norm2d(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _kernel(x_lens_ref, wp_ref, l_ref, q_ref, r_ref, ob_ref, lns_ref,
            lnb_ref, b1_ref, b2_ref, kv_hbm, ow_hbm, w1_hbm, w2_hbm,
            o_ref, *, S, T, bk, G, sm_scale, D, F, cw, activation):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    l = l_ref[0]
    H, B, Dh = q_ref.shape
    GB = G * bk
    n_out = D // cw
    n_f1 = F // cw
    n_col = n_out + n_f1
    n_f2 = F // cw

    def body(kvbuf, kvsems, colbuf, rowbuf, csems, rsems, attn_scr,
             m_scr, l_scr, acc_scr, h1_scr, ffh_scr, facc_scr):
        def dma_col(slot, i, start):
            src = (ow_hbm.at[l, :, pl.ds(i * cw, cw)] if i < n_out else
                   w1_hbm.at[l, :, pl.ds((i - n_out) * cw, cw)])
            cp = pltpu.make_async_copy(src, colbuf.at[slot],
                                      csems.at[slot])
            cp.start() if start else cp.wait()

        def dma_row(slot, i, start):
            cp = pltpu.make_async_copy(
                w2_hbm.at[l, pl.ds(i * cw, cw), :],
                rowbuf.at[slot], rsems.at[slot])
            cp.start() if start else cp.wait()

        def dma_kv(slot, bg, blk, start):
            # kv_hbm is the SLICED per-layer lane-row cache (B, T, H*2Dh)
            # — each copy is one CONTIGUOUS bk x lanes block (the layout
            # that fixed the 2x DMA slowdown of the head-major cache;
            # see ops/decode_attention_lanes.py). The stacked (L, ...)
            # operand form measured ~2.8 ms/layer of per-call
            # re-materialization and is gone (BASELINE.md round 3).
            for g in range(G):
                cp = pltpu.make_async_copy(
                    kv_hbm.at[bg * G + g, pl.ds(blk * bk, bk), :],
                    kvbuf.at[slot, pl.ds(g * bk, bk), :],
                    kvsems.at[slot, g])
                cp.start() if start else cp.wait()

        # dense weights start streaming NOW — they land while the
        # attention block loop below is still reading the cache
        dma_col(0, 0, True)
        dma_row(0, 0, True)

        # shared (G, G*bk) block-diagonal structure; f32 mask math
        lane = jax.lax.broadcasted_iota(jnp.int32, (G, GB), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (G, GB), 0)
        own_f = jnp.where((lane // bk) == row, 1.0, 0.0)

        # ---- grouped valid-block attention (token-exact) --------------
        for bg in range(B // G):
            wp_max = wp_ref[bg * G]
            for g in range(1, G):
                wp_max = jnp.maximum(wp_max, wp_ref[bg * G + g])
            n_blocks = wp_max // bk + 1

            dma_kv(0, bg, 0, True)
            m_scr[:] = jnp.full_like(m_scr, NEG_INF)
            l_scr[:] = jnp.zeros_like(l_scr)
            acc_scr[:] = jnp.zeros_like(acc_scr)

            def loop(blk, _, bg=bg):
                slot = blk % 2
                nxt = (blk + 1) % 2

                @pl.when(blk + 1 < n_blocks)
                def _():
                    dma_kv(nxt, bg, blk + 1, True)

                dma_kv(slot, bg, blk, False)

                col = blk * bk + (lane % bk)
                valid_f = own_f
                for g in range(G):
                    in_text = jnp.where(
                        col < x_lens_ref[bg * G + g], 1.0, 0.0)
                    in_audio = jnp.where(col >= S, 1.0, 0.0) * jnp.where(
                        col <= wp_ref[bg * G + g], 1.0, 0.0)
                    vg = jnp.minimum(in_text + in_audio, 1.0)
                    row_g = jnp.where(row == g, 1.0, 0.0)
                    valid_f = valid_f * (1.0 - row_g * (1.0 - vg))

                for h in range(H):
                    # bf16 operands feed the MXU directly with fp32
                    # accumulation — no full-buffer up-cast (see
                    # decode_attention_lanes.py)
                    KVh = kvbuf[slot, :, h * 2 * Dh:(h + 1) * 2 * Dh]
                    Qh = q_ref[h, bg * G:(bg + 1) * G, :]     # (G, Dh)
                    Q2 = jnp.concatenate(
                        [Qh, jnp.zeros_like(Qh)], axis=1)     # (G, 2Dh)
                    s = jax.lax.dot_general(
                        Q2, KVh, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    s = s * sm_scale
                    s = s * valid_f + (1.0 - valid_f) * NEG_INF
                    m_prev = m_scr[h]
                    m_new = jnp.maximum(
                        m_prev, jnp.max(s, axis=-1, keepdims=True))
                    p = jnp.exp(s - m_new)
                    alpha = jnp.exp(m_prev - m_new)
                    l_scr[h] = l_scr[h] * alpha + jnp.sum(
                        p, axis=-1, keepdims=True)
                    pv = jax.lax.dot_general(
                        p.astype(KVh.dtype), KVh, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)   # (G, 2Dh)
                    acc_scr[h] = acc_scr[h] * alpha + pv[:, Dh:]
                    m_scr[h] = m_new
                return _

            jax.lax.fori_loop(0, n_blocks, loop, None)
            for h in range(H):
                attn_scr[h, bg * G:(bg + 1) * G, :] = (
                    acc_scr[h] / jnp.maximum(l_scr[h], 1e-30)).astype(
                        attn_scr.dtype)

        # ---- out-proj + residual, HEAD-WISE (no (H,B,Dh)->(B,D)
        #      relayout: sum_h attn[h] @ out_w[h*Dh:(h+1)*Dh, cols]) ----
        for c in range(n_out):
            if c + 1 < n_col:
                dma_col((c + 1) % 2, c + 1, True)
            dma_col(c % 2, c, False)
            y = jax.lax.dot_general(
                attn_scr[0], colbuf[c % 2, 0:Dh, :].astype(
                    attn_scr.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            for h in range(1, H):
                y = y + jax.lax.dot_general(
                    attn_scr[h],
                    colbuf[c % 2, h * Dh:(h + 1) * Dh, :].astype(
                        attn_scr.dtype),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            y = y.astype(o_ref.dtype) + ob_ref[:, pl.ds(c * cw, cw)]
            h1_scr[:, pl.ds(c * cw, cw)] = r_ref[:, pl.ds(c * cw, cw)] + y

        n = _layer_norm2d(h1_scr[:], lns_ref[:], lnb_ref[:])

        # ---- lin1 + activation ----------------------------------------
        for c in range(n_f1):
            i = n_out + c
            if i + 1 < n_col:
                dma_col((i + 1) % 2, i + 1, True)
            dma_col(i % 2, i, False)
            y = jax.lax.dot_general(
                n, colbuf[i % 2].astype(n.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(n.dtype)
            y = y + b1_ref[:, pl.ds(c * cw, cw)]
            if activation == "relu":
                y = jnp.maximum(y, 0)
            else:  # gelu
                y = jax.nn.gelu(y.astype(jnp.float32)).astype(y.dtype)
            ffh_scr[:, pl.ds(c * cw, cw)] = y

        # ---- lin2, accumulated over row chunks ------------------------
        facc_scr[:] = jnp.zeros_like(facc_scr)
        for c in range(n_f2):
            if c + 1 < n_f2:
                dma_row((c + 1) % 2, c + 1, True)
            dma_row(c % 2, c, False)
            facc_scr[:] = facc_scr[:] + jax.lax.dot_general(
                ffh_scr[:, pl.ds(c * cw, cw)],
                rowbuf[c % 2].astype(ffh_scr.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        ff = facc_scr[:].astype(o_ref.dtype) + b2_ref[:]
        o_ref[:] = h1_scr[:] + ff

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dt = r_ref.dtype
    pl.run_scoped(
        body,
        kvbuf=pltpu.VMEM((2, GB, 2 * Dh * H), kv_hbm.dtype),
        kvsems=pltpu.SemaphoreType.DMA((2, G)),
        colbuf=pltpu.VMEM((2, D, cw), ow_hbm.dtype),
        rowbuf=pltpu.VMEM((2, cw, D), w2_hbm.dtype),
        csems=pltpu.SemaphoreType.DMA((2,)),
        rsems=pltpu.SemaphoreType.DMA((2,)),
        attn_scr=pltpu.VMEM((H, B, Dh), dt),
        m_scr=pltpu.VMEM((H, G, 1), jnp.float32),
        l_scr=pltpu.VMEM((H, G, 1), jnp.float32),
        acc_scr=pltpu.VMEM((H, G, Dh), jnp.float32),
        h1_scr=pltpu.VMEM((B, D), dt),
        ffh_scr=pltpu.VMEM((B, F), dt),
        facc_scr=pltpu.VMEM((B, D), jnp.float32),
    )


@functools.partial(
    jax.jit,
    static_argnames=("S", "group", "activation", "interpret"))
def fused_attn_tail(q, h_res, kv_cache, x_lens, write_pos, layer,
                    out_w, out_b, ln2_scale, ln2_bias, w1, b1, w2, b2, *,
                    S: int, group: int = 8, activation: str = "relu",
                    interpret: bool = False):
    """q (B, H, 1, Dh); h_res (B, D) layer input (residual);
    kv_cache: the PER-LAYER lane-row cache slice (B, T, H*2Dh) in the
    compute dtype with the current step's k/v ALREADY written at
    ``write_pos`` (head h lanes [h*2Dh,(h+1)*2Dh) as [K_h | V_h] — see
    ops/decode_attention_lanes.py); out_w (L, D, D), w1 (L, D, F),
    w2 (L, F, D) stacked in HBM with ``layer`` selecting the slice;
    biases / LN params are the per-layer slices. Returns the layer
    output (B, D). Requires B % group == 0 and T % bk == 0."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, _, Dh = q.shape
    _, T, _ = kv_cache.shape
    D = h_res.shape[-1]
    F = w1.shape[-1]
    G = group
    bk = _BK
    assert B % G == 0 and T % bk == 0, (B, G, T, bk)
    assert H * Dh == D, (H, Dh, D)
    sm_scale = 1.0 / math.sqrt(Dh)
    cw = _pick_chunk(D, F)

    q_t = jnp.transpose(q[:, :, 0, :], (1, 0, 2))  # (H, B, Dh)
    dt = h_res.dtype

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7 + [
            pl.BlockSpec(memory_space=pl.ANY),    # kv cache
            pl.BlockSpec(memory_space=pl.ANY),    # out_w
            pl.BlockSpec(memory_space=pl.ANY),    # w1
            pl.BlockSpec(memory_space=pl.ANY),    # w2
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(
        _kernel, S=S, T=T, bk=bk, G=G, sm_scale=sm_scale, D=D, F=F,
        cw=cw, activation=activation)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, D), dt),
        interpret=interpret,
    )(x_lens.astype(jnp.int32), write_pos.astype(jnp.int32),
      jnp.asarray(layer, jnp.int32).reshape(1),
      q_t.astype(dt), h_res,
      out_b.astype(dt).reshape(1, D),
      ln2_scale.astype(dt).reshape(1, D),
      ln2_bias.astype(dt).reshape(1, D),
      b1.astype(dt).reshape(1, F),
      b2.astype(dt).reshape(1, D),
      kv_cache, out_w.astype(dt), w1.astype(dt), w2.astype(dt))
