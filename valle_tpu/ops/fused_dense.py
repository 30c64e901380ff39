"""Fused dense-path Pallas kernels for the AR decode step.

The decode-step cost decomposition (BASELINE.md) shows each layer runs at
~45% of its HBM floor: the per-layer 0.252 ms splits into ~0.115 ms of
mandatory traffic (weights + cache) and ~0.137 ms of sequential small-op
overhead — fusion boundaries between LN/matmul/residual ops that XLA
schedules back to back without overlapping the next op's weight fetch
with the current op's compute.

These kernels collapse the layer's DENSE path (everything except
attention, which stays on the measured-at-parity XLA/int8 paths) into two
pallas_calls that stream their weights from HBM through double-buffered
VMEM slots — the DMA for chunk i+1 is in flight while chunk i is on the
MXU:

- ``fused_ln_qkv``:  h -> LayerNorm1 -> @ in_w + in_b  (the attention
  input projection; 6 MB of weights at D=1024)
- ``fused_tail``:    attn_out -> @ out_w + out_b -> +residual ->
  LayerNorm2 -> FFN (lin1/act/lin2) -> +residual  (18 MB of weights)

Weights stay STACKED (L, ...) in HBM; the layer index arrives as a
scalar-prefetch argument and selects the slice per DMA, so the kernels
work unchanged under ``lax.fori_loop`` over layers (no per-layer
dynamic-slice materialization in XLA either).

INT8 WEIGHT STREAMING (weight-only quantization): pass int8 weights plus
per-output-channel scales (``quantize_weights_per_channel``) and the
kernels halve the streamed bytes, dequantizing by scaling the fp32 MXU
accumulator AFTER the dot (q . (wq*s) == (q . wq) * s per column — more
accurate than materializing bf16-dequantized weights). The unquantized
path passes scale=1 through the identical code, so it stays bit-identical
to the original kernels.

Numerics: all element-wise math and residuals run in the input dtype
(matching modules/transformer.py's decode step exactly at fp32);
matmuls accumulate fp32 on the MXU and cast back; LayerNorm runs fp32
internally like ``layer_norm``. With fp32 inputs the outputs match the
XLA path to float round-off (pinned by tests/test_fused_dense.py);
with bf16 inputs they differ only by fusion-order rounding.

Reference hot path being replaced: the per-token re-run of
``nn.TransformerEncoder`` in /root/reference/valle/models/valle.py:1004-1057.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Column/row chunk width for streamed weights. 512 lanes of bf16 at
# D=1024 rows = 1 MiB per chunk; two slots per buffer double-buffer the
# HBM->VMEM stream. Four live weight buffers + scratch stay well inside
# the ~8 MiB of scoped VMEM available at decode shapes. Chunk 1024 also
# compiles (4 MiB slots) and measured parity (3.07 vs 3.10 ms/step,
# cross-session) — 512 stays the default for VMEM headroom; override via
# VALLE_TPU_FUSED_CHUNK for experiments.
_CHUNK = int(__import__("os").environ.get("VALLE_TPU_FUSED_CHUNK", "512"))


def _pick_chunk(*dims: int) -> int:
    """Largest chunk width <= _CHUNK dividing every given dim (>=1)."""
    c = min(_CHUNK, *dims)
    while any(d % c for d in dims):
        c -= 1
    return c


def fused_dense_supported(d_model: int, dim_ff: int) -> bool:
    """True when the fused kernels' streamed slices are TPU-lane aligned
    for this model shape (all matmul dims multiples of 128). Callers
    (valle_inference / resolve_auto_decode_mode) fall back to the XLA
    path otherwise instead of tripping Mosaic alignment failures."""
    return (d_model % 128 == 0 and (3 * d_model) % 128 == 0
            and dim_ff % 128 == 0)


def quantize_weights_per_channel(w, axis: int = -2):
    """Per-output-channel symmetric int8 quantization of a weight matrix
    (..., D_in, D_out): reduce |max| over ``axis`` (the input dim).

    Returns (w_q int8, scale f32 with the input dim removed)."""
    amax = jnp.max(jnp.abs(w), axis=axis)
    scale = (amax / 127.0 + 1e-12).astype(jnp.float32)
    wq = jnp.round(w / jnp.expand_dims(scale, axis)).astype(jnp.int8)
    return wq, scale


def _layer_norm2d(x, scale, bias, eps=1e-5):
    """x (B, D); scale/bias (1, D). fp32 internals like layer_norm()."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _mms(a, w, s):
    """MXU matmul with fp32 accumulation, post-dot per-column scale
    (dequant; s == 1 leaves the fp32 value untouched), cast to a.dtype."""
    y = jax.lax.dot_general(
        a, w.astype(a.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return (y * s).astype(a.dtype)


# ---------------------------------------------------------------------------
# LN1 + QKV projection
# ---------------------------------------------------------------------------


def _ln_qkv_kernel(l_ref, h_ref, lns_ref, lnb_ref, b_ref, ws_ref, w_hbm,
                   o_ref, *, D, CO, cw):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    l = l_ref[0]
    nchunks = CO // cw

    def body(wbuf, sems):
        def dma(slot, c, start):
            cp = pltpu.make_async_copy(
                w_hbm.at[l, :, pl.ds(c * cw, cw)],
                wbuf.at[slot], sems.at[slot])
            cp.start() if start else cp.wait()

        dma(0, 0, True)
        n = _layer_norm2d(h_ref[:], lns_ref[:], lnb_ref[:])

        # Canonical stream: at chunk c, start c+1 into the other slot
        # (its previous occupant c-1 was consumed last iteration), then
        # wait for and consume c. At most one DMA in flight per slot.
        for c in range(nchunks):
            if c + 1 < nchunks:
                dma((c + 1) % 2, c + 1, True)
            dma(c % 2, c, False)
            y = _mms(n, wbuf[c % 2], ws_ref[:, pl.ds(c * cw, cw)])
            o_ref[:, pl.ds(c * cw, cw)] = y + b_ref[:, pl.ds(c * cw, cw)]

    pl.run_scoped(
        body,
        wbuf=pltpu.VMEM((2, D, cw), w_hbm.dtype),
        sems=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_ln_qkv(h, ln_scale, ln_bias, in_w, in_b, layer, *,
                 w_scale=None, interpret: bool = False):
    """h (B, D) -> LayerNorm -> @ in_w[layer] + in_b -> (B, 3D).

    in_w: (L, D, 3D) stacked in HBM — dtype matching h, or int8 with
    ``w_scale`` the per-layer (3D,) dequant scales. ln_scale / ln_bias /
    in_b are the already-sliced per-layer params (D,), (3D,).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, D = h.shape
    CO = in_w.shape[-1]
    cw = _pick_chunk(CO)      # largest divisor of CO up to _CHUNK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # h
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ln scale (1, D)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ln bias (1, D)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # in_b (1, 3D)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w scale (1, 3D)
            pl.BlockSpec(memory_space=pl.ANY),    # in_w (L, D, 3D)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_ln_qkv_kernel, D=D, CO=CO, cw=cw)
    dt = h.dtype
    if w_scale is None:
        ws = jnp.ones((1, CO), jnp.float32)
    else:
        ws = w_scale.astype(jnp.float32).reshape(1, CO)
        assert in_w.dtype == jnp.int8
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, CO), dt),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1),
      h, ln_scale.astype(dt).reshape(1, D),
      ln_bias.astype(dt).reshape(1, D),
      in_b.astype(dt).reshape(1, CO), ws,
      in_w if w_scale is not None else in_w.astype(dt))


# ---------------------------------------------------------------------------
# out-proj + residual + LN2 + FFN + residual
# ---------------------------------------------------------------------------


def _tail_kernel(l_ref, a_ref, r_ref, ob_ref, lns_ref, lnb_ref, b1_ref,
                 b2_ref, os_ref, s1_ref, s2_ref, ow_hbm, w1_hbm, w2_hbm,
                 o_ref, *, D, F, cw, activation):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    l = l_ref[0]
    n_out = D // cw          # out_w col chunks
    n_f1 = F // cw           # lin1 col chunks
    n_col = n_out + n_f1     # one col-chunk stream: out_w then w1
    n_f2 = F // cw           # lin2 row chunks

    def body(colbuf, rowbuf, csems, rsems, h1_scr, ffh_scr, acc_scr):
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

        dma_col(0, 0, True)
        dma_row(0, 0, True)   # first lin2 chunk rides out the whole FFN1
        a = a_ref[:]

        # --- out proj + residual: h1 = r + a @ out_w + out_b -----------
        for c in range(n_out):
            if c + 1 < n_col:
                dma_col((c + 1) % 2, c + 1, True)
            dma_col(c % 2, c, False)
            y = _mms(a, colbuf[c % 2], os_ref[:, pl.ds(c * cw, cw)])
            y = y + ob_ref[:, pl.ds(c * cw, cw)]
            h1_scr[:, pl.ds(c * cw, cw)] = r_ref[:, pl.ds(c * cw, cw)] + y

        n = _layer_norm2d(h1_scr[:], lns_ref[:], lnb_ref[:])

        # --- lin1 + activation -----------------------------------------
        for c in range(n_f1):
            i = n_out + c
            if i + 1 < n_col:
                dma_col((i + 1) % 2, i + 1, True)
            dma_col(i % 2, i, False)
            y = _mms(n, colbuf[i % 2], s1_ref[:, pl.ds(c * cw, cw)])
            y = y + b1_ref[:, pl.ds(c * cw, cw)]
            if activation == "relu":
                y = jnp.maximum(y, 0)
            else:  # gelu
                y = jax.nn.gelu(y.astype(jnp.float32)).astype(y.dtype)
            ffh_scr[:, pl.ds(c * cw, cw)] = y

        # --- lin2, accumulated over row chunks; per-column dequant
        #     applies to the WHOLE sum, so it moves after the loop -------
        acc_scr[:] = jnp.zeros_like(acc_scr)
        for c in range(n_f2):
            if c + 1 < n_f2:
                dma_row((c + 1) % 2, c + 1, True)
            dma_row(c % 2, c, False)
            acc_scr[:] = acc_scr[:] + jax.lax.dot_general(
                ffh_scr[:, pl.ds(c * cw, cw)],
                rowbuf[c % 2].astype(ffh_scr.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        ff = (acc_scr[:] * s2_ref[:]).astype(o_ref.dtype) + b2_ref[:]
        o_ref[:] = h1_scr[:] + ff

    pl.run_scoped(
        body,
        colbuf=pltpu.VMEM((2, D, cw), ow_hbm.dtype),
        rowbuf=pltpu.VMEM((2, cw, D), w2_hbm.dtype),
        csems=pltpu.SemaphoreType.DMA((2,)),
        rsems=pltpu.SemaphoreType.DMA((2,)),
        h1_scr=pltpu.VMEM((a_ref.shape[0], D), a_ref.dtype),
        ffh_scr=pltpu.VMEM((a_ref.shape[0], F), a_ref.dtype),
        acc_scr=pltpu.VMEM((a_ref.shape[0], D), jnp.float32),
    )


@functools.partial(jax.jit, static_argnames=("activation", "interpret"))
def fused_tail(attn_out, h_res, out_w, out_b, ln2_scale, ln2_bias,
               w1, b1, w2, b2, layer, *, activation: str = "relu",
               w_scales=None, interpret: bool = False):
    """attn_out, h_res (B, D) -> out-proj + residual + LN2 + FFN +
    residual -> (B, D).

    out_w (L, D, D), w1 (L, D, F), w2 (L, F, D) stacked in HBM — dtype
    matching the activations, or int8 with ``w_scales`` a per-layer
    (out_s (D,), s1 (F,), s2 (D,)) tuple of dequant scales. Biases / LN
    params are the per-layer slices.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, D = attn_out.shape
    F = w1.shape[-1]
    cw = _pick_chunk(D, F)    # largest common divisor chunk up to _CHUNK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 10 + [
            pl.BlockSpec(memory_space=pl.ANY),    # out_w
            pl.BlockSpec(memory_space=pl.ANY),    # w1
            pl.BlockSpec(memory_space=pl.ANY),    # w2
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_tail_kernel, D=D, F=F, cw=cw,
                               activation=activation)
    dt = attn_out.dtype
    if w_scales is None:
        os_ = jnp.ones((1, D), jnp.float32)
        s1 = jnp.ones((1, F), jnp.float32)
        s2 = jnp.ones((1, D), jnp.float32)
        ow, w1c, w2c = out_w.astype(dt), w1.astype(dt), w2.astype(dt)
    else:
        assert out_w.dtype == w1.dtype == w2.dtype == jnp.int8
        os_, s1, s2 = (w_scales[0].astype(jnp.float32).reshape(1, D),
                       w_scales[1].astype(jnp.float32).reshape(1, F),
                       w_scales[2].astype(jnp.float32).reshape(1, D))
        ow, w1c, w2c = out_w, w1, w2
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, D), dt),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1),
      attn_out, h_res.astype(dt),
      out_b.astype(dt).reshape(1, D),
      ln2_scale.astype(dt).reshape(1, D),
      ln2_bias.astype(dt).reshape(1, D),
      b1.astype(dt).reshape(1, F),
      b2.astype(dt).reshape(1, D),
      os_, s1, s2, ow, w1c, w2c)
