"""Pure-functional Transformer stacks with optional adaptive layer norm.

Capability parity with reference ``valle/modules/transformer.py`` +
``valle/modules/activation.py``: pre/post-norm encoder and decoder layers,
plain LayerNorm or AdaptiveLayerNorm (stage-conditioned affine modulation,
reference ``transformer.py:83-108``), relu/gelu FFN, multi-head attention
with additive masks.

TPU-first design:
- explicit parameter pytrees, layers stacked on a leading axis and executed
  with ``lax.scan`` (one compiled layer body regardless of depth);
- the reference's ``(tensor, stage_embedding)`` tuple threading is replaced
  by a clean optional ``cond`` argument;
- attention takes a single pre-composed additive bias (see ``ops/masks.py``);
- a static KV cache + single-token decode path for the AR inference loop
  (the reference recomputes the full sequence per token,
  ``valle/models/valle.py:1004-1057``);
- softmax/LayerNorm statistics in fp32 regardless of compute dtype.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .embedding import dropout as _dropout

# Opt-in bf16 score materialization for TRAINING attention (the NAR-step
# profile attributes 2.4 GB/layer-pass of HBM traffic to the f32 S x S
# score/probability matrices — BASELINE.md). The matmul still accumulates
# fp32 on the MXU; only the MATERIALIZED scores/probs (and the softmax
# reductions over them) drop to bf16, halving that traffic. Guarded by the
# loss-parity check in benchmarks/bench_train_stage.py; fp32 compute paths
# are unaffected (the cast only applies to bf16 inputs).
SCORE_BF16 = os.environ.get("VALLE_TPU_ATTN_SCORE_BF16", "0") == "1"

# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------


def _xavier_uniform(rng, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[-1]
    a = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(rng, shape, dtype, minval=-a, maxval=a)


def _kaiming_uniform_linear(rng, d_in, d_out, dtype=jnp.float32):
    """torch nn.Linear default: kaiming_uniform(a=sqrt(5)) => U(±1/sqrt(fan_in))·sqrt(3)."""
    bound = math.sqrt(1.0 / d_in) * math.sqrt(3.0)
    return jax.random.uniform(rng, (d_in, d_out), dtype, -bound, bound)


def init_linear(rng, d_in: int, d_out: int, bias: bool = True):
    wkey, bkey = jax.random.split(rng)
    p = {"w": _kaiming_uniform_linear(wkey, d_in, d_out)}
    if bias:
        bound = 1.0 / math.sqrt(d_in)
        p["b"] = jax.random.uniform(bkey, (d_out,), jnp.float32, -bound, bound)
    return p


def linear(p, x, dtype=None):
    w = p["w"]
    if dtype is not None:
        w = w.astype(dtype)
    y = x @ w
    if "b" in p:
        b = p["b"]
        if dtype is not None:
            b = b.astype(dtype)
        y = y + b
    return y


def init_layer_norm(d: int):
    return {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}


def layer_norm(p, x, eps: float = 1e-5):
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def init_ada_layer_norm(rng, d: int):
    """AdaptiveLayerNorm: affine from projected conditioning vector."""
    return {
        "proj": init_linear(rng, d, 2 * d, bias=True),
        "norm": init_layer_norm(d),
    }


def ada_layer_norm(p, x, cond, eps: float = 1e-5):
    """cond: (1|B, d) stage embedding -> weight/bias (reference transformer.py:93-108)."""
    wb = linear(p["proj"], cond.astype(jnp.float32))
    weight, bias = jnp.split(wb, 2, axis=-1)
    y = layer_norm(p["norm"], x, eps)
    return (weight[:, None, :].astype(x.dtype) * y
            + bias[:, None, :].astype(x.dtype))


def apply_norm(p, x, cond=None, eps: float = 1e-5):
    """Dispatch on the param structure: AdaLN iff a 'proj' sub-tree exists."""
    if "proj" in p:
        return ada_layer_norm(p, x, cond, eps)
    return layer_norm(p, x, eps)


# ---------------------------------------------------------------------------
# Multi-head attention (full-sequence and cached-decode paths)
# ---------------------------------------------------------------------------


def init_mha(rng, d: int, nhead: int):
    """Single fused in-projection like torch MHA (in_proj [d, 3d]) + out proj."""
    k1, k2 = jax.random.split(rng)
    return {
        "in_w": _xavier_uniform(k1, (d, 3 * d)),
        "in_b": jnp.zeros((3 * d,)),
        "out_w": _kaiming_uniform_linear(k2, d, d),
        "out_b": jnp.zeros((d,)),
    }


def _split_heads(x, nhead):
    B, T, D = x.shape
    return x.reshape(B, T, nhead, D // nhead).transpose(0, 2, 1, 3)


def _merge_heads(x):
    B, H, T, Dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, T, H * Dh)


def _attend(q, k, v, bias, *, dropout_rate=0.0, rng=None, deterministic=True,
            score_bf16=None, flash_spec=None):
    """q,k,v: (B, H, T, Dh); bias broadcastable to (B, H, Tq, Tk).

    ``flash_spec`` (dict: qcode, kcode, optional qseg/kseg/add_diag — see
    ops/flash_mha.py and ops/masks.flash_codes_*) routes the call through
    the fused fwd+bwd Pallas training-attention kernel: the mask is rebuilt
    in VMEM from the codes (``bias`` is ignored and may be None), dropout
    on the probabilities is drawn in-kernel from the hardware PRNG, and
    the S x T score/probability matrices never reach HBM in either
    direction. Otherwise the einsum path materializes scores/probs (bf16
    under ``score_bf16``, the round-3 win) with XLA-side mask application
    and dropout — the reference's semantics (activation.py:12) either way.
    """
    if flash_spec is not None:
        from ..ops.flash_mha import flash_mha_train

        return flash_mha_train(
            q, k, v, flash_spec["qcode"], flash_spec["kcode"],
            qseg=flash_spec.get("qseg"), kseg=flash_spec.get("kseg"),
            add_diag=flash_spec.get("add_diag", False),
            dropout_rate=(0.0 if deterministic or rng is None
                          else dropout_rate),
            rng=rng, interpret=jax.default_backend() != "tpu")
    if score_bf16 is None:
        score_bf16 = SCORE_BF16   # env override for benches/experiments
    sdt = (jnp.bfloat16 if score_bf16 and q.dtype == jnp.bfloat16
           else jnp.float32)
    if (deterministic or dropout_rate == 0.0 or rng is None) \
            and sdt == jnp.float32:
        from ..ops.attention import fused_attention

        return fused_attention(q, k, v, bias)
    # einsum path: attention-dropout training steps (the reference applies
    # dropout on the probabilities, activation.py:12, which the fused
    # kernel does not model) and bf16-score calls (the S x T score matrix
    # is the HBM bottleneck at full-sequence shapes; storing it bf16 is
    # the measured NAR-stage win — BASELINE.md round 3).
    from jax.ad_checkpoint import checkpoint_name

    dh = q.shape[-1]
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ).astype(sdt) / math.sqrt(dh)
    if bias is not None:
        scores = scores + bias.astype(sdt)
    # names are inert identities except under remat="scores"
    # (_apply_remat): that policy saves every residual EXCEPT these two
    # (B, H, Tq, Tk) matrices — the dominant activation memory at
    # full-sequence training shapes — and recomputes QK^T + softmax in
    # the backward pass (flash-attention's memory shape, via XLA).
    scores = checkpoint_name(scores, "attn_scores")
    probs = jax.nn.softmax(scores, axis=-1)
    probs = checkpoint_name(probs, "attn_probs")
    probs = _dropout(probs, dropout_rate, rng, deterministic)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(v.dtype)


def mha_self(p, x, bias, nhead, *, dropout_rate=0.0, rng=None,
             deterministic=True, dtype=None, score_bf16=None,
             flash_spec=None):
    """Full-sequence self-attention. x: (B, T, D)."""
    in_w = p["in_w"] if dtype is None else p["in_w"].astype(dtype)
    in_b = p["in_b"] if dtype is None else p["in_b"].astype(dtype)
    qkv = x @ in_w + in_b
    q, k, v = jnp.split(qkv, 3, axis=-1)
    out = _attend(
        _split_heads(q, nhead), _split_heads(k, nhead), _split_heads(v, nhead),
        bias, dropout_rate=dropout_rate, rng=rng, deterministic=deterministic,
        score_bf16=score_bf16, flash_spec=flash_spec,
    )
    out = _merge_heads(out)
    out_w = p["out_w"] if dtype is None else p["out_w"].astype(dtype)
    out_b = p["out_b"] if dtype is None else p["out_b"].astype(dtype)
    return out @ out_w + out_b


def mha_self_kv(p, x, nhead, dtype=None):
    """Project k, v only (for prefill/cross-memory caching)."""
    d = x.shape[-1]
    in_w = p["in_w"] if dtype is None else p["in_w"].astype(dtype)
    in_b = p["in_b"] if dtype is None else p["in_b"].astype(dtype)
    kv = x @ in_w[:, d:] + in_b[d:]
    k, v = jnp.split(kv, 2, axis=-1)
    return _split_heads(k, nhead), _split_heads(v, nhead)


def mha_cross(p, xq, mem_k, mem_v, bias, nhead, *, dropout_rate=0.0, rng=None,
              deterministic=True, dtype=None, score_bf16=None):
    """Cross-attention with precomputed memory k/v (B, H, S, Dh)."""
    d = xq.shape[-1]
    in_w = p["in_w"] if dtype is None else p["in_w"].astype(dtype)
    in_b = p["in_b"] if dtype is None else p["in_b"].astype(dtype)
    q = xq @ in_w[:, :d] + in_b[:d]
    out = _attend(
        _split_heads(q, nhead), mem_k, mem_v, bias,
        dropout_rate=dropout_rate, rng=rng, deterministic=deterministic,
        score_bf16=score_bf16,
    )
    out = _merge_heads(out)
    out_w = p["out_w"] if dtype is None else p["out_w"].astype(dtype)
    out_b = p["out_b"] if dtype is None else p["out_b"].astype(dtype)
    return out @ out_w + out_b


def quantize_kv(x, axis=-1):
    """Symmetric per-position int8 quantization for KV caches.

    x (..., Dh) -> (int8 values, scales (...,)) with x ~= q * scale.
    Halves the decode loop's dominant HBM traffic (the cache reads).
    """
    scale = jnp.maximum(
        jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=True)
        / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127,
                 127).astype(jnp.int8)
    return q, scale[..., 0]


def mha_decode_step_int8(p, x, cache_k, cache_v, k_scale, v_scale, pos,
                         bias, nhead, dtype=None):
    """Decode step over an int8-quantized KV cache.

    cache_k/v: (B, H, Tmax, Dh) int8; k/v_scale: (B, H, Tmax) fp.
    """
    B = x.shape[0]
    in_w = p["in_w"] if dtype is None else p["in_w"].astype(dtype)
    in_b = p["in_b"] if dtype is None else p["in_b"].astype(dtype)
    qkv = x @ in_w + in_b
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = _split_heads(q, nhead)
    k = _split_heads(k, nhead)
    v = _split_heads(v, nhead)
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    bidx = jnp.arange(B)
    cache_k = cache_k.at[bidx, :, pos, :].set(kq[:, :, 0, :])
    cache_v = cache_v.at[bidx, :, pos, :].set(vq[:, :, 0, :])
    k_scale = k_scale.at[bidx, :, pos].set(ks[:, :, 0])
    v_scale = v_scale.at[bidx, :, pos].set(vs[:, :, 0])
    dt = q.dtype
    kf = cache_k.astype(dt) * k_scale[..., None].astype(dt)
    vf = cache_v.astype(dt) * v_scale[..., None].astype(dt)
    out = _attend(q, kf, vf, bias)
    out = _merge_heads(out)
    out_w = p["out_w"] if dtype is None else p["out_w"].astype(dtype)
    out_b = p["out_b"] if dtype is None else p["out_b"].astype(dtype)
    return out @ out_w + out_b, cache_k, cache_v, k_scale, v_scale


def mha_decode_step(p, x, cache_k, cache_v, pos, bias, nhead, dtype=None,
                    kernel_ctx=None):
    """One-token self-attention against a static KV cache.

    x: (B, 1, D); cache_k/v: (B, H, Tmax, Dh); pos: (B,) per-sample indices
    where the new k/v are written (samples may sit at different sequence
    offsets, e.g. unequal prompt lengths in batched AR decode). bias:
    (B, 1, 1, Tmax) additive key mask (must mask unwritten positions).
    ``kernel_ctx=(x_lens, write_pos, S, interpret, mode)`` routes the
    attention through the Pallas decode kernel (reads only valid cache
    blocks). Returns (out, new_cache_k, new_cache_v).
    """
    B = x.shape[0]
    in_w = p["in_w"] if dtype is None else p["in_w"].astype(dtype)
    in_b = p["in_b"] if dtype is None else p["in_b"].astype(dtype)
    qkv = x @ in_w + in_b
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = _split_heads(q, nhead)           # (B, H, 1, Dh)
    k = _split_heads(k, nhead)           # (B, H, 1, Dh)
    v = _split_heads(v, nhead)
    if kernel_ctx is not None:
        # Pallas decode-kernel path: caches are stored TRANSPOSED as
        # (B, H, Dh, Tmax) so the kernel's HBM DMA slices are lane-aligned.
        from ..ops.decode_attention import decode_attention

        bidx = jnp.arange(B)
        cache_k = cache_k.at[bidx, :, :, pos].set(k[:, :, 0, :])
        cache_v = cache_v.at[bidx, :, :, pos].set(v[:, :, 0, :])
        x_lens, write_pos, S, interp, mode = kernel_ctx
        if mode == "grouped":
            from ..ops.decode_attention_grouped import (
                decode_attention_grouped,
            )

            out = decode_attention_grouped(
                q, cache_k, cache_v, x_lens, write_pos, S=S, group=8,
                interpret=interp)
        else:
            out = decode_attention(q, cache_k, cache_v, x_lens, write_pos,
                                   S=S, interpret=interp)
    elif jnp.ndim(pos) == 0:
        # aligned fast path: one slice update instead of a gather/scatter
        cache_k = jax.lax.dynamic_update_slice_in_dim(cache_k, k, pos,
                                                      axis=2)
        cache_v = jax.lax.dynamic_update_slice_in_dim(cache_v, v, pos,
                                                      axis=2)
        out = _attend(q, cache_k, cache_v, bias)
    else:
        bidx = jnp.arange(B)
        cache_k = cache_k.at[bidx, :, pos, :].set(k[:, :, 0, :])
        cache_v = cache_v.at[bidx, :, pos, :].set(v[:, :, 0, :])
        out = _attend(q, cache_k, cache_v, bias)
    out = _merge_heads(out)
    out_w = p["out_w"] if dtype is None else p["out_w"].astype(dtype)
    out_b = p["out_b"] if dtype is None else p["out_b"].astype(dtype)
    return out @ out_w + out_b, cache_k, cache_v


# ---------------------------------------------------------------------------
# Encoder layer / stack
# ---------------------------------------------------------------------------

_ACTIVATIONS = {"relu": jax.nn.relu, "gelu": jax.nn.gelu}


def init_encoder_layer(rng, d: int, nhead: int, dim_ff: int, adaptive: bool):
    ks = jax.random.split(rng, 6)
    norm_init = (lambda r: init_ada_layer_norm(r, d)) if adaptive else (
        lambda r: init_layer_norm(d))
    return {
        "self_attn": init_mha(ks[0], d, nhead),
        "ffn": {
            "lin1": init_linear(ks[1], d, dim_ff),
            "lin2": init_linear(ks[2], dim_ff, d),
        },
        "norm1": norm_init(ks[3]),
        "norm2": norm_init(ks[4]),
    }


def init_decoder_layer(rng, d: int, nhead: int, dim_ff: int, adaptive: bool):
    # distinct keys per sub-init: passing the parent rng into
    # init_encoder_layer while also consuming split(rng, 7)[5:] only
    # avoided key overlap by an implementation detail of threefry splits
    k_enc, k_cross, k_norm3 = jax.random.split(rng, 3)
    p = init_encoder_layer(k_enc, d, nhead, dim_ff, adaptive)
    norm_init = (lambda r: init_ada_layer_norm(r, d)) if adaptive else (
        lambda r: init_layer_norm(d))
    p["cross_attn"] = init_mha(k_cross, d, nhead)
    p["norm3"] = norm_init(k_norm3)
    return p


def _ffn(p, x, activation, *, dropout_rate, rng, deterministic, dtype):
    h = _ACTIVATIONS[activation](linear(p["lin1"], x, dtype))
    h = _dropout(h, dropout_rate, rng, deterministic)
    return linear(p["lin2"], h, dtype)


def encoder_layer_apply(
    p, x, bias, cond, *, nhead, norm_first=True, activation="relu",
    dropout_rate=0.0, rng=None, deterministic=True, dtype=None,
    score_bf16=None, flash_spec=None,
):
    """One pre/post-norm encoder layer (reference transformer.py:296-308)."""
    if rng is not None:
        r_attn, r_d1, r_ffn, r_d2 = jax.random.split(rng, 4)
    else:
        r_attn = r_d1 = r_ffn = r_d2 = None

    def sa(h):
        out = mha_self(p["self_attn"], h, bias, nhead,
                       dropout_rate=dropout_rate, rng=r_attn,
                       deterministic=deterministic, dtype=dtype,
                       score_bf16=score_bf16, flash_spec=flash_spec)
        return _dropout(out, dropout_rate, r_d1, deterministic)

    def ff(h):
        out = _ffn(p["ffn"], h, activation, dropout_rate=dropout_rate,
                   rng=r_ffn, deterministic=deterministic, dtype=dtype)
        return _dropout(out, dropout_rate, r_d2, deterministic)

    if norm_first:
        x = x + sa(apply_norm(p["norm1"], x, cond))
        x = x + ff(apply_norm(p["norm2"], x, cond))
    else:
        x = apply_norm(p["norm1"], x + sa(x), cond)
        x = apply_norm(p["norm2"], x + ff(x), cond)
    return x


def decoder_layer_apply(
    p, x, mem_k, mem_v, self_bias, cross_bias, cond, *, nhead,
    norm_first=True, activation="relu", dropout_rate=0.0, rng=None,
    deterministic=True, dtype=None, score_bf16=None,
):
    """Decoder layer with cross-attention (reference transformer.py:534-557)."""
    if rng is not None:
        r1, r2, r3, r4, r5, r6 = jax.random.split(rng, 6)
    else:
        r1 = r2 = r3 = r4 = r5 = r6 = None

    def sa(h):
        out = mha_self(p["self_attn"], h, self_bias, nhead,
                       dropout_rate=dropout_rate, rng=r1,
                       deterministic=deterministic, dtype=dtype,
                       score_bf16=score_bf16)
        return _dropout(out, dropout_rate, r2, deterministic)

    def ca(h):
        out = mha_cross(p["cross_attn"], h, mem_k, mem_v, cross_bias, nhead,
                        dropout_rate=dropout_rate, rng=r3,
                        deterministic=deterministic, dtype=dtype,
                        score_bf16=score_bf16)
        return _dropout(out, dropout_rate, r4, deterministic)

    def ff(h):
        out = _ffn(p["ffn"], h, activation, dropout_rate=dropout_rate,
                   rng=r5, deterministic=deterministic, dtype=dtype)
        return _dropout(out, dropout_rate, r6, deterministic)

    if norm_first:
        x = x + sa(apply_norm(p["norm1"], x, cond))
        x = x + ca(apply_norm(p["norm2"], x, cond))
        x = x + ff(apply_norm(p["norm3"], x, cond))
    else:
        x = apply_norm(p["norm1"], x + sa(x), cond)
        x = apply_norm(p["norm2"], x + ca(x), cond)
        x = apply_norm(p["norm3"], x + ff(x), cond)
    return x


# ---------------------------------------------------------------------------
# Stacks (scan over stacked layer params)
# ---------------------------------------------------------------------------


def init_encoder_stack(rng, num_layers, d, nhead, dim_ff, adaptive,
                       final_norm: bool):
    lrngs = jax.random.split(rng, num_layers + 1)
    layers = jax.vmap(
        partial(init_encoder_layer, d=d, nhead=nhead, dim_ff=dim_ff,
                adaptive=adaptive)
    )(lrngs[:num_layers])
    p = {"layers": layers}
    if final_norm:
        p["final_norm"] = (
            init_ada_layer_norm(lrngs[-1], d) if adaptive
            else init_layer_norm(d)
        )
    return p


def init_decoder_stack(rng, num_layers, d, nhead, dim_ff, adaptive,
                       final_norm: bool):
    lrngs = jax.random.split(rng, num_layers + 1)
    layers = jax.vmap(
        partial(init_decoder_layer, d=d, nhead=nhead, dim_ff=dim_ff,
                adaptive=adaptive)
    )(lrngs[:num_layers])
    p = {"layers": layers}
    if final_norm:
        p["final_norm"] = (
            init_ada_layer_norm(lrngs[-1], d) if adaptive
            else init_layer_norm(d)
        )
    return p


def encoder_stack_apply(
    p, x, bias, cond=None, *, nhead, norm_first=True, activation="relu",
    dropout_rate=0.0, rng=None, deterministic=True, dtype=None, remat=False,
    score_bf16=None, flash_spec=None,
):
    """Run the scanned layer stack; returns (B, T, D)."""
    num_layers = jax.tree_util.tree_leaves(p["layers"])[0].shape[0]

    def body(h, inp):
        lp, i = inp
        lrng = None if rng is None else jax.random.fold_in(rng, i)
        h = encoder_layer_apply(
            lp, h, bias, cond, nhead=nhead, norm_first=norm_first,
            activation=activation, dropout_rate=dropout_rate, rng=lrng,
            deterministic=deterministic, dtype=dtype,
            score_bf16=score_bf16, flash_spec=flash_spec,
        )
        return h, None

    body = _apply_remat(body, remat)
    x, _ = jax.lax.scan(body, x, (p["layers"], jnp.arange(num_layers)))
    if "final_norm" in p:
        x = apply_norm(p["final_norm"], x, cond)
    return x


def _apply_remat(body, remat):
    """Wrap a scan body per the remat policy: False/"none" saves all
    residuals, True/"full" recomputes everything, "dots" saves matmul
    outputs and recomputes element-wise ops
    (jax.checkpoint_policies.checkpoint_dots), "scores" saves everything
    EXCEPT the S x S attention score/prob matrices (named in _attend) —
    near-"none" speed in flash-attention's activation footprint, for
    shapes where "none" OOMs. Measured A/Bs in BASELINE.md
    (benchmarks/bench_train_stage.py)."""
    if remat in (False, "none"):
        return body
    if remat in (True, "full"):
        return jax.checkpoint(body)
    if remat == "dots":
        return jax.checkpoint(
            body, policy=jax.checkpoint_policies.checkpoint_dots)
    if remat == "scores":
        return jax.checkpoint(
            body,
            policy=jax.checkpoint_policies.save_anything_except_these_names(
                "attn_scores", "attn_probs"))
    raise ValueError(f"unknown remat policy {remat!r}")


def decoder_stack_apply(
    p, x, memory, self_bias, cross_bias, cond=None, *, nhead,
    norm_first=True, activation="relu", dropout_rate=0.0, rng=None,
    deterministic=True, dtype=None, remat=False, score_bf16=None,
):
    """Cross-attending decoder stack (VALL-F). memory: (B, S, D)."""
    num_layers = jax.tree_util.tree_leaves(p["layers"])[0].shape[0]

    def body(h, inp):
        lp, i = inp
        lrng = None if rng is None else jax.random.fold_in(rng, i)
        mk, mv = mha_self_kv(lp["cross_attn"], memory, nhead, dtype=dtype)
        h = decoder_layer_apply(
            lp, h, mk, mv, self_bias, cross_bias, cond, nhead=nhead,
            norm_first=norm_first, activation=activation,
            dropout_rate=dropout_rate, rng=lrng,
            deterministic=deterministic, dtype=dtype,
            score_bf16=score_bf16,
        )
        return h, None

    body = _apply_remat(body, remat)
    x, _ = jax.lax.scan(body, x, (p["layers"], jnp.arange(num_layers)))
    if "final_norm" in p:
        x = apply_norm(p["final_norm"], x, cond)
    return x


# ---------------------------------------------------------------------------
# KV-cache decode paths (AR inference)
# ---------------------------------------------------------------------------


def encoder_stack_prefill(
    p, x, bias, *, nhead, cache_len: int, norm_first=True, activation="relu",
    dtype=None,
):
    """Full forward over the prefix AND build the KV cache.

    Returns (hidden, cache) where cache = {"k": (L, B, H, Tmax, Dh),
    "v": ...} with the first ``T`` positions filled.
    """
    B, T, D = x.shape
    dh = D // nhead

    def body(h, lp):
        # recompute k, v (cheap relative to attention) and also return them
        in_w = lp["self_attn"]["in_w"] if dtype is None else (
            lp["self_attn"]["in_w"].astype(dtype))
        in_b = lp["self_attn"]["in_b"] if dtype is None else (
            lp["self_attn"]["in_b"].astype(dtype))
        hin = apply_norm(lp["norm1"], h, None) if norm_first else h
        qkv = hin @ in_w + in_b
        q, k, v = jnp.split(qkv, 3, axis=-1)
        qh, kh, vh = (_split_heads(t, nhead) for t in (q, k, v))
        attn = _attend(qh, kh, vh, bias)
        attn = _merge_heads(attn)
        out_w = lp["self_attn"]["out_w"] if dtype is None else (
            lp["self_attn"]["out_w"].astype(dtype))
        out_b = lp["self_attn"]["out_b"] if dtype is None else (
            lp["self_attn"]["out_b"].astype(dtype))
        sa_out = attn @ out_w + out_b
        if norm_first:
            h = h + sa_out
            h = h + _ffn(lp["ffn"], apply_norm(lp["norm2"], h, None),
                         activation, dropout_rate=0.0, rng=None,
                         deterministic=True, dtype=dtype)
        else:
            h = apply_norm(lp["norm1"], h + sa_out, None)
            h = apply_norm(lp["norm2"], h + _ffn(
                lp["ffn"], h, activation, dropout_rate=0.0, rng=None,
                deterministic=True, dtype=dtype), None)
        # pad cache to cache_len
        pad = cache_len - T
        kc = jnp.pad(kh, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vc = jnp.pad(vh, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return h, (kc, vc)

    h, (ks, vs) = jax.lax.scan(body, x, p["layers"])
    if "final_norm" in p:
        h = apply_norm(p["final_norm"], h, None)
    return h, {"k": ks, "v": vs}


def decoder_stack_prefill(
    p, x, memory, self_bias, cross_bias, *, nhead, cache_len: int,
    norm_first=True, activation="relu", dtype=None,
):
    """Cross-attending decoder prefill: run the prefix AND build caches.

    Returns (hidden, cache) with cache = {"k","v" (L,B,H,Tmax,Dh) self-attn,
    "mk","mv" (L,B,H,S,Dh) cross-attention memory projections}.
    """
    B, T, D = x.shape

    def body(h, lp):
        in_w = lp["self_attn"]["in_w"] if dtype is None else (
            lp["self_attn"]["in_w"].astype(dtype))
        in_b = lp["self_attn"]["in_b"] if dtype is None else (
            lp["self_attn"]["in_b"].astype(dtype))
        hin = apply_norm(lp["norm1"], h, None) if norm_first else h
        qkv = hin @ in_w + in_b
        q, k, v = jnp.split(qkv, 3, axis=-1)
        qh, kh, vh = (_split_heads(t, nhead) for t in (q, k, v))
        attn = _merge_heads(_attend(qh, kh, vh, self_bias))
        out_w = lp["self_attn"]["out_w"] if dtype is None else (
            lp["self_attn"]["out_w"].astype(dtype))
        out_b = lp["self_attn"]["out_b"] if dtype is None else (
            lp["self_attn"]["out_b"].astype(dtype))
        sa_out = attn @ out_w + out_b
        if norm_first:
            h = h + sa_out
        else:
            h = apply_norm(lp["norm1"], h + sa_out, None)
        mk, mv = mha_self_kv(lp["cross_attn"], memory, nhead, dtype=dtype)
        hin = apply_norm(lp["norm2"], h, None) if norm_first else h
        ca_out = mha_cross(lp["cross_attn"], hin, mk, mv, cross_bias, nhead,
                           dtype=dtype)
        if norm_first:
            h = h + ca_out
            h = h + _ffn(lp["ffn"], apply_norm(lp["norm3"], h, None),
                         activation, dropout_rate=0.0, rng=None,
                         deterministic=True, dtype=dtype)
        else:
            h = apply_norm(lp["norm2"], h + ca_out, None)
            h = apply_norm(lp["norm3"], h + _ffn(
                lp["ffn"], h, activation, dropout_rate=0.0, rng=None,
                deterministic=True, dtype=dtype), None)
        pad = cache_len - T
        kc = jnp.pad(kh, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vc = jnp.pad(vh, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return h, (kc, vc, mk, mv)

    h, (ks, vs, mks, mvs) = jax.lax.scan(body, x, p["layers"])
    if "final_norm" in p:
        h = apply_norm(p["final_norm"], h, None)
    return h, {"k": ks, "v": vs, "mk": mks, "mv": mvs}


def decoder_stack_decode_step(
    p, x, cache, pos, self_bias, cross_bias, *, nhead, norm_first=True,
    activation="relu", dtype=None,
):
    """One cross-attending decode step. x: (B,1,D); pos scalar or (B,).

    The self-attention caches are fori_loop CARRIES (aliasable in place);
    scan xs/ys would double-buffer and copy them every token (see
    encoder_stack_decode_step PERF NOTE).
    """
    L = jax.tree_util.tree_leaves(p["layers"])[0].shape[0]

    def body(i, carry):
        h, ck_all, cv_all = carry
        lp = jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False),
            p["layers"])
        mk = jax.lax.dynamic_index_in_dim(cache["mk"], i, 0, keepdims=False)
        mv = jax.lax.dynamic_index_in_dim(cache["mv"], i, 0, keepdims=False)
        hin = apply_norm(lp["norm1"], h, None) if norm_first else h
        sa_out, ck, cv = mha_decode_step(
            lp["self_attn"], hin, ck_all[i], cv_all[i], pos, self_bias,
            nhead, dtype=dtype)
        ck_all = jax.lax.dynamic_update_index_in_dim(ck_all, ck, i, 0)
        cv_all = jax.lax.dynamic_update_index_in_dim(cv_all, cv, i, 0)
        if norm_first:
            h = h + sa_out
        else:
            h = apply_norm(lp["norm1"], h + sa_out, None)
        hin = apply_norm(lp["norm2"], h, None) if norm_first else h
        ca_out = mha_cross(lp["cross_attn"], hin, mk, mv, cross_bias, nhead,
                           dtype=dtype)
        if norm_first:
            h = h + ca_out
            h = h + _ffn(lp["ffn"], apply_norm(lp["norm3"], h, None),
                         activation, dropout_rate=0.0, rng=None,
                         deterministic=True, dtype=dtype)
        else:
            h = apply_norm(lp["norm2"], h + ca_out, None)
            h = apply_norm(lp["norm3"], h + _ffn(
                lp["ffn"], h, activation, dropout_rate=0.0, rng=None,
                deterministic=True, dtype=dtype), None)
        return (h, ck_all, cv_all)

    h, ks, vs = jax.lax.fori_loop(0, L, body, (x, cache["k"], cache["v"]))
    if "final_norm" in p:
        h = apply_norm(p["final_norm"], h, None)
    return h, {"k": ks, "v": vs, "mk": cache["mk"], "mv": cache["mv"]}


def encoder_stack_decode_step_int8(
    p, x, cache, pos, bias, *, nhead, norm_first=True, activation="relu",
    dtype=None,
):
    """Like encoder_stack_decode_step but over an int8 KV cache with
    per-position scales (cache keys: k, v, k_scale, v_scale).

    Caches are fori_loop CARRIES (not scan ys): scan double-buffers its
    ys, copying every layer's whole cache each token — the same pathology
    the PERF NOTE in encoder_stack_decode_step documents; carries alias
    in place (writes go straight into the stacked arrays) so only the
    written row costs traffic."""
    L = jax.tree_util.tree_leaves(p["layers"])[0].shape[0]
    B = x.shape[0]
    bidx = jnp.arange(B)

    def body(i, carry):
        h, ck_all, cv_all, ksc_all, vsc_all = carry
        lp = jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False),
            p["layers"])
        hin = apply_norm(lp["norm1"], h, None) if norm_first else h

        ap = lp["self_attn"]
        in_w = ap["in_w"] if dtype is None else ap["in_w"].astype(dtype)
        in_b = ap["in_b"] if dtype is None else ap["in_b"].astype(dtype)
        qkv = hin @ in_w + in_b
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _split_heads(q, nhead)
        k = _split_heads(k, nhead)
        v = _split_heads(v, nhead)
        kq, ksc = quantize_kv(k)
        vq, vsc = quantize_kv(v)
        ck_all = ck_all.at[i, bidx, :, pos, :].set(kq[:, :, 0, :])
        cv_all = cv_all.at[i, bidx, :, pos, :].set(vq[:, :, 0, :])
        ksc_all = ksc_all.at[i, bidx, :, pos].set(ksc[:, :, 0])
        vsc_all = vsc_all.at[i, bidx, :, pos].set(vsc[:, :, 0])
        dt = q.dtype
        kf = ck_all[i].astype(dt) * ksc_all[i][..., None].astype(dt)
        vf = cv_all[i].astype(dt) * vsc_all[i][..., None].astype(dt)
        out = _merge_heads(_attend(q, kf, vf, bias))
        out_w = ap["out_w"] if dtype is None else ap["out_w"].astype(dtype)
        out_b = ap["out_b"] if dtype is None else ap["out_b"].astype(dtype)
        sa_out = out @ out_w + out_b
        if norm_first:
            h = h + sa_out
            h = h + _ffn(lp["ffn"], apply_norm(lp["norm2"], h, None),
                         activation, dropout_rate=0.0, rng=None,
                         deterministic=True, dtype=dtype)
        else:
            h = apply_norm(lp["norm1"], h + sa_out, None)
            h = apply_norm(lp["norm2"], h + _ffn(
                lp["ffn"], h, activation, dropout_rate=0.0, rng=None,
                deterministic=True, dtype=dtype), None)
        return (h, ck_all, cv_all, ksc_all, vsc_all)

    h, ks, vs, kscs, vscs = jax.lax.fori_loop(
        0, L, body, (x, cache["k"], cache["v"], cache["k_scale"],
                     cache["v_scale"]))
    if "final_norm" in p:
        h = apply_norm(p["final_norm"], h, None)
    return h, {"k": ks, "v": vs, "k_scale": kscs, "v_scale": vscs}


def encoder_stack_decode_step(
    p, x, cache, pos, bias, *, nhead, norm_first=True, activation="relu",
    dtype=None, kernel_ctx=None, unroll=False, attn_len=None,
):
    """One decode step through all layers. x: (B, 1, D); pos: (B,) indices.

    bias: (B, 1, 1, Tmax) additive mask for valid keys (incl. pos itself).
    Returns (hidden (B, 1, D), new_cache).

    PERF NOTE: the (L, B, H, T, Dh) caches are loop CARRIES of a fori_loop,
    not scan xs/ys — scan double-buffers its ys, which copied the entire
    cache every token (measured ~4.4 of 7.4 ms/step at 12L/1024d/B32).
    Carries alias in place; only the one written token row costs traffic.
    ``unroll=True`` replaces the fori_loop with a static python loop so
    every layer's weight reads are static slices XLA can prefetch.

    kernel_ctx mode "int8_grouped" uses a COMBINED int8 KV cache with
    per-position scales (cache keys: kv (L,B,H,T,2Dh) int8 with K in lanes
    0:Dh and V in lanes Dh:2Dh, scale (L,B,2H,T) with K rows 0:H) for the
    fused-dequant Pallas kernel (ops/decode_attention_int8_grouped.py).
    The natural layout keeps the per-step write a cheap sublane DUS — the
    layouts that made the kernel's DMAs simplest made the writes XLA
    scatters costing more than the read savings.
    """
    L = jax.tree_util.tree_leaves(p["layers"])[0].shape[0]
    B = x.shape[0]
    bidx = jnp.arange(B)
    mode = kernel_ctx[4] if kernel_ctx is not None else None
    int8_mode = mode in ("int8_grouped", "fused_int8")
    # combined bf16/f32 KV cache + token-exact valid-block kernel
    # (ops/decode_attention_kv.py); same natural-layout sublane DUS write
    # as the int8 path, no quantization. "mega" additionally merges the
    # attention INTO the dense-tail kernel (2 pallas_calls per layer,
    # ops/fused_attn_tail.py).
    kv_mode = mode in ("bf16_grouped", "fused_kv")
    # lane-combined (B, T, H*2Dh) cache: contiguous-DMA kernel reads and
    # a one-row write (ops/decode_attention_lanes.py). "mega" merges the
    # attention INTO the dense-tail kernel on the same cache layout
    # (2 pallas_calls per layer, ops/fused_attn_tail.py).
    lanes_mode = mode in ("lanes_grouped", "fused_lanes", "mega")
    fused_mode = mode in ("fused", "fused_int8", "fused_w8", "fused_kv",
                          "mega", "fused_lanes")
    # int8-weight streaming: p["w8"] carries quantized stacked weights +
    # per-channel scales (see inference.quantize_decoder_weights)
    w8 = p.get("w8") if mode == "fused_w8" else None
    if fused_mode:
        assert norm_first, "fused decode kernels assume pre-norm layers"

    def body(i, carry):
        if int8_mode:
            h, ckv_all, sc_all = carry
            ck_all = cv_all = None
        elif kv_mode or lanes_mode:
            h, ckv_all = carry
            sc_all = ck_all = cv_all = None
        else:
            h, ck_all, cv_all = carry
        index = ((lambda a: a[i]) if isinstance(i, int) else
                 (lambda a: jax.lax.dynamic_index_in_dim(
                     a, i, 0, keepdims=False)))
        lp = jax.tree_util.tree_map(index, p["layers"])
        if fused_mode:
            from ..ops.fused_dense import fused_ln_qkv

            _, _, _, interp, _ = kernel_ctx
            qkv = fused_ln_qkv(
                h[:, 0, :],
                lp["norm1"]["scale"], lp["norm1"]["bias"],
                (w8["in_w"] if w8 is not None else
                 p["layers"]["self_attn"]["in_w"]),
                lp["self_attn"]["in_b"], i,
                w_scale=(index(w8["in_s"]) if w8 is not None else None),
                interpret=interp)[:, None, :]
        else:
            hin = apply_norm(lp["norm1"], h, None) if norm_first else h

            in_w = lp["self_attn"]["in_w"] if dtype is None else (
                lp["self_attn"]["in_w"].astype(dtype))
            in_b = lp["self_attn"]["in_b"] if dtype is None else (
                lp["self_attn"]["in_b"].astype(dtype))
            qkv = hin @ in_w + in_b
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _split_heads(q, nhead)
        k = _split_heads(k, nhead)
        v = _split_heads(v, nhead)

        if lanes_mode:
            from ..ops.decode_attention_lanes import (
                decode_attention_lanes,
                step_row_lanes,
            )

            row = step_row_lanes(k, v)                  # (B, 1, H*2Dh)
            ckv_all = ckv_all.at[i, bidx, pos, :].set(
                row[:, 0, :].astype(ckv_all.dtype))
            x_lens, write_pos, S, interp, _ = kernel_ctx
            if mode == "mega":
                # attention + out-proj + LN2 + FFN in ONE pallas_call
                from ..ops.fused_attn_tail import fused_attn_tail

                h = fused_attn_tail(
                    q, h[:, 0, :], ckv_all[i], x_lens, write_pos, i,
                    p["layers"]["self_attn"]["out_w"],
                    lp["self_attn"]["out_b"],
                    lp["norm2"]["scale"], lp["norm2"]["bias"],
                    p["layers"]["ffn"]["lin1"]["w"],
                    lp["ffn"]["lin1"]["b"],
                    p["layers"]["ffn"]["lin2"]["w"],
                    lp["ffn"]["lin2"]["b"],
                    S=S, activation=activation,
                    interpret=interp)[:, None, :]
                return (h, ckv_all)
            out = decode_attention_lanes(
                q, ckv_all[i], x_lens, write_pos, S=S, nhead=nhead,
                group=8, interpret=interp)
        elif kv_mode:
            kvc = jnp.concatenate([k, v], axis=-1)     # (B, H, 1, 2Dh)
            ckv_all = ckv_all.at[i, bidx, :, pos, :].set(
                kvc[:, :, 0, :].astype(ckv_all.dtype))
            x_lens, write_pos, S, interp, _ = kernel_ctx
            from ..ops.decode_attention_kv import decode_attention_kv

            # SLICED per-layer cache operand (the int8 kernel's proven
            # pattern): round-3 measured the stacked (L,...) form at
            # ~2.8 ms/LAYER on-chip — the full 805 MB stack appears to be
            # re-materialized per pallas_call — while the static leading
            # slice aliases cleanly (BASELINE.md round-3 notes)
            out = decode_attention_kv(
                q, ckv_all[i], x_lens, write_pos, S=S, group=8,
                interpret=interp)
        elif int8_mode:
            from ..ops.decode_attention_int8_grouped import (
                decode_attention_int8_grouped,
            )

            kq, ks = quantize_kv(k)
            vq, vs = quantize_kv(v)
            kvq = jnp.concatenate([kq, vq], axis=-1)   # (B, H, 1, 2Dh)
            sc = jnp.concatenate([ks, vs], axis=1)     # (B, 2H, 1)
            ckv_all = ckv_all.at[i, bidx, :, pos, :].set(kvq[:, :, 0, :])
            sc_all = sc_all.at[i, bidx, :, pos].set(sc[:, :, 0])
            x_lens, write_pos, S, interp, _ = kernel_ctx
            out = decode_attention_int8_grouped(
                q, ckv_all[i], sc_all[i],
                x_lens, write_pos, S=S, group=8, interpret=interp)
        elif kernel_ctx is not None and mode not in ("fused", "fused_w8"):
            # kernel cache layout (L, B, H, Dh, Tmax)
            ck_all = ck_all.at[i, bidx, :, :, pos].set(k[:, :, 0, :])
            cv_all = cv_all.at[i, bidx, :, :, pos].set(v[:, :, 0, :])
            x_lens, write_pos, S, interp, _ = kernel_ctx
            if mode == "grouped":
                from ..ops.decode_attention_grouped import (
                    decode_attention_grouped,
                )

                out = decode_attention_grouped(
                    q, ck_all[i], cv_all[i], x_lens, write_pos, S=S,
                    group=8, interpret=interp)
            else:
                from ..ops.decode_attention import decode_attention

                out = decode_attention(q, ck_all[i], cv_all[i], x_lens,
                                       write_pos, S=S, interpret=interp)
        else:
            if jnp.ndim(pos) == 0:
                # aligned prompts (scalar pos): one dynamic-update-slice
                # instead of a per-sample scatter — the serving fast path
                # valle_ar_decode's aligned_prompts documents
                ck_all = jax.lax.dynamic_update_slice(
                    ck_all, k[None, :, :, :, :].astype(ck_all.dtype),
                    (i, 0, 0, pos, 0))
                cv_all = jax.lax.dynamic_update_slice(
                    cv_all, v[None, :, :, :, :].astype(cv_all.dtype),
                    (i, 0, 0, pos, 0))
            else:
                ck_all = ck_all.at[i, bidx, :, pos, :].set(k[:, :, 0, :])
                cv_all = cv_all.at[i, bidx, :, pos, :].set(v[:, :, 0, :])
            # attn_len: static prefix of the cache to read (progressive
            # cache segments — bias is already built at this width)
            out = _attend(q, ck_all[i][:, :, :attn_len],
                          cv_all[i][:, :, :attn_len], bias)

        out = _merge_heads(out)
        if fused_mode:
            from ..ops.fused_dense import fused_tail

            if w8 is not None:
                ow, w1, w2 = w8["out_w"], w8["w1"], w8["w2"]
                wsc = (index(w8["out_s"]), index(w8["s1"]),
                       index(w8["s2"]))
            else:
                ow = p["layers"]["self_attn"]["out_w"]
                w1 = p["layers"]["ffn"]["lin1"]["w"]
                w2 = p["layers"]["ffn"]["lin2"]["w"]
                wsc = None
            h = fused_tail(
                out[:, 0, :], h[:, 0, :],
                ow, lp["self_attn"]["out_b"],
                lp["norm2"]["scale"], lp["norm2"]["bias"],
                w1, lp["ffn"]["lin1"]["b"],
                w2, lp["ffn"]["lin2"]["b"],
                i, activation=activation, w_scales=wsc,
                interpret=kernel_ctx[3])[:, None, :]
            if int8_mode:
                return (h, ckv_all, sc_all)
            if kv_mode or lanes_mode:
                return (h, ckv_all)
            return (h, ck_all, cv_all)
        out_w = lp["self_attn"]["out_w"] if dtype is None else (
            lp["self_attn"]["out_w"].astype(dtype))
        out_b = lp["self_attn"]["out_b"] if dtype is None else (
            lp["self_attn"]["out_b"].astype(dtype))
        sa_out = out @ out_w + out_b

        if norm_first:
            h = h + sa_out
            h = h + _ffn(lp["ffn"], apply_norm(lp["norm2"], h, None),
                         activation, dropout_rate=0.0, rng=None,
                         deterministic=True, dtype=dtype)
        else:
            h = apply_norm(lp["norm1"], h + sa_out, None)
            h = apply_norm(lp["norm2"], h + _ffn(
                lp["ffn"], h, activation, dropout_rate=0.0, rng=None,
                deterministic=True, dtype=dtype), None)
        if int8_mode:
            return (h, ckv_all, sc_all)
        if kv_mode or lanes_mode:
            return (h, ckv_all)
        return (h, ck_all, cv_all)

    if int8_mode:
        init = (x, cache["kv"], cache["scale"])
    elif kv_mode or lanes_mode:
        init = (x, cache["kv"])
    else:
        init = (x, cache["k"], cache["v"])
    if unroll:
        carry = init
        for li in range(L):
            carry = body(li, carry)
    else:
        carry = jax.lax.fori_loop(0, L, body, init)
    h = carry[0]
    if "final_norm" in p:
        h = apply_norm(p["final_norm"], h, None)
    if int8_mode:
        return h, {"kv": carry[1], "scale": carry[2]}
    if kv_mode or lanes_mode:
        return h, {"kv": carry[1]}
    return h, {"k": carry[1], "v": carry[2]}
