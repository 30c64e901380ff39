"""Zero-shot TTS inference for VALL-E: KV-cache AR decode + 7 NAR passes.

Capability parity with reference ``valle/models/valle.py:961-1238``
(``VALLE.inference`` and ``VALLE.continual``) with the same semantics:

- AR stop rule: argmax == EOS  OR  sampled == EOS  OR  generated length
  > 16 x text length (reference valle.py:1044-1048); the stop-triggering
  sample is discarded.
- NAR: 7 sequential argmax passes; acoustic-prompt embedding schedule
  differs between prefix_mode 0 and modes 1/2/4 exactly as in the
  reference (valle.py:1085-1134).
- modes 2/4 cut the enrolled phonemes out of the NAR text
  (valle.py:1068-1079).

TPU-first re-design:
- the AR loop is a jitted ``lax.while_loop`` over a static KV cache with
  on-device top-k/top-p sampling — O(T) per token instead of the
  reference's O(T^2) full-sequence recompute per token;
- decode is **batched** with per-sample prompt/text lengths and early-exit
  masks (the reference asserts batch size 1, valle.py:989);
- all shapes static: callers pad text to S, prompts to P, and pass
  ``max_gen_len``; outputs are (codes, gen_lens).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..modules import embedding as emb
from ..modules import prenet as pre
from ..modules import transformer as tfm
from ..ops import masks as M
from ..ops.sampling import top_k_top_p_filtering
from .valle import ValleConfig, _pe_table, nar_predict_weights


# ---------------------------------------------------------------------------
# AR decode (decoder-only VALLE path)
# ---------------------------------------------------------------------------


def _frontends(params, cfg, text, prompt_q0, dtype, state=None):
    """Embed text and audio prefix deterministically (inference).

    With ``cfg.add_prenet`` the text conv-prenet (using the trained
    BatchNorm running stats from ``state``) and the pointwise audio
    prenet apply before positional encoding, exactly as in training
    (reference applies both in its inference path too).
    """
    B, S = text.shape
    P = prompt_q0.shape[1]
    pe_d = _pe_table(cfg, cfg.d_model)

    x = emb.token_embedding(params["ar"]["text_emb"], text, dtype=dtype)
    if cfg.add_prenet:
        x, _ = pre.text_prenet(
            params["ar"]["text_prenet"],
            (state or {}).get("ar", {}).get("text_prenet"), x,
            training=False)
    x = emb.apply_sine_positional(params["ar"]["text_pe"], x, pe_d)

    if cfg.prepend_bos:
        prompt_q0 = jnp.pad(prompt_q0, ((0, 0), (1, 0)),
                            constant_values=cfg.bos_id)
    y = emb.token_embedding(params["ar"]["audio_emb"], prompt_q0, dtype=dtype)
    if cfg.add_prenet:
        y = pre.audio_prenet(params["ar"]["audio_prenet"], y,
                             training=False)
    y = emb.apply_sine_positional(params["ar"]["audio_pe"], y, pe_d)
    return x, y


def quantize_decoder_weights(dec_p):
    """Per-output-channel int8 quantization of a decoder stack's stacked
    dense weights (in/out projections + FFN) for weight-streaming decode
    (decode_kernel_mode="fused_w8"). Halves decode weight traffic and
    serving weight memory; per-channel scales keep quantization error
    ~0.4% relative. NOTE: on an untrained model the near-uniform logits
    make AR sequences diverge after any near-tie flip, so sequence-level
    agreement is seed-dependent there; validate on a trained checkpoint
    (whose logit margins dwarf the quantization noise) before enabling
    in production."""
    from ..ops.fused_dense import quantize_weights_per_channel as q

    in_q, in_s = q(dec_p["layers"]["self_attn"]["in_w"])
    out_q, out_s = q(dec_p["layers"]["self_attn"]["out_w"])
    w1_q, s1 = q(dec_p["layers"]["ffn"]["lin1"]["w"])
    w2_q, s2 = q(dec_p["layers"]["ffn"]["lin2"]["w"])
    return {"in_w": in_q, "in_s": in_s, "out_w": out_q, "out_s": out_s,
            "w1": w1_q, "s1": s1, "w2": w2_q, "s2": s2}


@partial(
    jax.jit,
    static_argnames=("cfg", "top_k", "max_gen_len", "compute_dtype",
                     "force_full_length", "aligned_prompts",
                     "use_decode_kernel", "kernel_interpret",
                     "kv_cache_int8", "decode_kernel_mode",
                     "unroll_layers", "cache_segment"),
)
def valle_ar_decode(
    params,
    cfg: ValleConfig,
    text: jnp.ndarray,          # (B, S) int32, padded
    text_lens: jnp.ndarray,     # (B,)
    prompt_q0: jnp.ndarray,     # (B, P) int32 quantizer-0 prompt codes
    prompt_lens: jnp.ndarray,   # (B,)
    rng: jax.Array,
    *,
    top_k: int = -100,
    temperature: float = 1.0,
    max_gen_len: int = 1024,
    compute_dtype=jnp.float32,
    force_full_length: bool = False,
    aligned_prompts: bool = False,
    use_decode_kernel: bool = False,
    kernel_interpret: bool = False,
    kv_cache_int8: bool = False,
    decode_kernel_mode: str = "grouped",
    unroll_layers: bool = False,
    cache_segment: int = 0,
    state=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched KV-cache AR decode of quantizer-0 codes.

    ``use_decode_kernel`` routes per-step attention through the Pallas
    decode kernel (reads only valid cache blocks; see
    ops/decode_attention.py). ``kv_cache_int8`` stores the cache int8 with
    per-position scales (halves decode HBM traffic; logits shift slightly
    so greedy tokens may differ at near-ties).

    Returns (gen_codes (B, max_gen_len) int32, gen_lens (B,) int32).
    ``force_full_length`` disables the stop conditions (benchmarking knob:
    every lane decodes exactly ``max_gen_len`` tokens).
    ``aligned_prompts`` asserts all samples share one prompt length: cache
    writes become slice updates instead of per-sample scatters (serving
    fast path).
    """
    assert cfg.model_name == "valle", "AR fast decode targets VALLE"
    B, S = text.shape
    P = prompt_q0.shape[1]
    bos = int(cfg.prepend_bos)
    dtype = compute_dtype
    eos = cfg.eos_id

    x_lens = text_lens.astype(jnp.int32)
    p_lens = prompt_lens.astype(jnp.int32) + bos   # audio prefix lens
    cache_len = S + bos + P + max_gen_len + 1
    if use_decode_kernel and decode_kernel_mode not in ("fused",
                                                        "fused_w8"):
        from ..ops.decode_attention import BLOCK_K

        # grouped modes need B % 8 == 0; resolve the effective mode here so
        # cache rounding and kernel dispatch agree
        if decode_kernel_mode in ("grouped", "int8_grouped", "bf16_grouped",
                                  "lanes_grouped") and B % 8 != 0:
            decode_kernel_mode = "per_sample"
        if decode_kernel_mode in ("fused_int8", "fused_kv", "mega",
                                  "fused_lanes") and B % 8 != 0:
            decode_kernel_mode = "fused"
        if decode_kernel_mode != "fused":
            if decode_kernel_mode in ("int8_grouped", "fused_int8"):
                # round the cache to the int8 kernel's budget-optimal
                # block (256 at flagship nhead=16) so _block_k never has
                # to shrink it to divide T — the long-cache win needs
                # bk=256 (BASELINE.md round-3); the extra rows are never
                # read (valid-block skipping)
                from ..ops.decode_attention_int8_grouped import (
                    preferred_block,
                )

                # cap at 256: the measured long-cache win is bk=256 at
                # flagship nhead=16; smaller-head models get a LARGER
                # budget block (preferred_block(4)=1024) and rounding the
                # allocation that far would balloon the int8 cache 4-8x
                # for short generations (the kernel may still use bigger
                # blocks when they happen to divide T)
                blk = min(preferred_block(cfg.nhead), 256)
            elif decode_kernel_mode in ("grouped", "bf16_grouped",
                                        "fused_kv", "mega",
                                        "lanes_grouped", "fused_lanes"):
                blk = 128
            else:
                blk = BLOCK_K
            cache_len = ((cache_len + blk - 1) // blk) * blk

    x, y = _frontends(params, cfg, text, prompt_q0, dtype, state)
    xy = jnp.concatenate([x, y], axis=1)           # (B, S0, D)
    S0 = S + bos + P

    # Prefill: composite mask (text block bidirectional, audio causal).
    bias = M.ar_xy_attn_bias(x_lens, p_lens, S, bos + P, dtype=jnp.float32)
    hidden, cache = tfm.encoder_stack_prefill(
        params["ar"]["decoder"], xy, bias, nhead=cfg.nhead,
        cache_len=cache_len, norm_first=cfg.norm_first,
        activation=cfg.activation, dtype=dtype)
    if use_decode_kernel and decode_kernel_mode in ("int8_grouped",
                                                    "fused_int8"):
        # combined (L,B,H,T,2Dh) int8 KV + stacked scales (L,B,2H,T),
        # natural layout: cheap sublane writes + aligned int8 kernel DMAs
        # (see ops/decode_attention_int8_grouped.py)
        from ..ops.decode_attention_int8_grouped import (
            combine_kv_int8,
            stack_scales,
        )

        kq, ksc = tfm.quantize_kv(cache["k"])
        vq, vsc = tfm.quantize_kv(cache["v"])
        cache = {"kv": combine_kv_int8(kq, vq),
                 "scale": stack_scales(ksc, vsc)}
    elif use_decode_kernel and decode_kernel_mode in ("bf16_grouped",
                                                      "fused_kv"):
        # combined (L,B,H,T,2Dh) KV in the compute dtype, natural layout:
        # cheap sublane writes + the token-exact valid-block kernel
        # (see ops/decode_attention_kv.py)
        from ..ops.decode_attention_kv import combine_kv

        cache = {"kv": combine_kv(cache["k"], cache["v"])}
    elif use_decode_kernel and decode_kernel_mode in ("lanes_grouped",
                                                      "fused_lanes",
                                                      "mega"):
        # lane-combined (L,B,T,H*2Dh) rows: contiguous kernel DMAs + a
        # one-row write (see ops/decode_attention_lanes.py)
        from ..ops.decode_attention_lanes import combine_kv_lanes

        cache = {"kv": combine_kv_lanes(cache["k"], cache["v"])}
    elif use_decode_kernel and decode_kernel_mode in ("fused", "fused_w8"):
        pass  # fused dense kernels keep the natural (L,B,H,T,Dh) cache
    elif use_decode_kernel:
        # kernel cache layout: (L, B, H, Dh, Tmax) — one-time transpose
        cache = {"k": jnp.swapaxes(cache["k"], -2, -1),
                 "v": jnp.swapaxes(cache["v"], -2, -1)}
    elif kv_cache_int8:
        kq, ksc = tfm.quantize_kv(cache["k"])
        vq, vsc = tfm.quantize_kv(cache["v"])
        cache = {"k": kq, "v": vq, "k_scale": ksc, "v_scale": vsc}

    decoder_p = params["ar"]["decoder"]
    if use_decode_kernel and decode_kernel_mode == "fused_w8":
        # one-time per call; XLA hoists it out of the decode while_loop
        decoder_p = {**decoder_p,
                     "w8": quantize_decoder_weights(decoder_p)}

    W = params["ar"]["predict"]["w"].astype(dtype)  # (D, V+1)
    bidx = jnp.arange(B)
    last_pos = S + p_lens - 1                        # (B,)
    logits0 = (hidden[bidx, last_pos] @ W).astype(jnp.float32)

    pe_d = _pe_table(cfg, cfg.d_model)
    audio_emb_w = params["ar"]["audio_emb"]["weight"]

    def sample(rng_s, logits):
        lg = logits / temperature
        lg = top_k_top_p_filtering(lg, top_k=top_k, top_p=1.0)
        return jax.random.categorical(rng_s, lg, axis=-1)  # (B,)

    def make_cond(g_end):
        def cond_fn(carry):
            g, done = carry[0], carry[4]
            return jnp.logical_and(g < g_end, ~jnp.all(done))
        return cond_fn

    def body_fn(carry, attn_len=cache_len):
        g, rng_c, cache_c, logits, done, gen_codes, gen_lens = carry
        rng_c, rng_s = jax.random.split(rng_c)
        samples = sample(rng_s, logits)
        argmaxes = jnp.argmax(logits, axis=-1)
        # reference valle.py:1047 compares y.len - prompts.len, which
        # INCLUDES the prepended BOS token — the cap fires one step
        # earlier under prepend_bos
        over = (g + bos) > x_lens * 16
        stop = (argmaxes == eos) | (samples == eos) | over
        if force_full_length:
            stop = jnp.zeros_like(stop)
        newly_done = stop & ~done
        gen_lens = jnp.where(newly_done, g, gen_lens)
        done = done | stop

        tok = jnp.where(done, eos, samples).astype(jnp.int32)
        gen_codes = gen_codes.at[bidx, g].set(
            jnp.where(done, 0, tok))

        # embed the accepted token at audio position p_lens + g
        e = jnp.take(audio_emb_w, tok, axis=0).astype(dtype)
        if cfg.add_prenet:  # pointwise MLP: valid per decode step
            e = pre.audio_prenet(params["ar"]["audio_prenet"], e,
                                 training=False)
        if aligned_prompts:
            pe = jax.lax.dynamic_slice_in_dim(
                pe_d, p_lens[0] + g, 1, axis=0).astype(dtype)[0]
            pe = jnp.broadcast_to(pe, e.shape)
            write_pos = S + p_lens[0] + g           # scalar
        else:
            audio_pos = p_lens + g                  # (B,)
            pe = jnp.take(pe_d, audio_pos, axis=0).astype(dtype)
            write_pos = S + p_lens + g              # (B,)
        xstep = (e + pe)[:, None, :]                # (B, 1, D)

        kk = jnp.arange(attn_len)[None, :]
        wp = write_pos if not aligned_prompts else jnp.broadcast_to(
            write_pos, (B,))
        key_valid = (kk < x_lens[:, None]) | (
            (kk >= S) & (kk <= wp[:, None]))
        step_bias = jnp.where(key_valid, 0.0, M.NEG_INF).astype(
            jnp.float32)[:, None, None, :]

        if kv_cache_int8 and not use_decode_kernel:
            hidden_s, cache_c = tfm.encoder_stack_decode_step_int8(
                params["ar"]["decoder"], xstep, cache_c, write_pos,
                step_bias, nhead=cfg.nhead, norm_first=cfg.norm_first,
                activation=cfg.activation, dtype=dtype)
        else:
            kctx = ((x_lens, wp, S, kernel_interpret, decode_kernel_mode)
                    if use_decode_kernel else None)
            hidden_s, cache_c = tfm.encoder_stack_decode_step(
                decoder_p, xstep, cache_c, write_pos,
                step_bias, nhead=cfg.nhead, norm_first=cfg.norm_first,
                activation=cfg.activation, dtype=dtype, kernel_ctx=kctx,
                unroll=unroll_layers, attn_len=attn_len)
        new_logits = (hidden_s[:, 0] @ W).astype(jnp.float32)
        return (g + 1, rng_c, cache_c, new_logits, done, gen_codes, gen_lens)

    init = (
        jnp.int32(0), rng, cache, logits0,
        jnp.zeros((B,), bool),
        jnp.zeros((B, max_gen_len), jnp.int32),
        jnp.full((B,), max_gen_len, jnp.int32),
    )
    # Progressive cache segments (cache_segment > 0): split the decode
    # while_loop into segments whose attention reads a STATIC cache
    # prefix, so the average read tracks the valid length — the int8
    # kernel's valid-block-skipping mechanism, expressed as XLA static
    # shapes; token-exact (tested). MEASURED A WASH at cache 890
    # (exact_seg 4.823 vs base 4.825 ms/step: XLA materializes the carry
    # slice, cancelling the saving) and HARMFUL with the fused kernels
    # (9.8 ms — 5 loop bodies x 120 pallas call instances). Kept as an
    # internal mechanism + measurement; NOT exposed through
    # valle_inference/serving. Use decode_mode='int8' for long caches.
    segmented = (cache_segment > 0
                 and decode_kernel_mode not in ("int8_grouped", "grouped",
                                                "per_sample", "fused_int8",
                                                "bf16_grouped", "fused_kv",
                                                "mega", "lanes_grouped",
                                                "fused_lanes")
                 and not kv_cache_int8)
    if segmented:
        bounds = []
        L = ((S0 + 1 + cache_segment - 1) // cache_segment) * cache_segment
        while L < cache_len:
            bounds.append(L)
            L += cache_segment
        bounds.append(cache_len)
    else:
        bounds = [cache_len]

    carry = init
    for L in bounds:
        g_end = min(max_gen_len, L - S0)
        carry = jax.lax.while_loop(
            make_cond(g_end), partial(body_fn, attn_len=L), carry)
    _, _, _, _, _, gen_codes, gen_lens = carry
    return gen_codes, gen_lens


# ---------------------------------------------------------------------------
# NAR passes
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg", "compute_dtype", "score_bf16",
                                   "attn_impl"))
def valle_nar_decode(
    params,
    cfg: ValleConfig,
    text: jnp.ndarray,            # (B, S) — already enrolled-trimmed if 2/4
    text_lens: jnp.ndarray,
    prompt_codes: jnp.ndarray,    # (B, P, Q) all-quantizer prompt codes
    prompt_lens: jnp.ndarray,
    gen_q0: jnp.ndarray,          # (B, G) AR output (quantizer 0)
    gen_lens: jnp.ndarray,
    *,
    compute_dtype=jnp.float32,
    state=None,
    score_bf16: bool = False,
    attn_impl: str = "einsum",
) -> jnp.ndarray:
    """7 sequential NAR argmax passes. Returns codes (B, G, Q).

    Sequence layout: [text(S); prompt(P); generated(G)] with masking for
    per-sample lengths; PE positions are contiguous per the reference
    (prompt at 0..p-1, generated at p..p+g-1).

    ``score_bf16=True`` stores each pass's (B, H, S, S) attention-score
    matrix in bfloat16 (only meaningful at bf16 compute; inert at fp32).
    The score matrix is the NAR forward's HBM bottleneck (BASELINE.md) —
    same policy as NAR-stage training. Argmax codes may flip at
    near-ties, so serving gates it like the other inexact decode modes
    (trained-weights agreement, tests/test_training_convergence.py).

    ``attn_impl="flash"`` routes each pass's attention through the fused
    Pallas kernel (ops/flash_mha.py): the padding mask is rebuilt in VMEM
    from key-validity codes and the (B, H, T, T) score matrix never
    reaches HBM (``score_bf16`` is then moot). Deterministic softmax math
    either way; valle only (the vallf decoder stack has cross-attention).
    """
    B, S = text.shape
    P = prompt_codes.shape[1]
    G = gen_q0.shape[1]
    Q = cfg.num_quantizers
    nd = cfg.nar_d_model
    dtype = compute_dtype

    x_lens = text_lens.astype(jnp.int32)
    p_lens = prompt_lens.astype(jnp.int32)
    g_lens = gen_lens.astype(jnp.int32)

    pe_n = _pe_table(cfg, nd)
    embs_w = params["nar"]["audio_embs"]["weight"]

    x = emb.token_embedding(params["nar"]["text_emb"], text, dtype=dtype)
    if cfg.add_prenet:
        x, _ = pre.text_prenet(
            params["nar"]["text_prenet"],
            (state or {}).get("nar", {}).get("text_prenet"), x,
            training=False)
    x = emb.apply_sine_positional(params["nar"]["text_pe"], x, pe_n)

    prompt_valid = jnp.arange(P)[None, :] < p_lens[:, None]
    gen_valid = jnp.arange(G)[None, :] < g_lens[:, None]
    pc = (prompt_codes.astype(jnp.int32) * prompt_valid[..., None])
    g0 = gen_q0.astype(jnp.int32) * gen_valid

    # base embedding: quantizer 0 over [prompt; generated]
    y_emb_p = jnp.take(embs_w[0], pc[..., 0], axis=0).astype(dtype)
    y_emb_g = jnp.take(embs_w[0], g0, axis=0).astype(dtype)

    if cfg.prefix_mode != 0:
        # all prompt quantizers summed up-front (reference valle.py:1110-1113)
        for j in range(1, Q):
            y_emb_p = y_emb_p + jnp.take(
                embs_w[j], pc[..., j], axis=0).astype(dtype)

    is_vallf = cfg.model_name == "vallf"
    fspec = None
    # attention bias: padding only
    if is_vallf:
        kk = jnp.arange(P + G)[None, :]
        key_valid = jnp.where(kk < P, kk < p_lens[:, None],
                              (kk - P) < g_lens[:, None])
        bias = jnp.where(key_valid, 0.0, M.NEG_INF).astype(jnp.float32)[
            :, None, None, :]
        cross_bias = M.key_padding_bias(x_lens, S)
    else:
        kk = jnp.arange(S + P + G)[None, :]
        key_valid = jnp.where(
            kk < S, kk < x_lens[:, None],
            jnp.where(kk < S + P, (kk - S) < p_lens[:, None],
                      (kk - S - P) < g_lens[:, None]))
        if attn_impl == "flash":
            qc, kc = M.flash_codes_key_valid(key_valid)
            fspec = {"qcode": qc, "kcode": kc}
            bias = None
        else:
            bias = jnp.where(key_valid, 0.0, M.NEG_INF).astype(jnp.float32)[
                :, None, None, :]
            fspec = None

    # PE positions: prompt 0..P-1 (static ok: invalid slots masked);
    # generated at p_lens + t (per-sample offset)
    pos_p = jnp.broadcast_to(jnp.arange(P)[None, :], (B, P))
    pos_g = p_lens[:, None] + jnp.arange(G)[None, :]
    pe_p = jnp.take(pe_n, pos_p, axis=0).astype(dtype)
    pe_g = jnp.take(pe_n, jnp.clip(pos_g, 0, cfg.max_len - 1),
                    axis=0).astype(dtype)

    W = nar_predict_weights(params, cfg)          # (Q-1, nd, V)
    stage_w = params["nar"]["stage_embs"]["weight"]

    def one_pass(i, carry):
        y_emb_p_c, y_emb_g_c, codes_out = carry
        cond = jnp.take(stage_w, i, axis=0)[None, :]
        py_p, py_g = y_emb_p_c, y_emb_g_c
        if cfg.add_prenet:
            # reference applies the NAR audio prenet to the accumulated
            # embedding every pass before positions (valle.py:1117-1121)
            py_p = pre.audio_prenet(params["nar"]["audio_prenet"], py_p,
                                    training=False)
            py_g = pre.audio_prenet(params["nar"]["audio_prenet"], py_g,
                                    training=False)
        if is_vallf:
            seq = jnp.concatenate([py_p + pe_p, py_g + pe_g],
                                  axis=1)
            dec = tfm.decoder_stack_apply(
                params["nar"]["decoder"], seq, x, bias, cross_bias, cond,
                nhead=cfg.nar_nhead, norm_first=cfg.norm_first,
                activation=cfg.activation, dropout_rate=0.0,
                deterministic=True, dtype=dtype, score_bf16=score_bf16)
        else:
            seq = jnp.concatenate(
                [x, py_p + pe_p, py_g + pe_g], axis=1)
            dec = tfm.encoder_stack_apply(
                params["nar"]["decoder"], seq, bias, cond,
                nhead=cfg.nar_nhead, norm_first=cfg.norm_first,
                activation=cfg.activation, dropout_rate=0.0,
                deterministic=True, dtype=dtype, score_bf16=score_bf16,
                flash_spec=fspec)
        Wi = jnp.take(W, i, axis=0).astype(dtype)  # (nd, V)
        logits = dec[:, -G:] @ Wi                  # (B, G, V)
        samples = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        codes_out = codes_out.at[:, :, i + 1].set(samples * gen_valid)

        emb_next = jnp.take(embs_w[i + 1], samples, axis=0).astype(dtype)
        upd_g = jnp.where(i < Q - 2,
                          jnp.where(gen_valid[..., None], emb_next, 0.0), 0.0)
        y_emb_g_c = y_emb_g_c + upd_g
        if cfg.prefix_mode == 0:
            # prompt quantizer i+1 added after pass i (reference 1104-1107)
            pidx = jnp.take_along_axis(
                pc, jnp.full((B, P, 1), i + 1, jnp.int32), axis=-1)[..., 0]
            emb_pn = jnp.take(embs_w[i + 1], pidx, axis=0).astype(dtype)
            upd_p = jnp.where(i < Q - 2,
                              jnp.where(prompt_valid[..., None], emb_pn, 0.0),
                              0.0)
            y_emb_p_c = y_emb_p_c + upd_p
        return (y_emb_p_c, y_emb_g_c, codes_out)

    codes_out = jnp.zeros((B, G, Q), jnp.int32)
    codes_out = codes_out.at[:, :, 0].set(g0)
    _, _, codes_out = jax.lax.fori_loop(
        0, Q - 1, one_pass, (y_emb_p, y_emb_g, codes_out))
    return codes_out


@partial(
    jax.jit,
    static_argnames=("cfg", "top_k", "max_gen_len", "compute_dtype",
                     "force_full_length"),
)
def vallf_ar_decode(
    params,
    cfg: ValleConfig,
    text: jnp.ndarray,
    text_lens: jnp.ndarray,
    prompt_q0: jnp.ndarray,
    prompt_lens: jnp.ndarray,
    rng: jax.Array,
    *,
    top_k: int = -100,
    temperature: float = 1.0,
    max_gen_len: int = 1024,
    compute_dtype=jnp.float32,
    force_full_length: bool = False,
    state=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """VALL-F KV-cache AR decode: causal self-attention over audio with
    cross-attention to the encoded text memory (reference VALLF.inference,
    valle.py:566-655 — which recomputes the full sequence per token)."""
    B, S = text.shape
    P = prompt_q0.shape[1]
    bos = int(cfg.prepend_bos)
    dtype = compute_dtype
    eos = cfg.eos_id

    x_lens = text_lens.astype(jnp.int32)
    p_lens = prompt_lens.astype(jnp.int32) + bos
    cache_len = bos + P + max_gen_len + 1

    x, y = _frontends(params, cfg, text, prompt_q0, dtype, state)
    cross_bias = M.key_padding_bias(x_lens, S)
    Ty = bos + P
    self_bias = (M.causal_bias(Ty) + M.key_padding_bias(p_lens, Ty))
    hidden, cache = tfm.decoder_stack_prefill(
        params["ar"]["decoder"], y, x, self_bias, cross_bias,
        nhead=cfg.nhead, cache_len=cache_len, norm_first=cfg.norm_first,
        activation=cfg.activation, dtype=dtype)

    W = params["ar"]["predict"]["w"].astype(dtype)
    bidx = jnp.arange(B)
    logits0 = (hidden[bidx, p_lens - 1] @ W).astype(jnp.float32)

    pe_d = _pe_table(cfg, cfg.d_model)
    audio_emb_w = params["ar"]["audio_emb"]["weight"]

    def sample(rng_s, logits):
        lg = logits / temperature
        lg = top_k_top_p_filtering(lg, top_k=top_k, top_p=1.0)
        return jax.random.categorical(rng_s, lg, axis=-1)

    def cond_fn(carry):
        g, done = carry[0], carry[4]
        return jnp.logical_and(g < max_gen_len, ~jnp.all(done))

    def body_fn(carry):
        g, rng_c, cache_c, logits, done, gen_codes, gen_lens = carry
        rng_c, rng_s = jax.random.split(rng_c)
        samples = sample(rng_s, logits)
        argmaxes = jnp.argmax(logits, axis=-1)
        # (g + bos): the reference cap counts the prepended BOS (see the
        # matching comment in the VALLE decode body)
        stop = (argmaxes == eos) | (samples == eos) | (
            (g + bos) > x_lens * 16)
        if force_full_length:
            stop = jnp.zeros_like(stop)
        newly_done = stop & ~done
        gen_lens = jnp.where(newly_done, g, gen_lens)
        done = done | stop
        tok = jnp.where(done, eos, samples).astype(jnp.int32)
        gen_codes = gen_codes.at[bidx, g].set(jnp.where(done, 0, tok))

        audio_pos = p_lens + g
        e = jnp.take(audio_emb_w, tok, axis=0).astype(dtype)
        if cfg.add_prenet:
            e = pre.audio_prenet(params["ar"]["audio_prenet"], e,
                                 training=False)
        pe = jnp.take(pe_d, audio_pos, axis=0).astype(dtype)
        xstep = (e + pe)[:, None, :]
        write_pos = p_lens + g
        kk = jnp.arange(cache_len)[None, :]
        step_bias = jnp.where(kk <= write_pos[:, None], 0.0,
                              M.NEG_INF).astype(jnp.float32)[
            :, None, None, :]
        hidden_s, cache_c = tfm.decoder_stack_decode_step(
            params["ar"]["decoder"], xstep, cache_c, write_pos, step_bias,
            cross_bias, nhead=cfg.nhead, norm_first=cfg.norm_first,
            activation=cfg.activation, dtype=dtype)
        new_logits = (hidden_s[:, 0] @ W).astype(jnp.float32)
        return (g + 1, rng_c, cache_c, new_logits, done, gen_codes,
                gen_lens)

    init = (jnp.int32(0), rng, cache, logits0, jnp.zeros((B,), bool),
            jnp.zeros((B, max_gen_len), jnp.int32),
            jnp.full((B,), max_gen_len, jnp.int32))
    _, _, _, _, _, gen_codes, gen_lens = jax.lax.while_loop(
        cond_fn, body_fn, init)
    return gen_codes, gen_lens


def trim_enrolled_text(text: jnp.ndarray, text_lens, enroll_x_lens):
    """Cut enrolled phonemes for NAR in prefix modes 2/4 (static shapes).

    Reference valle.py:1068-1079: text' = [text[:1], text[enroll_len-1:]]
    (keep BOS, drop the enrolled words, keep target text + EOS). Returns
    (text', new_lens) with the same padded width; extra tail is masked by
    the returned lengths.
    """
    B, S = text.shape
    e = enroll_x_lens.astype(jnp.int32)[:, None]       # (B, 1)
    i = jnp.arange(S)[None, :]
    src = jnp.where(i == 0, 0, jnp.clip(i + e - 2, 0, S - 1))
    out = jnp.take_along_axis(text, src, axis=1)
    new_lens = text_lens.astype(jnp.int32) - (e[:, 0] - 2)
    return out, new_lens


def resolve_auto_decode_mode(*, B: int, S: int, P: int,
                             max_gen_len: int) -> str:
    """Pick the fastest measured decode mode for a request shape.

    Measured envelope (BASELINE.md, same-session A/Bs on one v5e chip):

    * B <= 4: decode is weight-traffic bound, so the int8-weight-streaming
      fused kernels win at every measured generation length (round-4
      serving envelope, B/gen grid: B1 gen448 0.322 s vs fused 0.415,
      +29%; B4 gen448 0.627 vs 0.734, +17%; B1 gen192 +21%, B4 gen192
      +13%). The crossover is between B=4 and B=8 — at B=8 fused_w8
      trails fused by ~3% (weight reads amortize over the batch).
    * short KV caches at B >= 8: the bf16 fused weight-streaming kernels
      (cache 512: 3.05 vs int8 3.15 ms/step).
    * long caches at B % 8 == 0: the int8 combined-KV kernel, once the
      cache read dominates (cache ~738: int8 8,965 vs fused 6,506
      frames/s; cache 1024: 4.48 vs 4.85 ms/step).

    int8 and fused_w8 are not token-exact (near-tie flips; both are
    trained-weights-gated at >=98% agreement in
    tests/test_training_convergence.py); callers who need exact tokens
    should pass "exact"/"unroll"/"fused" explicitly.

    B here is usually the PADDED batch (serving snaps request counts to
    the 1/2/4/8/16/24... grid before decode), so single-device serving
    has no separate B in {5..7} regime: those coalesce to B=8, where
    fused vs fused_w8 is a measured noise-band tie (BASELINE.md round-4)
    and the token-exact fused wins the tiebreak. One caller CAN still
    land here with B in {5..7}: the DP shard_map path resolves on the
    PER-SHARD batch Bs = B/dp (e.g. B=24, dp=4 -> Bs=6), which simply
    falls through to 'fused' — the same pick as the padded-B=8 tie.
    """
    cache = S + P + max_gen_len + 2
    if B <= 4:
        return "fused_w8"
    if cache >= 640 and B % 8 == 0:
        return "int8"
    return "fused"


def valle_inference(
    params,
    cfg: ValleConfig,
    text: jnp.ndarray,
    text_lens: jnp.ndarray,
    prompt_codes: jnp.ndarray,     # (B, P, Q)
    prompt_lens: jnp.ndarray,
    enroll_x_lens: Optional[jnp.ndarray] = None,
    *,
    top_k: int = -100,
    temperature: float = 1.0,
    rng: Optional[jax.Array] = None,
    max_gen_len: int = 1024,
    compute_dtype=jnp.float32,
    decode_mode: str = "exact",
    state=None,
    nar_score_bf16: bool = False,
    nar_attn_impl: str = "einsum",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full zero-shot synthesis: AR decode then NAR refinement.

    ``decode_mode``: "exact" (reference-parity default), "unroll"
    (token-exact, statically unrolled layer loop), "fused" (token-exact,
    weight-streaming Pallas dense path — fastest at short caches),
    "fused_w8" (fused kernels streaming int8-quantized weights — halves
    weight traffic/memory; near-tie tokens may flip, see
    ``quantize_decoder_weights``; the weights are re-quantized on device
    once per call, ~0.4 ms, hoisted out of the decode loop), "int8" /
    "fused_int8" (combined-KV int8 cache + fused-dequant Pallas kernel —
    fastest at long caches, tokens may flip at near-ties; needs valle +
    B % 8 == 0, silently falls back otherwise), or "auto" (pick
    fused_w8/fused/int8 from the request shape via
    ``resolve_auto_decode_mode``).
    Fused modes fall back to "unroll" when the model dims are not
    128-aligned. At large batch (measured B=128) XLA's batched matmuls
    keep pace — fused holds parity there, int8 loses (BASELINE.md).

    ``nar_score_bf16``: store NAR-pass attention scores in bfloat16
    (see ``valle_nar_decode``; inert at fp32 compute).

    ``nar_attn_impl``: "einsum" | "flash" — NAR-pass attention
    implementation (see ``valle_nar_decode``; forced to einsum for
    vallf, whose decoder stack has cross-attention).

    Returns (codes (B, max_gen_len, Q), gen_lens (B,)).
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    ar_decode = (vallf_ar_decode if cfg.model_name == "vallf"
                 else valle_ar_decode)
    if decode_mode == "auto":
        decode_mode = resolve_auto_decode_mode(
            B=text.shape[0], S=text.shape[1], P=prompt_codes.shape[1],
            max_gen_len=max_gen_len)
    ar_kw = {}
    # Pallas kernels are Mosaic/TPU programs; on any other backend the
    # public decode modes run them in interpret mode so the API surface
    # behaves identically everywhere (tests/CI run on CPU).
    interp = jax.default_backend() != "tpu"
    if cfg.model_name != "vallf":
        if decode_mode == "unroll":
            ar_kw = {"unroll_layers": True}
        elif decode_mode == "int8" and text.shape[0] % 8 == 0:
            ar_kw = {"use_decode_kernel": True,
                     "decode_kernel_mode": "int8_grouped"}
        elif decode_mode == "bf16" and text.shape[0] % 8 == 0:
            # token-exact valid-block combined-KV kernel, XLA dense path
            ar_kw = {"use_decode_kernel": True,
                     "decode_kernel_mode": "bf16_grouped"}
        elif decode_mode == "lanes" and text.shape[0] % 8 == 0:
            # token-exact contiguous-DMA lane-row kernel, XLA dense path
            ar_kw = {"use_decode_kernel": True,
                     "decode_kernel_mode": "lanes_grouped"}
        elif decode_mode in ("fused", "fused_int8", "fused_w8",
                             "fused_kv", "mega", "fused_lanes"):
            # dense path (LN/QKV/out-proj/FFN) in weight-streaming Pallas
            # kernels; attention on the exact XLA path ("fused"/"fused_w8",
            # the latter with int8-quantized streamed weights) or the
            # int8 combined-KV kernel ("fused_int8", needs B % 8 == 0 —
            # falls back to "fused" otherwise). Layers unrolled: measured
            # faster than the fori_loop with the fused kernels
            # (BASELINE.md) and still token-exact for "fused".
            from ..ops.fused_dense import fused_dense_supported

            if fused_dense_supported(cfg.d_model, cfg.d_model * 4):
                ar_kw = {"use_decode_kernel": True,
                         "decode_kernel_mode": decode_mode,
                         "unroll_layers": True}
            else:  # odd model shapes: token-exact XLA fallback
                ar_kw = {"unroll_layers": True}
    if ar_kw.get("use_decode_kernel"):
        ar_kw["kernel_interpret"] = interp
    gen_q0, gen_lens = ar_decode(
        params, cfg, text, text_lens, prompt_codes[..., 0], prompt_lens,
        rng, top_k=top_k, temperature=temperature, max_gen_len=max_gen_len,
        compute_dtype=compute_dtype, state=state, **ar_kw)
    if cfg.num_quantizers == 1:
        return gen_q0[..., None], gen_lens

    nar_text, nar_text_lens = text, text_lens
    if cfg.prefix_mode in (2, 4) and enroll_x_lens is not None:
        nar_text, nar_text_lens = trim_enrolled_text(
            text, text_lens, enroll_x_lens)

    codes = valle_nar_decode(
        params, cfg, nar_text, nar_text_lens, prompt_codes, prompt_lens,
        gen_q0, gen_lens, compute_dtype=compute_dtype, state=state,
        score_bf16=nar_score_bf16,
        attn_impl=("einsum" if cfg.model_name == "vallf"
                   else nar_attn_impl))
    return codes, gen_lens


@partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def valle_continual(
    params,
    cfg: ValleConfig,
    text: jnp.ndarray,
    text_lens: jnp.ndarray,
    y: jnp.ndarray,               # (B, T, Q) full utterance codes
    y_lens: jnp.ndarray,
    *,
    compute_dtype=jnp.float32,
    state=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Codec-resynthesis diagnostic (reference valle.py:1139-1238).

    Keeps quantizer-0 of the second half and regenerates quantizers 1..7.
    prefix = min(T/2, 225). Returns (codes (B, T, Q), out_lens): like the
    reference's ``y[prefix:]``, row t of ``codes`` is utterance frame
    prefix+t (the output starts at row 0; static T, so rows past
    out_lens = y_lens - prefix are masked zeros).
    """
    B, T, Q = y.shape
    y = y.astype(jnp.int32)
    y_lens = y_lens.astype(jnp.int32)
    prefix_len = jnp.minimum((jnp.min(y_lens) * 0.5).astype(jnp.int32),
                             3 * 75)
    pos = jnp.arange(T)[None, :]
    in_prompt = pos < prefix_len                  # (1, T) -> broadcast
    valid = pos < y_lens[:, None]

    # layout: single contiguous y region; prompt is the first prefix frames
    prompt_codes = jnp.where(in_prompt[..., None], y, 0)

    # Reuse the NAR machinery with a mask-based single-region layout:
    # treat prompt region as "prompt" slots and the rest as "generated".
    # Build per-sample shifted views: generated tokens start at prefix.
    idx = jnp.clip(pos + prefix_len, 0, T - 1)
    gen_q0_shift = jnp.take_along_axis(y[..., 0] * valid, idx, axis=1)
    gen_lens = y_lens - prefix_len
    codes = valle_nar_decode(
        params, cfg, text, text_lens,
        prompt_codes[:, : cfg.max_prefix_len],
        jnp.broadcast_to(prefix_len, (B,)),
        gen_q0_shift, gen_lens, compute_dtype=compute_dtype, state=state)
    return codes, gen_lens
