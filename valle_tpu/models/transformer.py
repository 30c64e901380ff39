"""Seq2seq Transformer TTS on mel spectrograms (the reference's debug model).

Capability parity with reference ``valle/models/transformer.py`` (:41-394,
arXiv:1809.08895): text encoder + AR mel decoder with cross-attention,
MSE loss + stop-token BCE weighted x100, optional prenets, and the
``--scaling-xformers`` variant (:114-171) that rewires every projection as
ScaledLinear, the activation as BalancedDoubleSwish, and the norms as
IdentityNorm/BalancedBasicNorm.

TPU-first: stacked layers under ``lax.scan``; inference runs a KV-cache
``lax.while_loop`` (the reference recomputes the full sequence per frame,
transformer.py:352-383).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..modules import embedding as emb
from ..modules import prenet as pre
from ..modules import scaling as sc
from ..modules import transformer as tfm
from ..ops import masks as M
from .macros import NUM_MEL_BINS, NUM_TEXT_TOKENS


@dataclass(frozen=True)
class TransformerTtsConfig:
    d_model: int = 1024
    nhead: int = 16
    num_layers: int = 12
    norm_first: bool = True
    add_prenet: bool = False
    scaling_xformers: bool = False
    num_mel_bins: int = NUM_MEL_BINS
    num_text_tokens: int = NUM_TEXT_TOKENS
    dropout: float = 0.1
    max_len: int = 4096


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _init_mha_scaled(rng, d, nhead):
    """MHA with ScaledLinear(0.01) out-projection (reference
    models/transformer.py:123-126)."""
    p = tfm.init_mha(rng, d, nhead)
    k = jax.random.fold_in(rng, 7)
    out = sc.init_scaled_linear(k, d, d, initial_scale=0.01)
    p["out_w"] = out["w"]
    p["out_b"] = out["b"]
    return p


def _init_layer(rng, cfg, *, decoder: bool):
    ks = jax.random.split(rng, 8)
    d, f = cfg.d_model, cfg.d_model * 4
    if cfg.scaling_xformers:
        p = {
            "self_attn": _init_mha_scaled(ks[0], d, cfg.nhead),
            "ffn": {
                "lin1": sc.init_scaled_linear(ks[1], d, f),
                "lin2": sc.init_scaled_linear(ks[2], f, d,
                                              initial_scale=0.01),
            },
            # encoder: norm1 Identity, norm2 BalancedBasicNorm;
            # decoder: norm1/norm2 Identity, norm3 BalancedBasicNorm
            "norm1": {},
        }
        if decoder:
            p["cross_attn"] = _init_mha_scaled(ks[3], d, cfg.nhead)
            p["norm2"] = {}
            p["norm3"] = sc.init_balanced_basic_norm()
        else:
            p["norm2"] = sc.init_balanced_basic_norm()
    else:
        p = {
            "self_attn": tfm.init_mha(ks[0], d, cfg.nhead),
            "ffn": {
                "lin1": tfm.init_linear(ks[1], d, f),
                "lin2": tfm.init_linear(ks[2], f, d),
            },
            "norm1": tfm.init_layer_norm(d),
            "norm2": tfm.init_layer_norm(d),
        }
        if decoder:
            p["cross_attn"] = tfm.init_mha(ks[3], d, cfg.nhead)
            p["norm3"] = tfm.init_layer_norm(d)
    return p


def init_transformer_tts(rng, cfg: TransformerTtsConfig):
    ks = jax.random.split(rng, 12)
    d = cfg.d_model
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}

    params["text_emb"] = emb.init_token_embedding(
        ks[0], cfg.num_text_tokens, d)
    if cfg.add_prenet:
        assert not cfg.scaling_xformers  # reference transformer.py:97
        tp, ts = pre.init_text_prenet(ks[1], d)
        params["encoder_prenet"] = tp
        state["encoder_prenet"] = ts
        k = jax.random.split(ks[2], 3)
        params["decoder_prenet"] = {
            "lin0": tfm.init_linear(k[0], cfg.num_mel_bins, 256),
            "lin1": tfm.init_linear(k[1], 256, 256),
            "lin2": tfm.init_linear(k[2], 256, d),
        }
    else:
        init_lin = (sc.init_scaled_linear if cfg.scaling_xformers
                    else tfm.init_linear)
        params["decoder_prenet"] = init_lin(ks[2], cfg.num_mel_bins, d)

    # reference SinePositionalEmbedding(..., scale=False): alpha is fixed
    # at 1.0 and NOT trainable (transformer.py:108-111); a trainable alpha
    # here would also desync from the KV-cache decode path
    params["encoder_pe"] = emb.init_sine_positional(alpha_trainable=False)
    params["decoder_pe"] = emb.init_sine_positional(alpha_trainable=False)

    enc_layers = [
        _init_layer(k, cfg, decoder=False)
        for k in jax.random.split(ks[3], cfg.num_layers)]
    dec_layers = [
        _init_layer(k, cfg, decoder=True)
        for k in jax.random.split(ks[4], cfg.num_layers)]
    stack = lambda ls: jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *ls)
    params["encoder"] = {"layers": stack(enc_layers)}
    params["decoder"] = {"layers": stack(dec_layers)}
    if cfg.norm_first:
        fn = (sc.init_balanced_basic_norm() if cfg.scaling_xformers
              else tfm.init_layer_norm(d))
        params["encoder"]["final_norm"] = fn
        params["decoder"]["final_norm"] = (
            sc.init_balanced_basic_norm() if cfg.scaling_xformers
            else tfm.init_layer_norm(d))

    init_lin = (sc.init_scaled_linear if cfg.scaling_xformers
                else tfm.init_linear)
    params["predict"] = init_lin(ks[5], d, cfg.num_mel_bins)
    params["stop"] = tfm.init_linear(ks[6], d, 1)
    return params, state


# ---------------------------------------------------------------------------
# Layer application (handles both norm/activation variants)
# ---------------------------------------------------------------------------


def _apply_norm(p, x, *, rng=None, training=False):
    if not p:  # IdentityNorm
        return x
    if "log_eps" in p.get("norm", {}):
        return sc.balanced_basic_norm(p, x, rng=rng, training=training)
    return tfm.layer_norm(p, x)


def _activation(cfg, x, rng=None, training=False):
    if cfg.scaling_xformers:
        return sc.balanced_double_swish(
            x, rng, channel_dim=-1, max_abs=10.0, min_prob=0.25,
            training=training)
    return jax.nn.relu(x)


def _layer_apply(cfg, p, x, bias, mem=None, cross_bias=None, *, rng=None,
                 training=False, dtype=None):
    rs = (jax.random.split(rng, 10) if rng is not None else [None] * 10)
    drop = cfg.dropout if training else 0.0
    deterministic = not training

    h = _apply_norm(p["norm1"], x, rng=rs[0], training=training) \
        if cfg.norm_first else x
    sa = tfm.mha_self(p["self_attn"], h, bias, cfg.nhead,
                      dropout_rate=drop, rng=rs[1],
                      deterministic=deterministic, dtype=dtype)
    sa = emb.dropout(sa, drop, rs[2], deterministic)
    x = x + sa if cfg.norm_first else _apply_norm(
        p["norm1"], x + sa, rng=rs[0], training=training)

    if mem is not None:
        h = _apply_norm(p["norm2"], x, rng=rs[3], training=training) \
            if cfg.norm_first else x
        mk, mv = tfm.mha_self_kv(p["cross_attn"], mem, cfg.nhead, dtype=dtype)
        ca = tfm.mha_cross(p["cross_attn"], h, mk, mv, cross_bias, cfg.nhead,
                           dropout_rate=drop, rng=rs[4],
                           deterministic=deterministic, dtype=dtype)
        ca = emb.dropout(ca, drop, rs[5], deterministic)
        x = x + ca if cfg.norm_first else _apply_norm(
            p["norm2"], x + ca, rng=rs[3], training=training)
        ffn_norm = p["norm3"]
    else:
        ffn_norm = p["norm2"]

    h = _apply_norm(ffn_norm, x, rng=rs[6], training=training) \
        if cfg.norm_first else x
    h = tfm.linear(p["ffn"]["lin1"], h, dtype)
    h = _activation(cfg, h, rs[7], training)
    h = emb.dropout(h, drop, rs[8], deterministic)
    h = tfm.linear(p["ffn"]["lin2"], h, dtype)
    # reference applies a residual dropout after lin2 (dropout2/dropout3,
    # reference transformer.py:332-334)
    h = emb.dropout(h, drop, rs[9], deterministic)
    x = x + h if cfg.norm_first else _apply_norm(
        ffn_norm, x + h, rng=rs[6], training=training)
    return x


def _stack_apply(cfg, stack_p, x, bias, mem=None, cross_bias=None, *,
                 rng=None, training=False, dtype=None):
    L = jax.tree_util.tree_leaves(stack_p["layers"])[0].shape[0]

    def body(h, inp):
        lp, i = inp
        lrng = None if rng is None else jax.random.fold_in(rng, i)
        return _layer_apply(cfg, lp, h, bias, mem, cross_bias, rng=lrng,
                            training=training, dtype=dtype), None

    x, _ = jax.lax.scan(body, x, (stack_p["layers"], jnp.arange(L)))
    if "final_norm" in stack_p:
        fr = None if rng is None else jax.random.fold_in(rng, 999)
        x = _apply_norm(stack_p["final_norm"], x, rng=fr, training=training)
    return x


def _decoder_prenet(params, cfg, y, *, rng, training):
    p = params["decoder_prenet"]
    if cfg.add_prenet:
        for i in range(2):
            y = jax.nn.relu(tfm.linear(p[f"lin{i}"], y))
            r = None if rng is None else jax.random.fold_in(rng, i)
            y = emb.dropout(y, 0.5, r, not training or rng is None)
        return tfm.linear(p["lin2"], y)
    return tfm.linear(p, y)


# ---------------------------------------------------------------------------
# Forward / loss
# ---------------------------------------------------------------------------


def transformer_tts_forward(
    params, cfg: TransformerTtsConfig, batch, *, train_stage: int = 0,
    rng=None, deterministic: bool = False, compute_dtype=jnp.float32,
    state=None, **kw,
):
    """MSE(sum) + 100 x weighted stop BCE (reference transformer.py:222-318).

    batch: text (B,S), text_lens, audio (B,T,num_mel_bins) float features,
    audio_lens. Returns (loss, metrics, new_state).
    """
    del train_stage
    state = state or {}
    new_state = dict(state)
    training = not deterministic
    rs = jax.random.split(rng, 6) if rng is not None else [None] * 6

    text = batch["text"]
    x_lens = batch["text_lens"].astype(jnp.int32)
    y = batch["audio"].astype(jnp.float32)
    y_lens = batch["audio_lens"].astype(jnp.int32)
    B, S = text.shape
    T = y.shape[1]
    pe = emb.sine_positional_table(cfg.max_len, cfg.d_model)

    x = emb.token_embedding(params["text_emb"], text, dtype=compute_dtype)
    if cfg.add_prenet:
        x, new_state["encoder_prenet"] = pre.text_prenet(
            params["encoder_prenet"], state["encoder_prenet"], x,
            training=training, rng=rs[0])
    x = emb.apply_sine_positional(params["encoder_pe"], x, pe,
                                  dropout_rate=0.1, rng=rs[1],
                                  deterministic=deterministic)
    enc_bias = M.key_padding_bias(x_lens, S)
    x = _stack_apply(cfg, params["encoder"], x, enc_bias, rng=rs[2],
                     training=training, dtype=compute_dtype)

    y_mask = jnp.arange(T)[None, :] >= y_lens[:, None]
    y_mask_f = y_mask.astype(jnp.float32)
    data_mask = 1.0 - y_mask_f[..., None]
    y_clean = y * data_mask
    # shift right with a zero frame (reference transformer.py:274-279)
    y_in = jnp.pad(y_clean, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    targets = y_clean

    y_emb = _decoder_prenet(params, cfg, y_in.astype(compute_dtype),
                            rng=rs[3], training=training)
    y_pos = emb.apply_sine_positional(params["decoder_pe"], y_emb, pe,
                                      dropout_rate=0.1, rng=rs[3],
                                      deterministic=deterministic)
    self_bias = M.causal_bias(T)
    cross_bias = M.key_padding_bias(x_lens, S)
    y_dec = _stack_apply(cfg, params["decoder"], y_pos, self_bias, mem=x,
                         cross_bias=cross_bias, rng=rs[4], training=training,
                         dtype=compute_dtype)

    predict = tfm.linear(params["predict"], y_dec).astype(jnp.float32)
    mse = jnp.sum((predict - targets) ** 2)

    logits = tfm.linear(params["stop"], y_dec)[..., 0].astype(jnp.float32)
    weight = 1.0 + y_mask_f * 4.0
    stop_loss = jnp.sum(weight * (
        jnp.maximum(logits, 0) - logits * y_mask_f
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))))

    stop_pred = (jax.nn.sigmoid(logits) >= 0.5)
    stop_acc = jnp.mean((stop_pred == y_mask).astype(jnp.float32))

    metrics = {
        "stop_loss": stop_loss,
        "stop_accuracy": stop_acc,
        "frames": jnp.sum(y_lens).astype(jnp.float32),
    }
    if kw.get("collect_outputs"):
        # for --visualize: real encoder output + predicted mel (reference
        # returns these as `predicts`, transformer.py:292-296)
        metrics["encoder_out"] = x.astype(jnp.float32)
        metrics["predict"] = predict
    return mse + 100.0 * stop_loss, metrics, new_state


def transformer_visualize_outputs(params, cfg, batch, state=None):
    """(encoder output, predicted mel) for the trainer's --visualize."""
    _, m, _ = transformer_tts_forward(
        params, cfg, batch, deterministic=True, state=state,
        collect_outputs=True)
    return m["encoder_out"], m["predict"]


# ---------------------------------------------------------------------------
# Inference (KV-cache greedy frame loop)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg", "max_gen_len", "compute_dtype"))
def transformer_tts_inference(
    params, cfg: TransformerTtsConfig, text, text_lens, *,
    max_gen_len: int = 1024, compute_dtype=jnp.float32,
):
    """Greedy AR mel generation. Returns (mel (B, max_gen_len, M), lens).

    Stop rule: stop-logit > 0 on all lanes or length > 10 x text length
    (reference transformer.py:376-377).
    """
    B, S = text.shape
    Mb = cfg.num_mel_bins
    dtype = compute_dtype
    pe = emb.sine_positional_table(cfg.max_len, cfg.d_model)
    x_lens = text_lens.astype(jnp.int32)

    x = emb.token_embedding(params["text_emb"], text, dtype=dtype)
    x = emb.apply_sine_positional(params["encoder_pe"], x, pe)
    enc_bias = M.key_padding_bias(x_lens, S)
    memory = _stack_apply(cfg, params["encoder"], x, enc_bias, dtype=dtype)

    # cache cross-attention K/V once per layer
    def kv_body(_, lp):
        mk, mv = tfm.mha_self_kv(lp["cross_attn"], memory, cfg.nhead,
                                 dtype=dtype)
        return None, (mk, mv)

    _, (mem_k, mem_v) = jax.lax.scan(
        kv_body, None, params["decoder"]["layers"])
    cross_bias = M.key_padding_bias(x_lens, S)

    L = jax.tree_util.tree_leaves(params["decoder"]["layers"])[0].shape[0]
    dh = cfg.d_model // cfg.nhead
    cache_len = max_gen_len + 1
    cache_k = jnp.zeros((L, B, cfg.nhead, cache_len, dh), dtype)
    cache_v = jnp.zeros_like(cache_k)

    def decode_step(carry):
        t, frame, ck, cv, done, mel, lens = carry
        y_emb = _decoder_prenet(params, cfg, frame[:, None, :], rng=None,
                                training=False)
        pos = jnp.take(pe, t, axis=0).astype(dtype)
        h = y_emb + pos[None, None, :]

        kk = jnp.arange(cache_len)[None, :]
        step_bias = jnp.where(kk <= t, 0.0, M.NEG_INF).astype(jnp.float32)[
            :, None, None, :]

        # layer loop as fori_loop with the caches as aliasable CARRIES —
        # scan xs/ys double-buffer and copy the full (L, ...) cache every
        # frame (same fix as encoder_stack_decode_step, see its PERF NOTE)
        def body(i, carry):
            hh, ck_all, cv_all = carry
            lp = jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(a, i, 0,
                                                       keepdims=False),
                params["decoder"]["layers"])
            lmk = jax.lax.dynamic_index_in_dim(mem_k, i, 0, keepdims=False)
            lmv = jax.lax.dynamic_index_in_dim(mem_v, i, 0, keepdims=False)
            hin = _apply_norm(lp["norm1"], hh) if cfg.norm_first else hh
            sa, lck, lcv = tfm.mha_decode_step(
                lp["self_attn"], hin, ck_all[i], cv_all[i],
                jnp.full((B,), t, jnp.int32), step_bias, cfg.nhead,
                dtype=dtype)
            ck_all = jax.lax.dynamic_update_index_in_dim(ck_all, lck, i, 0)
            cv_all = jax.lax.dynamic_update_index_in_dim(cv_all, lcv, i, 0)
            hh = hh + sa if cfg.norm_first else _apply_norm(
                lp["norm1"], hh + sa)
            hin = _apply_norm(lp["norm2"], hh) if cfg.norm_first else hh
            ca = tfm.mha_cross(lp["cross_attn"], hin, lmk, lmv, cross_bias,
                               cfg.nhead, dtype=dtype)
            hh = hh + ca if cfg.norm_first else _apply_norm(
                lp["norm2"], hh + ca)
            hin = _apply_norm(lp["norm3"], hh) if cfg.norm_first else hh
            f = tfm.linear(lp["ffn"]["lin1"], hin, dtype)
            f = _activation(cfg, f)
            f = tfm.linear(lp["ffn"]["lin2"], f, dtype)
            hh = hh + f if cfg.norm_first else _apply_norm(
                lp["norm3"], hh + f)
            return (hh, ck_all, cv_all)

        h, ck, cv = jax.lax.fori_loop(0, L, body, (h, ck, cv))
        if "final_norm" in params["decoder"]:
            h = _apply_norm(params["decoder"]["final_norm"], h)

        nxt = tfm.linear(params["predict"], h)[:, 0].astype(jnp.float32)
        stop_logit = tfm.linear(params["stop"], h)[:, 0, 0]
        # per-sample stop (the previous jnp.all collapsed the mask to a
        # scalar, so no lane could ever finish before the others)
        stop = (stop_logit > 0) | (t > x_lens * 10)
        newly_done = stop & ~done
        lens = jnp.where(newly_done, t, lens)
        done = done | stop
        mel = mel.at[:, t].set(jnp.where(done[:, None], 0.0, nxt))
        return (t + 1, nxt, ck, cv, done, mel, lens)

    def cond(carry):
        t, _, _, _, done, _, _ = carry
        return (t < max_gen_len) & ~jnp.all(done)

    init = (jnp.int32(0), jnp.zeros((B, Mb), jnp.float32), cache_k, cache_v,
            jnp.zeros((B,), bool), jnp.zeros((B, max_gen_len), jnp.float32
                                             )[..., None].repeat(Mb, -1),
            jnp.full((B,), max_gen_len, jnp.int32))
    _, _, _, _, _, mel, lens = jax.lax.while_loop(cond, decode_step, init)
    return mel, lens


class TransformerTtsModel:
    def __init__(self, cfg: TransformerTtsConfig):
        self.cfg = cfg

    def init(self, rng):
        return init_transformer_tts(rng, self.cfg)

    def forward(self, params, batch, **kw):
        return transformer_tts_forward(params, self.cfg, batch, **kw)

    __call__ = forward

    def inference(self, params, text, text_lens, **kw):
        return transformer_tts_inference(params, self.cfg, text, text_lens,
                                         **kw)

    def config_dict(self):
        from dataclasses import asdict

        return asdict(self.cfg)
