"""Continuous-batching AR decode core: slot-recycling KV-cache decode.

Static batch decode (``valle_ar_decode``) holds every lane until the
LONGEST generation in the batch finishes — with realistic utterance-length
variance the average lane idles 30-50% of its steps. This module
decomposes the decode into three jitted pieces so a serving loop can
replace finished lanes with queued requests *without recompiling*:

- :func:`cb_prefill` — run b requests' prefixes and build their KV rows;
- :func:`cb_install` / :func:`cb_install_many` — write prefilled
  request(s) into batch slot(s) (donated, in-place buffer update);
  the serving loop batches every refill wave through `cb_install_many`
  so a wave costs 2 dispatches, not 2×n;
- :func:`cb_decode_chunk` — advance ALL slots up to K tokens (one host
  sync per chunk, not per token), with per-slot progress counters.

Everything stays static-shape: one compiled program each for prefill,
install, and chunk, reused for the lifetime of the server.

Correctness contract (tested in tests/test_continuous_batching.py):
the per-step math for ACTIVE lanes is lockstep-identical to
``valle_ar_decode`` — same stop rule (reference
``/root/reference/valle/models/valle.py:1044-1048``: argmax EOS OR
sampled EOS OR 16x text length), same masks, same rng chain — so a
fully-admitted batch with no refill reproduces the batch decoder's
tokens EXACTLY, and a recycled slot reproduces the single-request
decode EXACTLY (greedy). Finished lanes are frozen (progress counter
and logits held) instead of advancing like the batch path; that is
value-identical for every output and keeps a drained slot's cache
writes from walking past its window while it waits for a refill.

The decode step runs the exact XLA path (optionally with the unrolled
layer loop). The Pallas kernel modes are deliberately out of scope:
their combined-cache layouts would make `cb_install`'s per-slot write a
strided scatter, and the measured envelope (BASELINE.md round-3) says
XLA attention is the right default at serving cache lengths anyway.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..modules import prenet as pre
from ..modules import transformer as tfm
from ..ops import masks as M
from ..ops.sampling import top_k_top_p_filtering
from .inference import _frontends
from .valle import ValleConfig, _pe_table


def cb_state_init(cfg: ValleConfig, *, slots: int, cache_len: int,
                  max_gen_len: int, rng: jax.Array,
                  compute_dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """Fresh slot-table state. All slots start done (empty)."""
    L, H = cfg.num_layers, cfg.nhead
    dh = cfg.d_model // H
    return {
        "k": jnp.zeros((L, slots, H, cache_len, dh), compute_dtype),
        "v": jnp.zeros((L, slots, H, cache_len, dh), compute_dtype),
        "logits": jnp.zeros((slots, cfg.num_audio_tokens + 1), jnp.float32),
        "x_lens": jnp.zeros((slots,), jnp.int32),
        "p_lens": jnp.zeros((slots,), jnp.int32),   # includes BOS
        "g": jnp.zeros((slots,), jnp.int32),
        "done": jnp.ones((slots,), bool),
        "gen_codes": jnp.zeros((slots, max_gen_len), jnp.int32),
        "gen_lens": jnp.full((slots,), max_gen_len, jnp.int32),
        "rng": rng,
    }


@partial(jax.jit, static_argnames=("cfg", "cache_len", "compute_dtype"))
def cb_prefill(
    params,
    cfg: ValleConfig,
    text: jnp.ndarray,          # (b, S) int32, padded
    text_lens: jnp.ndarray,     # (b,)
    prompt_q0: jnp.ndarray,     # (b, P) quantizer-0 prompt codes
    prompt_lens: jnp.ndarray,   # (b,)
    *,
    cache_len: int,
    compute_dtype=jnp.float32,
    state=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Prefix forward for b (typically 1) requests.

    Returns (k (L,b,H,cache_len,Dh), v, logits0 (b,V)) — the request's
    KV rows and first-token logits, ready for :func:`cb_install`.
    """
    b, S = text.shape
    bos = int(cfg.prepend_bos)
    dtype = compute_dtype
    x_lens = text_lens.astype(jnp.int32)
    p_lens = prompt_lens.astype(jnp.int32) + bos
    P = prompt_q0.shape[1]

    x, y = _frontends(params, cfg, text, prompt_q0, dtype, state)
    xy = jnp.concatenate([x, y], axis=1)
    bias = M.ar_xy_attn_bias(x_lens, p_lens, S, bos + P, dtype=jnp.float32)
    hidden, cache = tfm.encoder_stack_prefill(
        params["ar"]["decoder"], xy, bias, nhead=cfg.nhead,
        cache_len=cache_len, norm_first=cfg.norm_first,
        activation=cfg.activation, dtype=dtype)
    W = params["ar"]["predict"]["w"].astype(dtype)
    last = hidden[jnp.arange(b), S + p_lens - 1]
    logits0 = (last @ W).astype(jnp.float32)
    return cache["k"], cache["v"], logits0


@partial(jax.jit, donate_argnums=(0,))
def cb_install(st, slot, k1, v1, logits0, x_len, p_len_with_bos):
    """Install one prefilled request into ``slot`` (traced index: one
    compiled program serves every slot). Donated: updates buffers in
    place."""
    slot = jnp.asarray(slot, jnp.int32)
    st = dict(st)
    st["k"] = jax.lax.dynamic_update_slice(
        st["k"], k1.astype(st["k"].dtype), (0, slot, 0, 0, 0))
    st["v"] = jax.lax.dynamic_update_slice(
        st["v"], v1.astype(st["v"].dtype), (0, slot, 0, 0, 0))
    st["logits"] = jax.lax.dynamic_update_slice(
        st["logits"], logits0.astype(jnp.float32), (slot, 0))
    st["x_lens"] = st["x_lens"].at[slot].set(jnp.asarray(x_len, jnp.int32))
    st["p_lens"] = st["p_lens"].at[slot].set(
        jnp.asarray(p_len_with_bos, jnp.int32))
    st["g"] = st["g"].at[slot].set(0)
    st["done"] = st["done"].at[slot].set(False)
    Gmax = st["gen_codes"].shape[1]
    st["gen_codes"] = jax.lax.dynamic_update_slice(
        st["gen_codes"], jnp.zeros((1, Gmax), jnp.int32), (slot, 0))
    st["gen_lens"] = st["gen_lens"].at[slot].set(Gmax)
    return st


@partial(jax.jit, donate_argnums=(0,))
def cb_install_many(st, slots, kb, vb, logits0, x_lens, p_lens_with_bos):
    """Install b prefilled requests into ``slots`` in ONE dispatch.

    Over the remote-execution tunnel every dispatch pays host round-trip
    latency, and the first continuous-batching A/B measured the
    per-request prefill+install chain at ~5 s of a 9.5 s serving run
    (BASELINE.md round-3) — so refills are batched: one `cb_prefill`
    at a fixed width plus one call here, instead of 2×n dispatches.

    Padding contract: the caller pads ``slots`` and every operand row to
    the fixed width b by REPEATING row 0 (slot index AND values).
    Duplicate scatter indices are unspecified-order in XLA, but
    duplicates carrying identical values are deterministic, and
    re-installing a freshly-prefilled request is idempotent.
    """
    st = dict(st)
    slots = slots.astype(jnp.int32)
    st["k"] = st["k"].at[:, slots].set(kb.astype(st["k"].dtype))
    st["v"] = st["v"].at[:, slots].set(vb.astype(st["v"].dtype))
    st["logits"] = st["logits"].at[slots].set(logits0.astype(jnp.float32))
    st["x_lens"] = st["x_lens"].at[slots].set(x_lens.astype(jnp.int32))
    st["p_lens"] = st["p_lens"].at[slots].set(
        p_lens_with_bos.astype(jnp.int32))
    st["g"] = st["g"].at[slots].set(jnp.zeros_like(slots))
    st["done"] = st["done"].at[slots].set(jnp.zeros(slots.shape, bool))
    Gmax = st["gen_codes"].shape[1]
    st["gen_codes"] = st["gen_codes"].at[slots].set(
        jnp.zeros((slots.shape[0], Gmax), jnp.int32))
    st["gen_lens"] = st["gen_lens"].at[slots].set(
        jnp.full(slots.shape, Gmax, jnp.int32))
    return st


@partial(jax.jit,
         static_argnames=("cfg", "S", "K", "top_k", "compute_dtype",
                          "unroll_layers"),
         donate_argnums=(1,))
def cb_decode_chunk(
    params,
    st: Dict[str, jnp.ndarray],
    temperature,
    *,
    cfg: ValleConfig,
    S: int,
    K: int,
    top_k: int = -100,
    compute_dtype=jnp.float32,
    unroll_layers: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Advance every live slot by up to K tokens (early-exits when all
    slots finish). One host sync per call amortizes the dispatch/transfer
    latency over K steps. ``S`` is the (static) padded text width shared
    by all requests."""
    dtype = compute_dtype
    eos = cfg.eos_id
    ck, cv = st["k"], st["v"]
    B, Tc = ck.shape[1], ck.shape[3]
    Gmax = st["gen_codes"].shape[1]
    W = params["ar"]["predict"]["w"].astype(dtype)
    pe_d = _pe_table(cfg, cfg.d_model)
    audio_emb_w = params["ar"]["audio_emb"]["weight"]
    bidx = jnp.arange(B)
    x_lens, p_lens = st["x_lens"], st["p_lens"]   # chunk-invariant

    def sample(rng_s, logits):
        lg = logits / temperature
        lg = top_k_top_p_filtering(lg, top_k=top_k, top_p=1.0)
        return jax.random.categorical(rng_s, lg, axis=-1)

    def cond_fn(carry):
        i, _, _, _, _, _, done, _, _ = carry
        return jnp.logical_and(i < K, ~jnp.all(done))

    def body_fn(carry):
        i, rng_c, logits, ck_c, cv_c, g, done, gen_codes, gen_lens = carry
        rng_c, rng_s = jax.random.split(rng_c)
        samples = sample(rng_s, logits)
        argmaxes = jnp.argmax(logits, axis=-1)
        # reference stop rule + per-lane budget (the batch path's loop
        # bound, expressed per slot); (g + bos): the reference cap counts
        # the prepended BOS (valle.py:1047 compares y.len - prompts.len)
        stop = ((argmaxes == eos) | (samples == eos)
                | ((g + int(cfg.prepend_bos)) > x_lens * 16) | (g >= Gmax))
        newly = stop & ~done
        gen_lens = jnp.where(newly, g, gen_lens)
        done = done | stop

        tok = jnp.where(done, eos, samples).astype(jnp.int32)
        gw = jnp.minimum(g, Gmax - 1)
        old = gen_codes[bidx, gw]
        gen_codes = gen_codes.at[bidx, gw].set(jnp.where(done, old, tok))

        e = jnp.take(audio_emb_w, tok, axis=0).astype(dtype)
        if cfg.add_prenet:
            e = pre.audio_prenet(params["ar"]["audio_prenet"], e,
                                 training=False)
        audio_pos = p_lens + g
        pe = jnp.take(pe_d, jnp.clip(audio_pos, 0, cfg.max_len - 1),
                      axis=0).astype(dtype)
        write_pos = S + audio_pos                     # (B,)
        kk = jnp.arange(Tc)[None, :]
        key_valid = (kk < x_lens[:, None]) | (
            (kk >= S) & (kk <= write_pos[:, None]))
        step_bias = jnp.where(key_valid, 0.0, M.NEG_INF).astype(
            jnp.float32)[:, None, None, :]
        hidden_s, cache_c = tfm.encoder_stack_decode_step(
            params["ar"]["decoder"], (e + pe)[:, None, :],
            {"k": ck_c, "v": cv_c}, write_pos, step_bias,
            nhead=cfg.nhead, norm_first=cfg.norm_first,
            activation=cfg.activation, dtype=dtype,
            unroll=unroll_layers, attn_len=Tc)
        new_logits = (hidden_s[:, 0] @ W).astype(jnp.float32)
        # freeze finished lanes: logits and progress hold until refill
        logits = jnp.where(done[:, None], logits, new_logits)
        g = jnp.where(done, g, g + 1)
        return (i + 1, rng_c, logits, cache_c["k"], cache_c["v"],
                g, done, gen_codes, gen_lens)

    init = (jnp.int32(0), st["rng"], st["logits"], ck, cv,
            st["g"], st["done"], st["gen_codes"], st["gen_lens"])
    (_, rng, logits, ck, cv, g, done, gen_codes, gen_lens
     ) = jax.lax.while_loop(cond_fn, body_fn, init)
    return {"k": ck, "v": cv, "logits": logits, "x_lens": x_lens,
            "p_lens": p_lens, "g": g, "done": done,
            "gen_codes": gen_codes, "gen_lens": gen_lens, "rng": rng}
