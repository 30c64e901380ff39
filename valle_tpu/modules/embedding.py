"""Token and sinusoidal positional embeddings (pure-functional JAX).

Capability parity with reference ``valle/modules/embedding.py``:
- ``TokenEmbedding`` (embedding lookup + dropout, weight exposed for tying)
- ``SinePositionalEmbedding`` with a **learnable scalar alpha** (alpha is a
  trainable param for the AR stacks and fixed 1.0 for NAR, per reference
  ``valle/models/valle.py:128-139,218-229``).

TPU-first differences: the PE table is precomputed once to a static
``max_len`` (no lazy host-side extension as in the reference's
``extend_pe``); everything is a pure function over explicit param pytrees so
it composes with jit/scan/while_loop.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp

# 8 (default): one random byte per keep/drop decision; 32: f32
# bernoulli. Module-level (not cfg) like transformer.SCORE_BF16 — it
# changes mask SAMPLING, not model math, and benches flip it per-arm
# in-process. MEASURED (2026-08-18 amortized micro-bench at the AR
# attention-prob shape, minus the dispatch floor): bernoulli 0.83
# ms/apply, direct uint8 bits 0.19 (4.5x); two earlier constructions
# LOST — a flat global reshape of u32 words (defeated fusion, 2.7x
# slower step) and a minor-dim u32 bitcast+slice (0.97 ms) — only
# jax.random.bits(shape, uint8) at the mask's own shape lowers well.
_DROPOUT_BITS = int(os.environ.get("VALLE_TPU_DROPOUT_BITS", "8"))


def init_token_embedding(rng, vocab_size: int, dim: int, dtype=jnp.float32):
    """N(0,1) init, matching torch nn.Embedding defaults."""
    return {"weight": jax.random.normal(rng, (vocab_size, dim), dtype=dtype)}


def token_embedding(params, ids: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """Lookup: ids (...,) int -> (..., D)."""
    w = params["weight"]
    if dtype is not None:
        w = w.astype(dtype)
    return jnp.take(w, ids, axis=0)


def sine_positional_table(max_len: int, dim: int) -> jnp.ndarray:
    """(max_len, dim) fp32 sin/cos table, interleaved as in the reference."""
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(
        jnp.arange(0, dim, 2, dtype=jnp.float32)
        * -(math.log(10000.0) / dim)
    )
    angles = position * div_term  # (max_len, dim//2)
    pe = jnp.zeros((max_len, dim), dtype=jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(angles))
    pe = pe.at[:, 1::2].set(jnp.cos(angles))
    return pe


def init_sine_positional(alpha_trainable: bool):
    """PE has one optional scalar param: alpha. The table itself is static."""
    if alpha_trainable:
        return {"alpha": jnp.ones((1,), dtype=jnp.float32)}
    return {}


def apply_sine_positional(
    params,
    x: jnp.ndarray,
    pe_table: jnp.ndarray,
    *,
    offset: int | jnp.ndarray = 0,
    x_scale: float = 1.0,
    dropout_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jnp.ndarray:
    """x: (B, T, D). Adds alpha * pe[offset:offset+T] and applies dropout.

    ``offset`` supports incremental decoding (position of x[:, 0]).
    """
    T, D = x.shape[-2], x.shape[-1]
    alpha = params.get("alpha", jnp.ones((1,), dtype=jnp.float32))
    pe = jax.lax.dynamic_slice_in_dim(pe_table, offset, T, axis=0)
    out = x * jnp.asarray(x_scale, x.dtype) + (
        alpha.astype(x.dtype) * pe.astype(x.dtype)
    )
    return dropout(out, dropout_rate, rng, deterministic)


def apply_sine_positional_gather(
    params,
    x: jnp.ndarray,
    pe_table: jnp.ndarray,
    pos_ids: jnp.ndarray,
    *,
    dropout_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jnp.ndarray:
    """Per-position variant: x (B, T, D) + alpha * pe[pos_ids].

    ``pos_ids`` (B, T) carries each position's PE index — used by
    sequence-packed rows where every segment restarts its positions at 0.
    """
    alpha = params.get("alpha", jnp.ones((1,), dtype=jnp.float32))
    pe = jnp.take(pe_table, jnp.maximum(pos_ids, 0), axis=0)
    out = x + alpha.astype(x.dtype) * pe.astype(x.dtype)
    return dropout(out, dropout_rate, rng, deterministic)


def dropout(x, rate: float, rng, deterministic: bool):
    """Inverted dropout with 8-bit random masks by default.

    ``bernoulli`` spends 32 random bits (+ a bits->float conversion) per
    element; the biggest training mask is the attention-probability
    matrix — (B, H, T, T) x layers ~ 6.8e8 elements per AR step at the
    recipe shape, generated TWICE under remat=full. One random byte per
    element is plenty for a keep/drop decision, and
    ``jax.random.bits(shape, uint8)`` lowers to 4x fewer generator words
    (measured 4.5x faster per apply than bernoulli — see the module-flag
    comment). The keep threshold is quantized to 1/256 with the rescale
    using the QUANTIZED keep probability, so the estimator stays
    unbiased (e.g. rate 0.1 -> drop 26/256 = 0.1016, scale 256/230).
    Set VALLE_TPU_DROPOUT_BITS=32 for the exact-rate bernoulli path.
    Measured A/B: benchmarks/profile_train.py ladder (BASELINE.md r4).
    """
    if deterministic or rate == 0.0:
        return x
    if _DROPOUT_BITS == 8:
        thresh = int(round(rate * 256.0))
        keep_p = 1.0 - thresh / 256.0
        keep = jax.random.bits(rng, x.shape, jnp.uint8) >= thresh
        return jnp.where(keep, x / keep_p, 0.0)
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)
