"""On-device sampling: temperature -> top-k/top-p filtering -> categorical.

Capability parity with reference ``valle/models/valle.py:1242-1302``
(``top_k_top_p_filtering`` / ``topk_sampling``), re-designed to run fully
inside jit (static shapes, no host round-trip per token). The reference's
semantics are preserved:

- ``top_k > 0``: keep only logits >= the k-th largest (ties kept, as in the
  reference's ``logits < topk(...)[-1]`` comparison).
- ``top_k <= 0``: no top-k filtering (the reference default is -100 = off).
- ``top_p < 1.0``: nucleus filtering — drop tokens whose *prefix* cumulative
  probability (sorted descending) exceeds top_p, always keeping the first.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


def top_k_top_p_filtering(
    logits: jnp.ndarray,
    top_k: int = 0,
    top_p: float = 1.0,
    min_tokens_to_keep: int = 1,
) -> jnp.ndarray:
    """logits: (..., V). ``top_k`` and ``top_p`` are static."""
    V = logits.shape[-1]
    if top_k > 0:
        k = min(max(top_k, min_tokens_to_keep), V)
        kth = jax.lax.top_k(logits, k)[0][..., -1:]
        logits = jnp.where(logits < kth, NEG_INF, logits)

    if top_p < 1.0:
        order = jnp.argsort(-logits, axis=-1)          # descending
        sorted_logits = jnp.take_along_axis(logits, order, axis=-1)
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # mask tokens whose cumulative prob BEFORE them already exceeds top_p
        # (reference shifts the removal mask right by one: first token kept)
        remove_sorted = cum > top_p
        remove_sorted = jnp.concatenate(
            [jnp.zeros_like(remove_sorted[..., :1]), remove_sorted[..., :-1]],
            axis=-1,
        )
        if min_tokens_to_keep > 1:
            remove_sorted = remove_sorted.at[..., :min_tokens_to_keep].set(False)
        # scatter removal back by SORTED INDEX like the reference's
        # masked_fill(scatter(...)) — a value-space threshold would keep
        # duplicates tied with the smallest kept logit that the reference
        # drops
        inv = jnp.argsort(order, axis=-1)
        remove = jnp.take_along_axis(remove_sorted, inv, axis=-1)
        logits = jnp.where(remove, NEG_INF, logits)
    return logits


def topk_sampling(
    rng: jax.Array,
    logits: jnp.ndarray,
    top_k: int = 10,
    top_p: float = 1.0,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """Sample token ids (...,) from filtered logits (..., V)."""
    if temperature != 1.0:
        logits = logits / temperature
    logits = top_k_top_p_filtering(logits, top_k=top_k, top_p=top_p)
    return jax.random.categorical(rng, logits, axis=-1)
