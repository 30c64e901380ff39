"""Residual vector quantization (EnCodec's RVQ) in JAX.

Parity with the ``encodec.quantization`` module the reference relies on:
32 codebooks x 1024 bins over 128-dim latents; at a target bandwidth the
first ``n_q`` codebooks are used (6 kbps @ 75 Hz -> n_q = 8, reference
``valle/data/tokenizer.py:220,259-260``). Nearest-neighbor search uses the
same -(||x||^2 - 2 x.c + ||c||^2) argmax formulation as the package so code
indices are bit-identical given identical inputs/codebooks.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def init_rvq(rng, *, num_quantizers: int = 32, bins: int = 1024,
             dim: int = 128):
    return {"embed": jax.random.normal(
        rng, (num_quantizers, bins, dim), jnp.float32)}


def _nearest(codebook: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """codebook (K, D); x (..., D) -> indices (...,). Same scoring as
    encodec's EuclideanCodebook.quantize (argmax of -dist^2)."""
    dist = (
        -(jnp.sum(x * x, axis=-1, keepdims=True)
          - 2.0 * (x @ codebook.T)
          + jnp.sum(codebook * codebook, axis=-1)[None, :]))
    return jnp.argmax(dist, axis=-1)


def rvq_encode(params, x: jnp.ndarray, n_q: int) -> jnp.ndarray:
    """x: (B, T, D) latents -> codes (B, T, n_q) int32."""
    embed = params["embed"]

    def step(residual, q):
        cb = embed[q]
        idx = _nearest(cb, residual)
        quantized = jnp.take(cb, idx, axis=0)
        return residual - quantized, idx.astype(jnp.int32)

    residual, codes = jax.lax.scan(step, x, jnp.arange(n_q))
    return jnp.moveaxis(codes, 0, -1)  # (B, T, n_q)


def rvq_decode(params, codes: jnp.ndarray) -> jnp.ndarray:
    """codes: (B, T, n_q) -> latents (B, T, D)."""
    embed = params["embed"]
    n_q = codes.shape[-1]

    def step(acc, q):
        cb = embed[q]
        acc = acc + jnp.take(cb, codes[..., q], axis=0)
        return acc, None

    B, T, _ = codes.shape
    acc = jnp.zeros((B, T, embed.shape[-1]), embed.dtype)
    acc, _ = jax.lax.scan(step, acc, jnp.arange(n_q))
    return acc
