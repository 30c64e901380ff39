"""Optional text/audio prenets (``--add-prenet`` capability).

Parity with reference ``valle/models/valle.py:96-126,180-216``:
- text prenet: 3 x [Conv1d(k=5, same) -> BatchNorm1d -> ReLU -> Dropout(0.5)]
  followed by a Linear(d, d);
- audio prenet: Linear(d,256) -> ReLU -> Dropout(0.25) -> Linear(256,256)
  -> ReLU -> Dropout(0.25) -> Linear(256,d).

BatchNorm running statistics are threaded functionally: apply returns
``(y, new_state)``; pass ``training=False`` to use the stored stats.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .embedding import dropout as _dropout
from .transformer import init_linear, linear


def _init_conv1d(rng, channels: int, kernel: int):
    wkey, bkey = jax.random.split(rng)
    fan_in = channels * kernel
    bound = (1.0 / fan_in) ** 0.5
    return {
        "w": jax.random.uniform(
            wkey, (kernel, channels, channels), jnp.float32,
            -bound * (3 ** 0.5), bound * (3 ** 0.5)),
        "b": jax.random.uniform(bkey, (channels,), jnp.float32, -bound, bound),
    }


def _conv1d_same(p, x):
    """x: (B, T, C) -> (B, T, C), SAME padding."""
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1,), padding="SAME",
        dimension_numbers=("NTC", "TIO", "NTC"),
    )
    return y + p["b"]


def init_batch_norm(channels: int):
    params = {"scale": jnp.ones((channels,)), "bias": jnp.zeros((channels,))}
    state = {"mean": jnp.zeros((channels,)), "var": jnp.ones((channels,))}
    return params, state


def batch_norm(params, state, x, *, training: bool, momentum: float = 0.1,
               eps: float = 1e-5):
    """x: (B, T, C), normalized per channel over (B, T)."""
    if training:
        mean = x.mean(axis=(0, 1))
        var = x.var(axis=(0, 1))
        n = x.shape[0] * x.shape[1]
        unbiased = var * n / max(n - 1, 1)
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * params["scale"] + params["bias"], new_state


def init_text_prenet(rng, d: int):
    ks = jax.random.split(rng, 4)
    params, state = {}, {}
    for i in range(3):
        params[f"conv{i}"] = _init_conv1d(ks[i], d, 5)
        bn_p, bn_s = init_batch_norm(d)
        params[f"bn{i}"] = bn_p
        state[f"bn{i}"] = bn_s
    params["out"] = init_linear(ks[3], d, d)
    return params, state


def text_prenet(params, state, x, *, training: bool, rng=None) -> Tuple:
    new_state = dict(state)
    for i in range(3):
        x = _conv1d_same(params[f"conv{i}"], x)
        x, new_state[f"bn{i}"] = batch_norm(
            params[f"bn{i}"], state[f"bn{i}"], x, training=training)
        x = jax.nn.relu(x)
        r = None if rng is None else jax.random.fold_in(rng, i)
        x = _dropout(x, 0.5, r, deterministic=not training or rng is None)
    return linear(params["out"], x), new_state


def init_audio_prenet(rng, d: int, hidden: int = 256):
    ks = jax.random.split(rng, 3)
    return {
        "lin0": init_linear(ks[0], d, hidden),
        "lin1": init_linear(ks[1], hidden, hidden),
        "lin2": init_linear(ks[2], hidden, d),
    }


def audio_prenet(params, x, *, training: bool, rng=None):
    for i in range(2):
        x = jax.nn.relu(linear(params[f"lin{i}"], x))
        r = None if rng is None else jax.random.fold_in(rng, i)
        x = _dropout(x, 0.25, r, deterministic=not training or rng is None)
    return linear(params["lin2"], x)
