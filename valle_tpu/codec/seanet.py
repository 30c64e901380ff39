"""SEANet encoder/decoder (EnCodec's convolutional codec nets) in JAX.

Capability parity with the EnCodec 24 kHz architecture the reference drives
through the ``encodec`` pip package (reference ``valle/data/tokenizer.py:211-254``
uses ``EncodecModel.encodec_model_24khz`` at 6 kbps): causal streaming
convolutions with reflect padding, residual blocks, a 2-layer LSTM
bottleneck, and transposed-conv upsampling — n_filters=32, dimension=128,
ratios (8,5,4,2), kernel 7, residual kernel 3, compress 2, ELU.

Pure-functional JAX: params are nested dicts; convs use
``lax.conv_general_dilated`` in NTC layout; the LSTM is a ``lax.scan``.
Weight-norm is folded at import time (the reference folds it too:
``remove_encodec_weight_norm``, tokenizer.py:181-208).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

ELU = jax.nn.elu


# ---------------------------------------------------------------------------
# Causal conv helpers (semantics of encodec.modules.conv)
# ---------------------------------------------------------------------------


def _extra_padding(length: int, k_eff: int, stride: int,
                   padding_total: int) -> int:
    n_frames = (length - k_eff + padding_total) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + (k_eff - padding_total)
    return max(ideal - length, 0)


def _pad1d_reflect(x: jnp.ndarray, left: int, right: int) -> jnp.ndarray:
    """x: (B, T, C). Reflect padding with the small-input guard encodec has
    (pad with zeros first if T <= max(left, right))."""
    T = x.shape[1]
    m = max(left, right)
    if m >= T:
        extra = m - T + 1
        x = jnp.pad(x, ((0, 0), (0, extra), (0, 0)))
    out = jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode="reflect")
    if m >= T:
        # remove the temporary zero extension from the END (it sits inside)
        end = out.shape[1] - (m - T + 1)
        out = out[:, :end]
    return out


def init_conv1d(rng, cin: int, cout: int, k: int):
    wkey, bkey = jax.random.split(rng)
    fan_in = cin * k
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "w": jax.random.uniform(wkey, (k, cin, cout), jnp.float32,
                                -bound * math.sqrt(3), bound * math.sqrt(3)),
        "b": jax.random.uniform(bkey, (cout,), jnp.float32, -bound, bound),
    }


def sconv1d(p, x: jnp.ndarray, *, stride: int = 1, dilation: int = 1,
            causal: bool = True, pad_mode: str = "reflect") -> jnp.ndarray:
    """Streaming-safe causal conv (encodec SConv1d). x: (B, T, C)."""
    k = p["w"].shape[0]
    k_eff = (k - 1) * dilation + 1
    padding_total = k_eff - stride
    extra = _extra_padding(x.shape[1], k_eff, stride, padding_total)
    if causal:
        left, right = padding_total, extra
    else:
        right = padding_total // 2 + extra
        left = padding_total - padding_total // 2
    if pad_mode == "reflect":
        x = _pad1d_reflect(x, left, right)
    else:
        x = jnp.pad(x, ((0, 0), (left, right), (0, 0)))
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride,), padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NTC", "TIO", "NTC"))
    return y + p["b"]


def init_convtr1d(rng, cin: int, cout: int, k: int):
    wkey, bkey = jax.random.split(rng)
    # torch ConvTranspose1d weight is (in, out, k): _calculate_fan_in uses
    # dim 1 => fan_in = OUT channels * k (not in*k)
    fan_in = cout * k
    bound = 1.0 / math.sqrt(fan_in)
    return {
        # torch ConvTranspose1d weight is (cin, cout, k); we keep (k, cout, cin)
        # for lax.conv_transpose with ("NTC", "TOI", "NTC")... stored as
        # (k, cin, cout) and used via transpose=IO swap below.
        "w": jax.random.uniform(wkey, (k, cout, cin), jnp.float32,
                                -bound * math.sqrt(3), bound * math.sqrt(3)),
        "b": jax.random.uniform(bkey, (cout,), jnp.float32, -bound, bound),
    }


def sconvtr1d(p, x: jnp.ndarray, *, stride: int, causal: bool = True,
              trim_right_ratio: float = 1.0) -> jnp.ndarray:
    """Streaming-safe transposed conv (encodec SConvTranspose1d).

    torch's ConvTranspose1d is the adjoint of its (cross-correlation)
    Conv1d, i.e. a fractionally-strided conv with the kernel FLIPPED along
    the spatial dim; ``lax.conv_transpose`` with ``transpose_kernel=False``
    does not flip, so flip explicitly to match
    (pinned by tests/test_codec_torch_parity.py).
    """
    k = p["w"].shape[0]
    y = jax.lax.conv_transpose(
        x, jnp.flip(p["w"], axis=0), strides=(stride,), padding="VALID",
        dimension_numbers=("NTC", "TOI", "NTC"))
    y = y + p["b"]
    padding_total = k - stride
    if causal:
        pr = math.ceil(padding_total * trim_right_ratio)
        pl = padding_total - pr
    else:
        pr = padding_total // 2
        pl = padding_total - pr
    end = y.shape[1] - pr
    return y[:, pl:end]


# ---------------------------------------------------------------------------
# LSTM (encodec SLSTM: 2-layer, skip connection)
# ---------------------------------------------------------------------------


def init_lstm(rng, dim: int, num_layers: int = 2):
    layers = []
    for i in range(num_layers):
        k1, k2, k3, k4, rng = jax.random.split(rng, 5)
        bound = 1.0 / math.sqrt(dim)
        u = lambda kk, shape: jax.random.uniform(kk, shape, jnp.float32,
                                                 -bound, bound)
        layers.append({
            "w_ih": u(k1, (dim, 4 * dim)),
            "w_hh": u(k2, (dim, 4 * dim)),
            "b_ih": u(k3, (4 * dim,)),
            "b_hh": u(k4, (4 * dim,)),
        })
    return {"layers": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                             *layers)}


def lstm_apply(p, x: jnp.ndarray, skip: bool = True) -> jnp.ndarray:
    """x: (B, T, C) -> (B, T, C); torch LSTM gate order i,f,g,o."""
    B, T, C = x.shape

    def layer(x, lp):
        def cell(carry, xt):
            h, c = carry
            gates = xt @ lp["w_ih"] + lp["b_ih"] + h @ lp["w_hh"] + lp["b_hh"]
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        h0 = jnp.zeros((B, C), x.dtype)
        (_, _), ys = jax.lax.scan(cell, (h0, h0), jnp.swapaxes(x, 0, 1))
        return jnp.swapaxes(ys, 0, 1)

    y = x
    n_layers = p["layers"]["w_ih"].shape[0]
    for i in range(n_layers):
        lp = jax.tree_util.tree_map(lambda a: a[i], p["layers"])
        y = layer(y, lp)
    return y + x if skip else y


# ---------------------------------------------------------------------------
# SEANet encoder / decoder
# ---------------------------------------------------------------------------


def init_resblock(rng, dim: int, compress: int = 2, k_res: int = 3):
    k1, k2, k3 = jax.random.split(rng, 3)
    hidden = dim // compress
    return {
        "conv1": init_conv1d(k1, dim, hidden, k_res),
        "conv2": init_conv1d(k2, hidden, dim, 1),
        "shortcut": init_conv1d(k3, dim, dim, 1),
    }


def resblock_apply(p, x, *, causal=True, pad_mode="reflect"):
    y = sconv1d(p["conv1"], ELU(x), causal=causal, pad_mode=pad_mode)
    y = sconv1d(p["conv2"], ELU(y), causal=causal, pad_mode=pad_mode)
    return sconv1d(p["shortcut"], x, causal=causal, pad_mode=pad_mode) + y


def init_seanet_encoder(rng, *, channels=1, dimension=128, n_filters=32,
                        ratios=(8, 5, 4, 2), kernel=7, last_kernel=7,
                        res_kernel=3, lstm_layers=2, compress=2):
    ks = jax.random.split(rng, 4 + 2 * len(ratios))
    p = {"init_conv": init_conv1d(ks[0], channels, n_filters, kernel)}
    mult = 1
    for i, ratio in enumerate(reversed(ratios)):
        p[f"res{i}"] = init_resblock(ks[1 + 2 * i], mult * n_filters,
                                     compress, res_kernel)
        p[f"down{i}"] = init_conv1d(ks[2 + 2 * i], mult * n_filters,
                                    mult * 2 * n_filters, ratio * 2)
        mult *= 2
    p["lstm"] = init_lstm(ks[-2], mult * n_filters, lstm_layers)
    p["final_conv"] = init_conv1d(ks[-1], mult * n_filters, dimension,
                                  last_kernel)
    return p


def seanet_encoder_apply(p, x, *, ratios=(8, 5, 4, 2), causal=True,
                         pad_mode="reflect"):
    """x: (B, T, 1) waveform -> (B, T/hop, dimension) latents."""
    y = sconv1d(p["init_conv"], x, causal=causal, pad_mode=pad_mode)
    for i, ratio in enumerate(reversed(ratios)):
        y = resblock_apply(p[f"res{i}"], y, causal=causal, pad_mode=pad_mode)
        y = sconv1d(p[f"down{i}"], ELU(y), stride=ratio, causal=causal,
                    pad_mode=pad_mode)
    y = lstm_apply(p["lstm"], y)
    return sconv1d(p["final_conv"], ELU(y), causal=causal, pad_mode=pad_mode)


def init_seanet_decoder(rng, *, channels=1, dimension=128, n_filters=32,
                        ratios=(8, 5, 4, 2), kernel=7, last_kernel=7,
                        res_kernel=3, lstm_layers=2, compress=2):
    ks = jax.random.split(rng, 4 + 2 * len(ratios))
    mult = int(2 ** len(ratios))
    p = {"init_conv": init_conv1d(ks[0], dimension, mult * n_filters, kernel)}
    p["lstm"] = init_lstm(ks[1], mult * n_filters, lstm_layers)
    for i, ratio in enumerate(ratios):
        p[f"up{i}"] = init_convtr1d(ks[2 + 2 * i], mult * n_filters,
                                    mult * n_filters // 2, ratio * 2)
        p[f"res{i}"] = init_resblock(ks[3 + 2 * i], mult * n_filters // 2,
                                     compress, res_kernel)
        mult //= 2
    p["final_conv"] = init_conv1d(ks[-1], n_filters, channels, last_kernel)
    return p


def seanet_decoder_apply(p, z, *, ratios=(8, 5, 4, 2), causal=True,
                         pad_mode="reflect"):
    """z: (B, T, dimension) -> (B, T*hop, 1) waveform."""
    y = sconv1d(p["init_conv"], z, causal=causal, pad_mode=pad_mode)
    y = lstm_apply(p["lstm"], y)
    for i, ratio in enumerate(ratios):
        y = sconvtr1d(p[f"up{i}"], ELU(y), stride=ratio, causal=causal)
        y = resblock_apply(p[f"res{i}"], y, causal=causal, pad_mode=pad_mode)
    return sconv1d(p["final_conv"], ELU(y), causal=causal, pad_mode=pad_mode)
