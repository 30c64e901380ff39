"""EnCodec 24 kHz model: encode wav -> RVQ codes; decode codes -> wav.

Capability parity with the ``encodec`` pip package as used by the reference
(``EncodecModel.encodec_model_24khz()`` + ``set_target_bandwidth(6.0)``,
reference ``valle/data/tokenizer.py:214-242``): 24 kHz mono, 320x hop
(75 Hz frames), 8 quantizers at 6 kbps, no normalization, single segment.

Runs on TPU via jit. Pretrained weights load through
``convert.import_encodec_state_dict`` (weight-norm folded).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import quantization as rvq
from . import seanet


@dataclass(frozen=True)
class EncodecConfig:
    sample_rate: int = 24_000
    channels: int = 1
    dimension: int = 128
    n_filters: int = 32
    ratios: Tuple[int, ...] = (8, 5, 4, 2)
    num_quantizers: int = 32       # codebooks available
    bins: int = 1024
    lstm_layers: int = 2
    causal: bool = True
    pad_mode: str = "reflect"

    @property
    def hop_length(self) -> int:
        out = 1
        for r in self.ratios:
            out *= r
        return out  # 320

    @property
    def frame_rate(self) -> int:
        return self.sample_rate // self.hop_length  # 75

    def n_q_for_bandwidth(self, bandwidth_khz: float) -> int:
        """bandwidth (kbps) -> number of codebooks (encodec semantics)."""
        bits_per_frame = 10  # log2(1024)
        per_q_kbps = self.frame_rate * bits_per_frame / 1000.0  # 0.75
        return max(1, int(bandwidth_khz / per_q_kbps))  # 6.0 -> 8


def init_encodec(rng, cfg: EncodecConfig = EncodecConfig()):
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "encoder": seanet.init_seanet_encoder(
            k1, channels=cfg.channels, dimension=cfg.dimension,
            n_filters=cfg.n_filters, ratios=cfg.ratios,
            lstm_layers=cfg.lstm_layers),
        "decoder": seanet.init_seanet_decoder(
            k2, channels=cfg.channels, dimension=cfg.dimension,
            n_filters=cfg.n_filters, ratios=cfg.ratios,
            lstm_layers=cfg.lstm_layers),
        "quantizer": rvq.init_rvq(
            k3, num_quantizers=cfg.num_quantizers, bins=cfg.bins,
            dim=cfg.dimension),
    }


@functools.partial(jax.jit, static_argnames=("cfg", "n_q"))
def encodec_encode(params, wav: jnp.ndarray, *, cfg: EncodecConfig,
                   n_q: int = 8) -> jnp.ndarray:
    """wav: (B, T, 1) float32 in [-1, 1] -> codes (B, ceil(T/320), n_q)."""
    z = seanet.seanet_encoder_apply(
        params["encoder"], wav, ratios=cfg.ratios, causal=cfg.causal,
        pad_mode=cfg.pad_mode)
    return rvq.rvq_encode(params["quantizer"], z, n_q)


@functools.partial(jax.jit, static_argnames=("cfg", "dtype"))
def encodec_decode(params, codes: jnp.ndarray, *, cfg: EncodecConfig,
                   dtype=jnp.float32) -> jnp.ndarray:
    """codes: (B, F, n_q) -> wav (B, F*320, 1).

    ``dtype=jnp.bfloat16`` runs the SEANet decoder convs/LSTM in bf16
    (full MXU rate, half the HBM traffic); the RVQ embedding sum and the
    returned waveform stay fp32. Measured fidelity vs the fp32 path is
    ~40 dB SNR (tests/test_codec.py::test_decode_bf16_close_to_fp32) —
    far below EnCodec's own quantization noise.
    """
    z = rvq.rvq_decode(params["quantizer"], codes)
    dec = params["decoder"]
    if dtype != jnp.float32:
        dec = jax.tree_util.tree_map(lambda a: a.astype(dtype), dec)
        z = z.astype(dtype)
    wav = seanet.seanet_decoder_apply(
        dec, z, ratios=cfg.ratios, causal=cfg.causal,
        pad_mode=cfg.pad_mode)
    return wav.astype(jnp.float32)
