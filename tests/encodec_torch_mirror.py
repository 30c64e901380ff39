"""A minimal torch mirror of the EnCodec 24 kHz architecture, used only to
pin the numerical semantics of our JAX port (valle_tpu/codec/*) without the
pretrained weights.

The `encodec` pip package is not installed in this environment, so this
re-implements the exact forward semantics the reference relies on
(reference valle/data/tokenizer.py:181-242 drives
``EncodecModel.encodec_model_24khz`` + ``remove_encodec_weight_norm``):
causal streaming convs with reflect padding and ceil-to-frame extra
padding, SEANet residual blocks, a 2-layer skip LSTM bottleneck,
transposed convs with right-trim, and residual VQ by euclidean argmax.

State-dict key layout matches the public package
(``encoder.model.{i}.conv.conv.weight_g`` etc.) so it also exercises
``valle_tpu.codec.convert.import_encodec_state_dict`` including
weight-norm folding.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F
from torch.nn.utils import weight_norm


def _get_extra_padding(x, k_eff: int, stride: int,
                       padding_total: int) -> int:
    length = x.shape[-1]
    n_frames = (length - k_eff + padding_total) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + (k_eff - padding_total)
    return max(ideal - length, 0)


def _pad1d(x, paddings, mode="reflect"):
    pl, pr = paddings
    if mode != "reflect":
        return F.pad(x, (pl, pr), mode)
    length = x.shape[-1]
    max_pad = max(pl, pr)
    extra = 0
    if length <= max_pad:
        extra = max_pad - length + 1
        x = F.pad(x, (0, extra))
    padded = F.pad(x, (pl, pr), mode)
    end = padded.shape[-1] - extra
    return padded[..., :end]


class SConv1d(nn.Module):
    def __init__(self, cin, cout, k, stride=1, dilation=1, causal=True,
                 pad_mode="reflect"):
        super().__init__()
        self.conv = nn.Module()
        self.conv.conv = weight_norm(
            nn.Conv1d(cin, cout, k, stride=stride, dilation=dilation))
        self.stride, self.dilation = stride, dilation
        self.k, self.causal, self.pad_mode = k, causal, pad_mode

    def forward(self, x):
        k_eff = (self.k - 1) * self.dilation + 1
        padding_total = k_eff - self.stride
        extra = _get_extra_padding(x, k_eff, self.stride, padding_total)
        if self.causal:
            x = _pad1d(x, (padding_total, extra), self.pad_mode)
        else:
            pr = padding_total // 2
            x = _pad1d(x, (padding_total - pr, pr + extra), self.pad_mode)
        return self.conv.conv(x)


class SConvTranspose1d(nn.Module):
    def __init__(self, cin, cout, k, stride, causal=True,
                 trim_right_ratio=1.0):
        super().__init__()
        self.convtr = nn.Module()
        self.convtr.convtr = weight_norm(
            nn.ConvTranspose1d(cin, cout, k, stride=stride))
        self.k, self.stride = k, stride
        self.causal, self.trim_right_ratio = causal, trim_right_ratio

    def forward(self, x):
        y = self.convtr.convtr(x)
        padding_total = self.k - self.stride
        if self.causal:
            pr = math.ceil(padding_total * self.trim_right_ratio)
        else:
            pr = padding_total // 2
        pl = padding_total - pr
        return y[..., pl:y.shape[-1] - pr]


class SEANetResnetBlock(nn.Module):
    def __init__(self, dim, compress=2, k_res=3):
        super().__init__()
        hidden = dim // compress
        self.block = nn.Sequential(
            nn.ELU(), SConv1d(dim, hidden, k_res),
            nn.ELU(), SConv1d(hidden, dim, 1))
        self.shortcut = SConv1d(dim, dim, 1)

    def forward(self, x):
        return self.shortcut(x) + self.block(x)


class SLSTM(nn.Module):
    def __init__(self, dim, num_layers=2):
        super().__init__()
        self.lstm = nn.LSTM(dim, dim, num_layers)

    def forward(self, x):  # (B, C, T)
        y = x.permute(2, 0, 1)
        y, _ = self.lstm(y)
        return y.permute(1, 2, 0) + x


class _Codebook(nn.Module):
    def __init__(self, bins, dim):
        super().__init__()
        self.register_buffer("embed", torch.randn(bins, dim))


class _VQLayer(nn.Module):
    def __init__(self, bins, dim):
        super().__init__()
        self._codebook = _Codebook(bins, dim)


class MirrorEncodec(nn.Module):
    """Weight-normed SEANet encoder/decoder + RVQ, encodec key layout."""

    def __init__(self, channels=1, dimension=128, n_filters=32,
                 ratios=(8, 5, 4, 2), kernel=7, last_kernel=7, res_kernel=3,
                 lstm_layers=2, compress=2, num_quantizers=32, bins=1024):
        super().__init__()
        self.ratios = tuple(ratios)

        enc = [SConv1d(channels, n_filters, kernel)]
        mult = 1
        for ratio in reversed(ratios):
            enc.append(SEANetResnetBlock(mult * n_filters, compress,
                                         res_kernel))
            enc.append(nn.ELU())
            enc.append(SConv1d(mult * n_filters, mult * 2 * n_filters,
                               ratio * 2, stride=ratio))
            mult *= 2
        enc.append(SLSTM(mult * n_filters, lstm_layers))
        enc.append(nn.ELU())
        enc.append(SConv1d(mult * n_filters, dimension, last_kernel))
        self.encoder = nn.Module()
        self.encoder.model = nn.Sequential(*enc)

        dec = [SConv1d(dimension, mult * n_filters, kernel),
               SLSTM(mult * n_filters, lstm_layers)]
        for ratio in ratios:
            dec.append(nn.ELU())
            dec.append(SConvTranspose1d(mult * n_filters,
                                        mult * n_filters // 2,
                                        ratio * 2, stride=ratio))
            dec.append(SEANetResnetBlock(mult * n_filters // 2, compress,
                                         res_kernel))
            mult //= 2
        dec.append(nn.ELU())
        dec.append(SConv1d(n_filters, channels, last_kernel))
        self.decoder = nn.Module()
        self.decoder.model = nn.Sequential(*dec)

        self.quantizer = nn.Module()
        self.quantizer.vq = nn.Module()
        self.quantizer.vq.layers = nn.ModuleList(
            [_VQLayer(bins, dimension) for _ in range(num_quantizers)])

    # --- forward paths (all (B, C, T) torch layout) ---------------------
    def encode_latents(self, wav):  # (B, 1, T) -> (B, F, D)
        return self.encoder.model(wav).permute(0, 2, 1)

    def rvq_encode(self, latents, n_q):  # (B, F, D) -> (B, F, n_q)
        residual = latents
        codes = []
        for q in range(n_q):
            embed = self.quantizer.vq.layers[q]._codebook.embed
            dist = -(residual.pow(2).sum(-1, keepdim=True)
                     - 2.0 * residual @ embed.t()
                     + embed.pow(2).sum(-1))
            idx = dist.max(dim=-1).indices
            residual = residual - F.embedding(idx, embed)
            codes.append(idx)
        return torch.stack(codes, dim=-1)

    def rvq_decode(self, codes):  # (B, F, n_q) -> (B, F, D)
        acc = None
        for q in range(codes.shape[-1]):
            embed = self.quantizer.vq.layers[q]._codebook.embed
            e = F.embedding(codes[..., q], embed)
            acc = e if acc is None else acc + e
        return acc

    def decode_latents(self, latents):  # (B, F, D) -> (B, 1, T)
        return self.decoder.model(latents.permute(0, 2, 1))
