"""Import pretrained EnCodec 24 kHz weights (torch state_dict -> our params).

Folds weight normalization into plain weights at import (the reference does
the same before use: ``remove_encodec_weight_norm``,
``valle/data/tokenizer.py:181-208``, verified there to be bit-exact).

State-dict layout expected (public ``encodec`` package):
  encoder.model.{i}.conv.conv.{weight_g,weight_v,bias}        SConv1d
  encoder.model.{i}.block.{1,3}.conv.conv.*                   resblock convs
  encoder.model.{i}.shortcut.conv.conv.*                      resblock shortcut
  encoder.model.{13}.lstm.{weight_ih_l0,...}                  SLSTM
  decoder.model.{i}.convtr.convtr.{weight_g,weight_v,bias}    SConvTranspose1d
  quantizer.vq.layers.{q}._codebook.embed                     RVQ codebooks
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _np(t):
    if isinstance(t, np.ndarray):
        return t.astype(np.float32)
    return t.detach().cpu().numpy().astype(np.float32)


def _fold_weight_norm(sd: Dict, prefix: str) -> np.ndarray:
    """weight = g * v / ||v|| with the norm over all dims except dim 0."""
    if f"{prefix}.weight" in sd:
        return _np(sd[f"{prefix}.weight"])
    g = _np(sd[f"{prefix}.weight_g"])
    v = _np(sd[f"{prefix}.weight_v"])
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt((v * v).sum(axis=axes, keepdims=True))
    return g * v / norm


def _conv(sd, prefix) -> Dict:
    w = _fold_weight_norm(sd, f"{prefix}.conv.conv")
    # torch conv1d (out, in, k) -> ours (k, in, out)
    return {"w": np.transpose(w, (2, 1, 0)),
            "b": _np(sd[f"{prefix}.conv.conv.bias"])}


def _convtr(sd, prefix) -> Dict:
    w = _fold_weight_norm(sd, f"{prefix}.convtr.convtr")
    # torch convtranspose1d (in, out, k) -> ours (k, out, in)
    return {"w": np.transpose(w, (2, 1, 0)),
            "b": _np(sd[f"{prefix}.convtr.convtr.bias"])}


def _resblock(sd, prefix) -> Dict:
    return {
        "conv1": _conv(sd, f"{prefix}.block.1"),
        "conv2": _conv(sd, f"{prefix}.block.3"),
        "shortcut": _conv(sd, f"{prefix}.shortcut"),
    }


def _lstm(sd, prefix, num_layers=2) -> Dict:
    layers = []
    for i in range(num_layers):
        layers.append({
            "w_ih": _np(sd[f"{prefix}.lstm.weight_ih_l{i}"]).T,
            "w_hh": _np(sd[f"{prefix}.lstm.weight_hh_l{i}"]).T,
            "b_ih": _np(sd[f"{prefix}.lstm.bias_ih_l{i}"]),
            "b_hh": _np(sd[f"{prefix}.lstm.bias_hh_l{i}"]),
        })
    import jax

    return {"layers": jax.tree_util.tree_map(
        lambda *xs: np.stack(xs), *layers)}


def import_encodec_state_dict(sd: Dict, num_ratios: int = 4,
                              num_quantizers: int = 32) -> Dict:
    """Returns our EnCodec params pytree (numpy leaves)."""
    import jax.numpy as jnp

    enc = {"init_conv": _conv(sd, "encoder.model.0")}
    idx = 1
    for i in range(num_ratios):
        enc[f"res{i}"] = _resblock(sd, f"encoder.model.{idx}")
        enc[f"down{i}"] = _conv(sd, f"encoder.model.{idx + 2}")
        idx += 3
    enc["lstm"] = _lstm(sd, f"encoder.model.{idx}")
    enc["final_conv"] = _conv(sd, f"encoder.model.{idx + 2}")

    dec = {"init_conv": _conv(sd, "decoder.model.0"),
           "lstm": _lstm(sd, "decoder.model.1")}
    idx = 3
    for i in range(num_ratios):
        dec[f"up{i}"] = _convtr(sd, f"decoder.model.{idx}")
        dec[f"res{i}"] = _resblock(sd, f"decoder.model.{idx + 1}")
        idx += 3
    # after the loop idx sits on the final ELU+conv pair: conv is at idx
    # (layout: ..., res(idx-2), ELU(idx-1), final_conv(idx))
    dec["final_conv"] = _conv(sd, f"decoder.model.{idx}")

    embed = np.stack([
        _np(sd[f"quantizer.vq.layers.{q}._codebook.embed"])
        for q in range(num_quantizers)])

    params = {"encoder": enc, "decoder": dec, "quantizer": {"embed": embed}}
    import jax

    return jax.tree_util.tree_map(jnp.asarray, params)


def load_encodec_torch(path: str) -> Dict:
    """Load an EnCodec checkpoint file (torch .th/.pt) into our params."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd and isinstance(
            sd["model"], dict):
        sd = sd["model"]
    return import_encodec_state_dict(sd)
