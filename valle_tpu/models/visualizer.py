#!/usr/bin/env python3
"""Evaluation visualization: encoder/decoder/target heatmaps per utterance.

Capability parity with reference ``valle/models/visualizer.py:26-106``
(used by the trainer's ``--visualize`` flag at validation): saves
``{output_dir}/{utt_id}.png`` with text embeddings, output codes/features
and target features side by side.
"""

from __future__ import annotations

from typing import Dict, List, Tuple, Union

import numpy as np


def visualize(
    predicts: Tuple,
    batch: Dict[str, Union[List, np.ndarray]],
    output_dir: str,
    limit: int = 4,
) -> None:
    import matplotlib.pyplot as plt

    text_outputs, audio_outputs = predicts
    text_outputs = np.asarray(text_outputs)
    audio_outputs = np.asarray(audio_outputs)
    utt_ids = batch["utt_id"]
    x_lens = np.asarray(batch["text_tokens_lens"])
    y_lens = np.asarray(batch["audio_features_lens"])
    features = np.asarray(batch["audio_features"])

    for b, utt_id in enumerate(utt_ids[:limit]):
        _, axes = plt.subplots(3, 1, figsize=(14, 8))
        S = int(x_lens[b])
        T = int(y_lens[b])

        enc = text_outputs[b, :S].T if text_outputs.ndim == 3 else \
            text_outputs[b][None, :S]
        axes[0].imshow(np.asarray(enc, np.float32), aspect="auto",
                       origin="lower", interpolation="none")
        axes[0].set_title(f"{utt_id} encoder output")

        dec = audio_outputs[b, :T]
        axes[1].imshow(np.asarray(dec, np.float32).T, aspect="auto",
                       origin="lower", interpolation="none")
        axes[1].set_title("decoder output")

        tgt = features[b, :T]
        axes[2].imshow(np.asarray(tgt, np.float32).T, aspect="auto",
                       origin="lower", interpolation="none")
        axes[2].set_title("target features")

        plt.tight_layout()
        plt.savefig(f"{output_dir}/{utt_id}.png", dpi=80)
        plt.close()
