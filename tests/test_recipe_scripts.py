"""Drive the real egs/ljspeech/prepare.sh shell recipe end to end.

Stages 1-3 (manifests -> EnCodec tokenization -> statistics) on a
synthetic LJSpeech-shaped corpus (22.05 kHz wavs + metadata.csv — also
exercises the 24 kHz resampling path). Stage 0 (download) needs network
and is skipped.
"""

import os
import subprocess
from pathlib import Path

import numpy as np

from valle_tpu import native

REPO = Path(__file__).resolve().parent.parent


def _make_corpus(root: Path, n=12):
    (root / "wavs").mkdir(parents=True)
    rng = np.random.RandomState(0)
    lines = []
    for i in range(n):
        sr = 22050
        dur = 0.6 + 0.1 * (i % 4)
        nsamp = int(dur * sr)
        t = np.arange(nsamp) / sr
        w = (0.3 * np.sin(2 * np.pi * (180 + 30 * (i % 6)) * t)
             + 0.04 * rng.randn(nsamp)).astype(np.float32)
        uid = f"LJ001-{i:04d}"
        native.write_wav(root / "wavs" / f"{uid}.wav", w, sr)
        lines.append(f"{uid}|some text here|some text here")
    (root / "metadata.csv").write_text("\n".join(lines))


def test_ljspeech_prepare_sh(tmp_path):
    corpus = tmp_path / "LJSpeech-1.1"
    _make_corpus(corpus)
    data_dir = tmp_path / "data"
    env = dict(os.environ)
    env.update(stage="1", stop_stage="3", corpus_dir=str(corpus),
               text_extractor="char", data_dir=str(data_dir))
    proc = subprocess.run(
        ["bash", str(REPO / "egs/ljspeech/prepare.sh")],
        env=env, capture_output=True, text=True, timeout=500)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "Cuts count: 12" in proc.stdout

    from valle_tpu.data.manifests import CutSet

    cuts = CutSet.from_file(data_dir / "tokenized" / "cuts_train.jsonl.gz")
    assert len(cuts) == 12
    c = cuts[0]
    assert c.tokens, "no text tokens"
    feats = c.load_features()
    assert feats.shape == (c.features.num_frames, 8)
    assert (data_dir / "tokenized"
            / "unique_text_tokens.k2symbols").exists()
