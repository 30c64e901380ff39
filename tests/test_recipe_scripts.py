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
        env=env, capture_output=True, text=True, timeout=900)
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


def _sine_wav(path, dur, sr=24000, f0=220, seed=0):
    rng = np.random.RandomState(seed)
    n = int(dur * sr)
    t = np.arange(n) / sr
    w = (0.3 * np.sin(2 * np.pi * f0 * t)
         + 0.04 * rng.randn(n)).astype(np.float32)
    native.write_wav(path, w, sr)


def test_libritts_prepare_sh(tmp_path):
    """LibriTTS layout: <part>/<speaker>/<book>/*.wav + .normalized.txt."""
    corpus = tmp_path / "LibriTTS"
    for part, n in (("train-clean-100", 6), ("dev-clean", 2),
                    ("test-clean", 2)):
        for i in range(n):
            spk, book = 100 + i % 3, 200 + i
            d = corpus / part / str(spk) / str(book)
            d.mkdir(parents=True, exist_ok=True)
            uid = f"{spk}_{book}_000001_000000"
            _sine_wav(d / f"{uid}.wav", 0.6 + 0.1 * i, seed=i)
            (d / f"{uid}.normalized.txt").write_text("hello from libritts")
    data_dir = tmp_path / "data"
    env = dict(os.environ)
    env.update(stage="1", stop_stage="3", corpus_dir=str(corpus),
               text_extractor="char", data_dir=str(data_dir),
               train_parts="train-clean-100")
    proc = subprocess.run(
        ["bash", str(REPO / "egs/libritts/prepare.sh")],
        env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout + proc.stderr

    from valle_tpu.data.manifests import CutSet

    cuts = CutSet.from_file(data_dir / "tokenized" / "cuts_train.jsonl.gz")
    assert len(cuts) == 6 and cuts[0].tokens
    assert cuts[0].load_features().shape[1] == 8
    assert len(CutSet.from_file(
        data_dir / "tokenized" / "cuts_dev.jsonl.gz")) == 2


def test_libritts_run_sh_end_to_end(tmp_path):
    """The one-command real-data drill (egs/libritts/run.sh: prepare ->
    AR stage -> NAR stage -> demo synthesis) executes END TO END on a
    synthetic corpus with shrunken model dims — the command surface the
    day real data + hardware exist (README "drills" section; reference
    README.md:84-129). Asserts a demo wav lands."""
    corpus = tmp_path / "LibriTTS"
    for part, n in (("train-clean-100", 6), ("dev-clean", 2),
                    ("test-clean", 2)):
        for i in range(n):
            spk, book = 100 + i % 3, 300 + i
            d = corpus / part / str(spk) / str(book)
            d.mkdir(parents=True, exist_ok=True)
            uid = f"{spk}_{book}_000001_000000"
            _sine_wav(d / f"{uid}.wav", 0.6 + 0.1 * i, seed=i)
            (d / f"{uid}.normalized.txt").write_text("hello from libritts")
    data_dir = tmp_path / "data"
    exp_dir = tmp_path / "exp"
    env = dict(os.environ)
    env.update(
        stage="1", stop_stage="6", corpus_dir=str(corpus),
        text_extractor="char", data_dir=str(data_dir),
        train_parts="train-clean-100", exp_dir=str(exp_dir),
        num_epochs_ar="1", num_epochs_nar="1",
        max_duration_ar="4", max_duration_nar="4",
        dtype_ar="float32", dtype_nar="float32",
        model_args=("--model-name valle --share-embedding true "
                    "--norm-first true --add-prenet false "
                    "--decoder-dim 32 --nhead 2 --num-decoder-layers 2 "
                    "--prefix-mode 1"),
        train_extra=("--warmup-steps 2 --accumulate-grad-steps 1 "
                     "--num-buckets 2 --valid-interval 4 "
                     "--filter-min-duration 0.1"),
        infer_extra="--text-extractor char --max-gen-len 16",
        demo_text="hello from libritts",
    )
    proc = subprocess.run(
        ["bash", str(REPO / "egs/libritts/run.sh")],
        env=env, capture_output=True, text=True, timeout=2400)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    wavs = list((exp_dir / "demos").glob("*.wav"))
    assert wavs, f"no demo wav produced: {proc.stdout[-2000:]}"


def test_aishell1_prepare_sh(tmp_path):
    """AIShell-1 layout: wav/{split}/S*/*.wav + transcript file."""
    corpus = tmp_path / "aishell"
    lines = []
    for split, n in (("train", 5), ("dev", 2), ("test", 2)):
        for i in range(n):
            spk = f"S{i % 2:04d}"
            d = corpus / "wav" / split / spk
            d.mkdir(parents=True, exist_ok=True)
            uid = f"BAC009{split[:2].upper()}{i:04d}"
            _sine_wav(d / f"{uid}.wav", 0.5 + 0.1 * i, sr=16000, seed=i)
            lines.append(f"{uid} 你 好 世 界")
    tdir = corpus / "transcript"
    tdir.mkdir(parents=True)
    (tdir / "aishell_transcript_v0.8.txt").write_text(
        "\n".join(lines), encoding="utf-8")
    data_dir = tmp_path / "data"
    env = dict(os.environ)
    env.update(stage="1", stop_stage="3", corpus_dir=str(corpus),
               text_extractor="char", data_dir=str(data_dir))
    proc = subprocess.run(
        ["bash", str(REPO / "egs/aishell1/prepare.sh")],
        env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout + proc.stderr

    from valle_tpu.data.manifests import CutSet

    cuts = CutSet.from_file(data_dir / "tokenized" / "cuts_train.jsonl.gz")
    assert len(cuts) == 5
    assert cuts[0].tokens  # char backend over the hanzi transcript
    # 16 kHz source resampled to 24 kHz before EnCodec
    assert cuts[0].load_features().shape[1] == 8
