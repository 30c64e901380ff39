#!/usr/bin/env python3
"""Full-framework smoke on the real chip: synthetic dataset -> offline
tokenizer CLI (EnCodec encode on TPU) -> trainer CLI (ScaledAdam steps on
TPU) -> infer CLI (KV-cache decode + EnCodec synthesis on TPU).

Run via benchmarks/run_tpu.sh. Prints PASS/step timings.
"""

import sys
import tempfile
import time
from pathlib import Path

import numpy as np


def run_cli(main, argv):
    old = sys.argv
    sys.argv = argv
    try:
        main()
    finally:
        sys.argv = old


def main():
    from valle_tpu import native
    from valle_tpu.data.manifests import Cut, CutSet, RecordingRef

    root = Path(tempfile.mkdtemp(prefix="tpu_smoke_"))
    wav_dir = root / "wavs"
    wav_dir.mkdir()
    rng = np.random.RandomState(0)
    texts = ["hello world", "testing speech on tpu", "one two three",
             "synthesis works", "tiny data", "more text here",
             "sample utterance", "the quick fox", "jumps over",
             "lazy dogs sleep"]
    cuts = []
    for i, text in enumerate(texts):
        sr = 24_000
        n = int((0.8 + 0.15 * (i % 4)) * sr)
        t = np.arange(n) / sr
        wav = (0.3 * np.sin(2 * np.pi * (200 + 40 * i) * t)
               + 0.05 * rng.randn(n)).astype(np.float32)
        p = wav_dir / f"utt{i:02d}.wav"
        native.write_wav(p, wav, sr)
        cuts.append(Cut(id=f"spk{i % 2}_000_{i:03d}_000", duration=n / sr,
                        text=text, speaker=f"spk{i % 2}",
                        recording=RecordingRef(str(p), sr, n)))
    man = root / "manifests"
    CutSet(cuts[:8]).to_file(man / "cuts_train.jsonl.gz")
    CutSet(cuts[8:]).to_file(man / "cuts_dev.jsonl.gz")

    from valle_tpu.bin.tokenizer import main as tok_main

    t0 = time.perf_counter()
    run_cli(tok_main, ["tokenizer", "--src-dir", str(man),
                       "--output-dir", str(root / "tok"),
                       "--text-extractor", "char",
                       "--audio-extractor", "Encodec",
                       "--batch-duration", "8"])
    print(f"[tokenize on TPU] {time.perf_counter() - t0:.1f} s", flush=True)

    from valle_tpu.bin.trainer import main as trainer_main

    t0 = time.perf_counter()
    run_cli(trainer_main, [
        "trainer", "--manifest-dir", str(root / "tok"),
        "--text-tokens", str(root / "tok" / "unique_text_tokens.k2symbols"),
        "--exp-dir", str(root / "exp"),
        "--model-name", "valle", "--prefix-mode", "1",
        "--decoder-dim", "256", "--nhead", "4", "--num-decoder-layers", "4",
        "--train-stage", "0", "--num-epochs", "1",
        "--max-duration", "20", "--num-buckets", "2",
        "--filter-min-duration", "0.1", "--filter-max-duration", "5.0",
        "--base-lr", "0.05", "--warmup-steps", "10",
        "--dtype", "bfloat16",
        "--save-every-n", "50", "--valid-interval", "50",
        "--log-interval", "1", "--num-workers", "0",
        "--max-steps-per-epoch", "8",
        "--tensorboard", "false", "--oom-check", "true"])
    print(f"[train 8 steps on TPU] {time.perf_counter() - t0:.1f} s",
          flush=True)

    from valle_tpu.bin.infer import main as infer_main

    t0 = time.perf_counter()
    run_cli(infer_main, [
        "infer", "--checkpoint", str(root / "exp" / "epoch-1"),
        "--text-tokens", str(root / "tok" / "unique_text_tokens.k2symbols"),
        "--text-extractor", "char",
        "--text-prompts", "hello world",
        "--audio-prompts", str(wav_dir / "utt00.wav"),
        "--text", "testing speech on tpu",
        "--top-k", "5", "--max-gen-len", "64",
        "--output-dir", str(root / "demos")])
    print(f"[infer on TPU] {time.perf_counter() - t0:.1f} s", flush=True)

    outs = list((root / "demos").glob("*.wav"))
    assert outs, "no wav produced"
    wav, sr = native.read_wav(outs[0])
    print(f"PASS: produced {outs[0]} ({wav.shape[0] / sr:.2f} s @ {sr} Hz)",
          flush=True)


if __name__ == "__main__":
    main()
