#!/usr/bin/env python3
"""Offline dataset tokenization throughput (VERDICT round-2 item 6).

The reference's known preprocessing bottleneck is SERIAL phonemization —
its README carries an open TODO "Parallelize bin/tokenizer.py"
(/root/reference/README.md:144) — and its EnCodec encode runs per-cut.
This bench measures our two-sided answer with numbers:

1. audio: batched EnCodec encode on the TPU via
   ``AudioTokenExtractor.extract_batch`` (cuts/s and audio-seconds/s,
   i.e. the offline-encode real-time factor);
2. text: host phonemization serial vs ``--text-workers`` process fan-out
   (char backend — espeak is absent in this env; the pool machinery is
   identical, and espeak's per-call cost is far higher, so the fan-out
   speedup is a LOWER bound for the espeak case).

Usage: benchmarks/run_tpu.sh benchmarks/bench_tokenize.py [n_utts]
       (CPU text-only mode: add "textonly")
"""

import json
import sys
import tempfile
import time

import numpy as np


def _slow_phonemize(text):
    """Stand-in for an espeak-priced backend: ~20 ms of real work per
    text, then grapheme splitting (espeak itself is absent in this
    image; per-text espeak cost is typically 10-50 ms)."""
    x = 0.0
    for i in range(200000):
        x += i * 1e-9
    return list(text.replace(" ", "_")) + [str(x)[:1]]


def main():
    args = sys.argv[1:]
    textonly = "textonly" in args
    nums = [a for a in args if a.isdigit()]
    n_utts = int(nums[0]) if nums else 64

    results = {}

    # ---- text: serial vs parallel phonemization ----------------------
    from valle_tpu.bin.tokenizer import phonemize_texts

    words = ("the quick brown fox jumps over a lazy dog while speech "
             "synthesis keeps running on tensor processing units").split()
    rng = np.random.RandomState(0)
    texts = [" ".join(rng.choice(words, size=24)) for _ in range(2000)]

    t0 = time.perf_counter()
    serial = phonemize_texts(texts, language="en-us", backend="char",
                             workers=0)
    dt_serial = time.perf_counter() - t0
    t0 = time.perf_counter()
    par = phonemize_texts(texts, language="en-us", backend="char",
                          workers=8, _force_pool=True)
    dt_par = time.perf_counter() - t0
    assert serial == par
    results["phonemize_char"] = {
        "texts": len(texts),
        "serial_texts_per_sec": round(len(texts) / dt_serial, 1),
        "workers8_texts_per_sec": round(len(texts) / dt_par, 1),
        "note": "char is ~free serially; the CLI auto-serializes it "
                "(worker startup cannot pay). Fan-out targets espeak.",
    }
    print(json.dumps(results["phonemize_char"]), flush=True)

    # synthetic expensive backend (~20 ms/text, espeak-like cost):
    # demonstrates the pool scaling the espeak day will see
    import multiprocessing as mp

    texts_slow = texts[:400]
    t0 = time.perf_counter()
    slow_serial = [_slow_phonemize(t) for t in texts_slow]
    dt_s = time.perf_counter() - t0
    with mp.get_context("spawn").Pool(8) as pool:
        t0 = time.perf_counter()
        slow_par = pool.map(_slow_phonemize, texts_slow, chunksize=16)
        dt_p = time.perf_counter() - t0
    assert slow_serial == slow_par
    import os

    cores = len(os.sched_getaffinity(0))
    results["phonemize_synthetic_20ms"] = {
        "texts": len(texts_slow),
        "serial_texts_per_sec": round(len(texts_slow) / dt_s, 1),
        "workers8_texts_per_sec": round(len(texts_slow) / dt_p, 1),
        "speedup": round(dt_s / dt_p, 2),
        "cpu_cores_available": cores,
        "note": ("this host exposes ONE schedulable core — process "
                 "fan-out cannot beat serial here by construction; the "
                 "speedup scales with cores on real preprocessing hosts"
                 if cores <= 1 else ""),
    }
    print(json.dumps(results["phonemize_synthetic_20ms"]), flush=True)
    if textonly:
        print(json.dumps(results))
        return

    # ---- audio: batched EnCodec encode on the TPU --------------------
    import jax  # noqa: F401  (claims the chip)

    from valle_tpu import native
    from valle_tpu.data.tokenizer import AudioTokenExtractor
    from valle_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    tmp = tempfile.mkdtemp(prefix="tokbench")
    sr = 24000
    waves = []
    durs = []
    for i in range(n_utts):
        dur = float(np.clip(rng.lognormal(np.log(5.0), 0.45), 1.0, 14.0))
        t = np.arange(int(dur * sr)) / sr
        wav = (0.3 * np.sin(2 * np.pi * (120 + i) * t)
               + 0.01 * rng.randn(len(t))).astype(np.float32)
        path = f"{tmp}/utt{i}.wav"
        native.write_wav(path, wav, sr)
        w, wsr = native.read_wav(path)
        waves.append(native.to_mono(w))
        durs.append(dur)

    extractor = AudioTokenExtractor()
    # batch like the CLI: ~120 s of audio per flush
    t0 = time.perf_counter()
    batch, bdur, n_done = [], 0.0, 0
    t_first = None
    for w, d in zip(waves, durs):
        batch.append(w)
        bdur += d
        if bdur >= 120.0:
            feats = extractor.extract_batch(batch, sr)
            n_done += len(feats)
            if t_first is None:
                t_first = time.perf_counter() - t0
            batch, bdur = [], 0.0
    if batch:
        feats = extractor.extract_batch(batch, sr)
        n_done += len(feats)
    dt = time.perf_counter() - t0
    total_audio = sum(durs)
    results["encode"] = {
        "cuts": n_done,
        "cuts_per_sec": round(n_done / dt, 2),
        "audio_seconds": round(total_audio, 1),
        "encode_rtf": round(total_audio / dt, 1),
        "first_batch_s (incl. compile)": round(t_first or dt, 1),
    }
    print(json.dumps(results["encode"]), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
