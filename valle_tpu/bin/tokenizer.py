#!/usr/bin/env python3
"""Offline dataset tokenization CLI: phonemize text + EnCodec-encode audio.

Capability parity with reference ``valle/bin/tokenizer.py``: per partition,
extract audio tokens (batched EnCodec encode — on TPU here — stored in
HDF5, reference :198-213) or BigVGAN fbank features (:208), phonemize every
supervision into the cut (:226-242), accumulate the unique symbol table
(``unique_text_tokens.k2symbols``, :247-254), write
``cuts_{partition}.jsonl.gz``.

Input manifests are our lhotse-lite jsonl cut manifests with recording
refs + raw text (see ``valle_tpu/bin/prepare_*.py`` builders in egs/).
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np

from ..utils import SymbolTable, setup_logger


def get_args():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--src-dir", type=Path, default=Path("data/manifests"),
                        help="Dir with raw cuts_{partition}.jsonl.gz "
                             "(recordings + text, no features yet).")
    parser.add_argument("--output-dir", type=Path,
                        default=Path("data/tokenized"))
    parser.add_argument("--partitions", type=str, default="train,dev,test",
                        help="Comma-separated partition names.")
    parser.add_argument("--audio-extractor", type=str, default="Encodec",
                        help="Encodec or Fbank.")
    parser.add_argument("--text-extractor", type=str, default="espeak",
                        help="espeak | pypinyin | pypinyin_initials_finals "
                             "| char")
    parser.add_argument("--language", type=str, default="en-us")
    parser.add_argument("--encodec-weights", type=str, default=None)
    parser.add_argument("--batch-duration", type=float, default=120.0,
                        help="Seconds of audio per encode batch.")
    parser.add_argument("--text-workers", type=int, default=0,
                        help="Parallel phonemizer processes (0 = serial). "
                             "Closes the reference's open TODO "
                             "'Parallelize bin/tokenizer.py' "
                             "(reference README.md:144): espeak "
                             "phonemization is the serial bottleneck "
                             "there; here it fans out over worker "
                             "processes while the audio path stays "
                             "batched on the TPU.")
    return parser.parse_args()


_WORKER_TOKENIZER = None


def _phonemize_init(language: str, backend: str):
    """Pool initializer: each worker builds its own espeak/pypinyin
    backend (the phonemizer backends are not thread-safe; process
    isolation sidesteps that). Workers never touch the TPU."""
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    global _WORKER_TOKENIZER
    from ..data import TextTokenizer

    _WORKER_TOKENIZER = TextTokenizer(language=language, backend=backend)


def _phonemize_one(text: str):
    from ..data.tokenizer import tokenize_text

    return tokenize_text(_WORKER_TOKENIZER, text)


def phonemize_texts(texts, *, language: str, backend: str, workers: int,
                    serial_tokenizer=None, _force_pool: bool = False):
    """Tokenize ``texts`` -> list of token lists, fanning out over
    ``workers`` processes when workers > 1 (identical output to serial:
    pinned by tests/test_data.py::test_parallel_phonemize_matches_serial).
    """
    if workers and workers > 1 and (backend != "char" or _force_pool):
        # char is grapheme splitting (~3k texts/s serial, measured
        # benchmarks/bench_tokenize.py) — worker startup can never pay
        # for it. The fan-out exists for espeak/pypinyin, whose per-text
        # cost is orders of magnitude higher.
        import multiprocessing as mp

        ctx = mp.get_context("spawn")  # never fork a live TPU client
        with ctx.Pool(workers, initializer=_phonemize_init,
                      initargs=(language, backend)) as pool:
            return pool.map(_phonemize_one, texts, chunksize=16)
    from ..data.tokenizer import tokenize_text

    if serial_tokenizer is None:
        from ..data import TextTokenizer

        serial_tokenizer = TextTokenizer(language=language, backend=backend)
    return [tokenize_text(serial_tokenizer, t) for t in texts]


def main():
    args = get_args()
    setup_logger()
    from ..data import CutSet, TextTokenizer
    from ..data.manifests import FeatureRef, Hdf5FeatureStore
    from ..data.tokenizer import AudioTokenExtractor

    args.output_dir.mkdir(parents=True, exist_ok=True)
    text_tokenizer = TextTokenizer(language=args.language,
                                   backend=args.text_extractor)

    if args.audio_extractor == "Encodec":
        extractor = AudioTokenExtractor(weights_path=args.encodec_weights)
        storage_suffix = "encodec"
    else:
        from ..data.fbank import get_fbank_extractor

        extractor = get_fbank_extractor()
        storage_suffix = "fbank"

    unique_symbols = set()

    for part in args.partitions.split(","):
        part = part.strip()
        src = args.src_dir / f"cuts_{part}.jsonl.gz"
        if not src.exists():
            logging.warning(f"missing {src}; skipping partition {part}")
            continue
        cuts = CutSet.from_file(src)
        logging.info(f"partition {part}: {len(cuts)} cuts")

        storage_path = args.output_dir / (
            f"{storage_suffix}_{part}.h5")
        new_cuts = []
        with Hdf5FeatureStore(storage_path).writer() as writer:
            batch, batch_dur = [], 0.0

            def flush(batch):
                if not batch:
                    return
                waves = []
                sr = None
                for c in batch:
                    from .. import native

                    wav, wsr = native.read_wav(c.recording.path)
                    mono = native.to_mono(wav)
                    if sr is None:
                        sr = wsr
                    elif wsr != sr:
                        # mixed-sample-rate corpora: normalize to the
                        # batch's first rate here (the extractor then
                        # resamples the whole batch to its target rate)
                        mono = native.resample(mono, wsr, sr)
                    waves.append(mono)
                if hasattr(extractor, "extract_batch"):
                    feats = extractor.extract_batch(waves, sr)
                else:
                    feats = [extractor.extract(w, sr) for w in waves]
                for c, f in zip(batch, feats):
                    writer.write(c.id, f)
                    c.features = FeatureRef(
                        str(storage_path), c.id, int(f.shape[0]),
                        int(f.shape[1]), float(extractor.frame_shift))
                    new_cuts.append(c)

            for cut in cuts:
                batch.append(cut)
                batch_dur += cut.duration
                if batch_dur >= args.batch_duration:
                    flush(batch)
                    batch, batch_dur = [], 0.0
            flush(batch)

        # phonemize (reference :226-242), optionally fanned out over
        # worker processes (--text-workers)
        for c in new_cuts:
            assert c.text is not None, f"cut {c.id} has no text"
        token_lists = phonemize_texts(
            [c.text for c in new_cuts], language=args.language,
            backend=args.text_extractor, workers=args.text_workers,
            serial_tokenizer=text_tokenizer)
        for c, tokens in zip(new_cuts, token_lists):
            c.tokens = tokens
            unique_symbols.update(tokens)

        out = args.output_dir / f"cuts_{part}.jsonl.gz"
        CutSet(new_cuts).to_file(out)
        logging.info(f"wrote {out}")

    table = SymbolTable()
    for s in sorted(unique_symbols):
        table.add(s)
    table.to_file(args.output_dir / "unique_text_tokens.k2symbols")
    logging.info(
        f"wrote symbol table with {len(unique_symbols)} symbols to "
        f"{args.output_dir}/unique_text_tokens.k2symbols")


if __name__ == "__main__":
    main()
