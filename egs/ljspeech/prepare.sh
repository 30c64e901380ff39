#!/usr/bin/env bash
# LJSpeech recipe (debug-scale; parity with reference egs/ljspeech/prepare.sh).
# Expects the corpus already downloaded/extracted at $corpus_dir
# (https://keithito.com/LJ-Speech-Dataset/ LJSpeech-1.1).
set -eou pipefail

stage=1
stop_stage=3
corpus_dir=${corpus_dir:-download/LJSpeech-1.1}
manifests=data/manifests
tokenized=data/tokenized

cd "$(dirname "$0")"
export PYTHONPATH="$(pwd)/../..:${PYTHONPATH:-}"

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  echo "Stage 1: prepare manifests (12500/200/400 split)"
  python3 -m valle_tpu.bin.prepare_manifests \
    --dataset ljspeech --corpus-dir "$corpus_dir" --output-dir $manifests
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  echo "Stage 2: tokenize (EnCodec codes on TPU + espeak phonemes)"
  python3 -m valle_tpu.bin.tokenizer \
    --src-dir $manifests --output-dir $tokenized \
    --audio-extractor Encodec --text-extractor espeak \
    --batch-duration 400
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  echo "Stage 3: manifest statistics"
  python3 -m valle_tpu.bin.display_manifest_statistics \
    --manifest-dir $tokenized
fi
