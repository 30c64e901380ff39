#!/usr/bin/env bash
# LibriTTS recipe (parity with reference egs/libritts/prepare.sh: 7 parts,
# 555 h). Expects the corpus extracted at $corpus_dir.
set -eou pipefail

stage=1
stop_stage=3
corpus_dir=${corpus_dir:-download/LibriTTS}
train_parts=${train_parts:-train-clean-100,train-clean-360,train-other-500}
manifests=data/manifests
tokenized=data/tokenized

cd "$(dirname "$0")"
export PYTHONPATH="$(pwd)/../..:${PYTHONPATH:-}"

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  echo "Stage 1: prepare manifests"
  python3 -m valle_tpu.bin.prepare_manifests \
    --dataset libritts --corpus-dir "$corpus_dir" \
    --libritts-train-parts "$train_parts" --output-dir $manifests
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  echo "Stage 2: tokenize (EnCodec on TPU + espeak)"
  python3 -m valle_tpu.bin.tokenizer \
    --src-dir $manifests --output-dir $tokenized \
    --audio-extractor Encodec --text-extractor espeak \
    --batch-duration 400
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  python3 -m valle_tpu.bin.display_manifest_statistics \
    --manifest-dir $tokenized
fi
