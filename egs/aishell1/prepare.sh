#!/usr/bin/env bash
# AIShell-1 recipe (Chinese; parity with reference egs/aishell1: pypinyin
# initials/finals text frontend). Expects the corpus at $corpus_dir.
set -eou pipefail

stage=1
stop_stage=3
corpus_dir=${corpus_dir:-download/aishell/data_aishell}
manifests=data/manifests
tokenized=data/tokenized

cd "$(dirname "$0")"
export PYTHONPATH="$(pwd)/../..:${PYTHONPATH:-}"

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  python3 -m valle_tpu.bin.prepare_manifests \
    --dataset aishell1 --corpus-dir "$corpus_dir" --output-dir $manifests
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  python3 -m valle_tpu.bin.tokenizer \
    --src-dir $manifests --output-dir $tokenized \
    --audio-extractor Encodec \
    --text-extractor pypinyin_initials_finals \
    --batch-duration 400
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  python3 -m valle_tpu.bin.display_manifest_statistics \
    --manifest-dir $tokenized
fi
