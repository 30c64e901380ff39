#!/usr/bin/env bash
# Run a python script against the (exclusive, slow-to-release) tunnel TPU,
# retrying while the previous process's chip grant drains.
# Usage: benchmarks/run_tpu.sh script.py [args...]
set -u
cd "$(dirname "$0")/.."
# NOTE: append, never clobber — /root/.axon_site on PYTHONPATH carries the
# sitecustomize that registers the TPU backend; dropping it yields
# "Backend 'axon' is not in the list of known backends".
export PYTHONPATH="$(pwd):${PYTHONPATH:-}"
for attempt in $(seq 1 40); do
  out=$(python3 "$@" 2>&1)
  rc=$?
  # Two observed "chip not ready" shapes: the sitecustomize swallowing the
  # claim failure ("not in the list of known backends") and the PJRT plugin
  # surfacing it directly ("Unable to initialize backend 'axon':
  # UNAVAILABLE"). Both mean the previous grant hasn't drained — retry.
  if echo "$out" | grep -qE "not in the list of known backends|Unable to initialize backend 'axon'"; then
    echo "[run_tpu] chip busy (attempt $attempt); retrying in 45 s" >&2
    sleep 45
    continue
  fi
  echo "$out"
  exit $rc
done
echo "[run_tpu] chip never became available" >&2
exit 1
