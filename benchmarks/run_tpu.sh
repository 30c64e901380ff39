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
for attempt in $(seq 1 12); do
  out=$(python3 "$@" 2>&1)
  rc=$?
  if echo "$out" | grep -q "not in the list of known backends"; then
    echo "[run_tpu] chip busy (attempt $attempt); retrying in 45 s" >&2
    sleep 45
    continue
  fi
  echo "$out"
  exit $rc
done
echo "[run_tpu] chip never became available" >&2
exit 1
