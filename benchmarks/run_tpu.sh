#!/usr/bin/env bash
# Run a python script against the (exclusive, slow-to-release) tunnel TPU,
# retrying while the previous process's chip grant drains or the tunnel is
# out. Usage: benchmarks/run_tpu.sh script.py [args...]
#   RUN_TPU_ATTEMPTS   max attempts (default 40; failed attempts can hang
#                      ~25 min internally during a tunnel outage, so the
#                      default already spans multi-hour outages)
#   RUN_TPU_SLEEP      seconds between attempts (default 45)
set -u
cd "$(dirname "$0")/.."
# NOTE: append, never clobber — /root/.axon_site on PYTHONPATH carries the
# sitecustomize that registers the TPU backend; dropping it yields
# "Backend 'axon' is not in the list of known backends".
export PYTHONPATH="$(pwd):${PYTHONPATH:-}"
attempts="${RUN_TPU_ATTEMPTS:-40}"
pause="${RUN_TPU_SLEEP:-45}"
# Stream output to a scratch file instead of capturing: `tail -f` it to
# watch live progress (a hung backend init writes nothing; a real run
# prints per-variant lines as they complete).
scratch=$(mktemp /tmp/run_tpu.XXXXXX.log)
echo "[run_tpu] live output: tail -f $scratch" >&2
trap 'rm -f "$scratch"' EXIT
for attempt in $(seq 1 "$attempts"); do
  python3 "$@" >"$scratch" 2>&1
  rc=$?
  # Two observed "chip not ready" shapes: the sitecustomize swallowing the
  # claim failure ("not in the list of known backends") and the PJRT plugin
  # surfacing it directly ("Unable to initialize backend 'axon':
  # UNAVAILABLE"). Both mean the grant hasn't drained / tunnel is out.
  if grep -qE "not in the list of known backends|Unable to initialize backend 'axon'" "$scratch"; then
    echo "[run_tpu] $(date -u +%H:%M:%S) chip busy (attempt $attempt/$attempts); retrying in $pause s" >&2
    sleep "$pause"
    continue
  fi
  cat "$scratch"
  exit $rc
done
echo "[run_tpu] $(date -u +%H:%M:%S) chip never became available after $attempts attempts" >&2
exit 1
