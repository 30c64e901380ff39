#!/usr/bin/env bash
# Run the test suite (reference parity: reference has test.sh running its
# three unittest files; ours runs the full pytest suite on a virtual
# 8-device CPU mesh).
set -e
cd "$(dirname "$0")"
python3 -m pytest tests/ -q "$@"
