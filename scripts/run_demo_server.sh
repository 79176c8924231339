#!/usr/bin/env bash
# Duplex dialog-state demo server (role of the reference's
# scripts/run_demo_server.sh + start_enhanced_demo.sh, which target the absent
# bin/server.py).
set -euo pipefail
cd "$(dirname "$0")/.."

PRESET="${PRESET:-flagship}"
PORT="${PORT:-8765}"

exec python -m freeze_omni_tpu.bin.serve \
  --preset "$PRESET" --port "$PORT" --max_sessions "${MAX_SESSIONS:-8}"
