#!/usr/bin/env bash
# Trainer with checkpoint/resume on synthetic duplex fixtures.
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m freeze_omni_tpu.bin.train \
  --preset "${PRESET:-tiny}" --steps "${STEPS:-100}" \
  --ckpt_dir "${CKPT_DIR:-./checkpoints_out}" "$@"
