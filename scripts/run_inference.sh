#!/usr/bin/env bash
# Offline single-turn speech-to-speech: wav in -> wav out
# (role of the reference's scripts/run_inference.sh)
set -euo pipefail
cd "$(dirname "$0")/.."

PRESET="${PRESET:-flagship}"
INPUT_WAV="${1:?usage: run_inference.sh input.wav output.wav}"
OUTPUT_WAV="${2:?usage: run_inference.sh input.wav output.wav}"

exec python -m freeze_omni_tpu.bin.offline_infer \
  --preset "$PRESET" \
  --input_wav "$INPUT_WAV" \
  --output_wav "$OUTPUT_WAV" \
  --top_k 5 --top_p 0.8 --temperature 0.7
