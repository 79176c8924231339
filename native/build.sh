#!/usr/bin/env bash
# Build the native frontend shared library.
set -euo pipefail
cd "$(dirname "$0")"
mkdir -p ../freeze_omni_tpu/frontend/_native
g++ -O3 -march=native -shared -fPIC -o \
  ../freeze_omni_tpu/frontend/_native/libfofrontend.so \
  frontend/fbank.cc frontend/resample.cc frontend/vad.cc
echo "built freeze_omni_tpu/frontend/_native/libfofrontend.so"
