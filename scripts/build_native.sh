#!/usr/bin/env bash
# Build the native host-side data kernels → native/liblimuc_io.so
set -euo pipefail
cd "$(dirname "$0")/.."
g++ -O3 -march=native -shared -fPIC native/limuc_io.cpp -o native/liblimuc_io.so
echo "built native/liblimuc_io.so"
