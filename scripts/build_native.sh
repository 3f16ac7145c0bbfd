#!/usr/bin/env bash
# Build the native C++ components into levelsetpy_tpu/_native/.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p levelsetpy_tpu/_native
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    native/marching_tet.cpp \
    -o levelsetpy_tpu/_native/libmarching.so
echo "built levelsetpy_tpu/_native/libmarching.so"
