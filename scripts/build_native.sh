#!/usr/bin/env bash
# Build the native scene-toolchain components (C++ -> shared libs via ctypes).
set -euo pipefail
cd "$(dirname "$0")/.."
SRC=real_time_ray_tracing_engine_tpu/native
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    -o "$SRC/libbvh.so" "$SRC/bvh_builder.cpp" "$SRC/ppm_io.cpp"
echo "built $SRC/libbvh.so"
