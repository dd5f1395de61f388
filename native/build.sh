#!/bin/bash
# Build the native host runtime -> .build/libslam_native.so
set -euo pipefail
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
OUT="$ROOT/.build"
mkdir -p "$OUT"
g++ -O3 -march=native -std=c++17 -shared -fPIC -pthread \
    "$ROOT/native/slam_native.cpp" -o "$OUT/libslam_native.so"
echo "built $OUT/libslam_native.so"
