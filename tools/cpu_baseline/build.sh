#!/bin/sh
# Build the CPU baseline harness: reference core compiled in place from
# /root/reference (read-only) + Linux shims + our driver. -O2 matches the
# reference's optimized build (reference Makefile:3).
set -e
cd "$(dirname "$0")"
mkdir -p build
g++ -O2 -std=gnu++17 -fpermissive \
    -I shims -I /root/reference/render-cpp \
    /root/reference/render-cpp/render.cpp harness.cpp \
    -o build/cpu_baseline -ldl -lm
echo "built tools/cpu_baseline/build/cpu_baseline"
