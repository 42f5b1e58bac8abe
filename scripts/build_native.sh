#!/bin/sh
# Build the native GGUF dequant library (native/libgguf_native.so).
set -e
cd "$(dirname "$0")/.."
g++ -O3 -fPIC -shared -fopenmp -o native/libgguf_native.so native/gguf_native.cpp
echo "built native/libgguf_native.so"
