#!/bin/sh
# Build the native GGUF dequant library (codec_tpu/io/_native.so).
set -e
cd "$(dirname "$0")/.."
g++ -O3 -fPIC -shared -fopenmp -o codec_tpu/io/_native.so native/gguf_native.cpp
echo "built codec_tpu/io/_native.so"
