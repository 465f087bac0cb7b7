#!/bin/sh
# Build the native DSP library. Output: native/libtaco_dsp.so
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -o libtaco_dsp.so mel_extract.cc
echo "built $(pwd)/libtaco_dsp.so"
