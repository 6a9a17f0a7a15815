#!/bin/sh
# Build the native window-sweep library next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libsert_native.so window_sweep.cc text.cc
echo "built $(pwd)/libsert_native.so"
