#!/bin/sh
# Build the native runtime library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -o libsln_native.so native.cpp
echo "built $(pwd)/libsln_native.so"
