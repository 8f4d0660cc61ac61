#!/bin/sh
# Build the gd3d native host-runtime library.
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -pthread -std=c++17 -o libgd3d_native.so gd3d_native.cpp
echo "built $(pwd)/libgd3d_native.so"
