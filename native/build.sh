#!/bin/sh
# Build the native host components (C++ BVH builder).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libbvh.so bvh.cpp
echo "built native/libbvh.so"
