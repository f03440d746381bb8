#!/bin/sh
# Build the native runtime components.
set -e
cd "$(dirname "$0")"
g++ -O3 -fPIC -shared -std=c++17 -o libtumloader.so tum_loader.cpp -lz -lpthread
echo "built native/libtumloader.so"
