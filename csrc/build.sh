#!/usr/bin/env bash
# Build the native data-loader core.
set -euo pipefail
cd "$(dirname "$0")"
mkdir -p build
g++ -O3 -shared -fPIC -std=c++17 nifti_native.cpp -o build/libnifti_native.so -lz
echo "built: $(pwd)/build/libnifti_native.so"
