#!/bin/sh
# Build the native runtime library (libics_runtime.so) in-place.
set -e
cd "$(dirname "$0")"
cmake -S . -B build -G Ninja >/dev/null
cmake --build build >/dev/null
echo "built: $(pwd)/libics_runtime.so"
