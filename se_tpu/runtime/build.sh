#!/bin/sh
# Build the native runtime library next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -o libse_tpu_runtime.so wavio.cc
echo "built $(pwd)/libse_tpu_runtime.so"
