#!/usr/bin/env bash
# Build the native host runtime: native/libmhspgemm_host.so
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -fopenmp -shared -fPIC -Wall \
    -o libmhspgemm_host.so host_runtime.cpp
echo "built $(pwd)/libmhspgemm_host.so"
