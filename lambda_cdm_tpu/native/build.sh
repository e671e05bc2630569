#!/bin/sh
# Build the native runtime shared library (done automatically on first
# import of lambda_cdm_tpu.native; this script is for manual/CI builds).
set -e
cd "$(dirname "$0")"
g++ -O2 -std=c++17 -shared -fPIC -pthread -fvisibility=hidden \
    -o liblcdm_runtime.so lcdm_runtime.cpp
echo "built liblcdm_runtime.so"
