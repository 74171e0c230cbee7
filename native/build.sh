#!/bin/sh
# Build the native host libraries (the Python bindings also rebuild them
# automatically whenever the .cpp is newer than the .so).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -pthread -o libcelt_host.so celt_host.cpp
g++ -O3 -march=native -shared -fPIC -pthread -o libsilk_host.so silk_host.cpp
g++ -O3 -march=native -shared -fPIC -pthread -o libopus_host.so \
    celt_host.cpp silk_host.cpp opus_host.cpp
echo "built libcelt_host.so libsilk_host.so libopus_host.so"
