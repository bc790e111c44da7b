#!/bin/sh
# Build + run the native parity harness (role of reference
# ops/conversion_test/run.sh): export fixtures from Python first via
#   python -c "from sdf_representation_tpu.export import *; ..."
# or use tests/test_export_native.py as the reference flow.
set -e
cmake -S "$(dirname "$0")" -B "$(dirname "$0")/build" -DCMAKE_BUILD_TYPE=Release
cmake --build "$(dirname "$0")/build" -j"$(nproc)"
echo "binaries: $(dirname "$0")/build/{parity_main,deeptrace,bench_native}"
