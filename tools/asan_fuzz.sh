#!/bin/bash
# Rebuild the native entropy stages with AddressSanitizer and replay the
# mutation/fuzz corpus plus the native unit tests through them.
#
# Reproduces the "ASAN-clean" claim in one command. The replay
# (tools/asan_replay.py) drives all four native entropy stages over real,
# mirror-encoded, mutated, and truncated inputs WITHOUT importing jax —
# jaxlib's compiler aborts under a preloaded ASAN runtime, and the jax dense
# stages contain none of our native code.
#
# The instrumented .so is built separately (libsymphonia_host_asan.so) and
# injected via SYMPHONIA_TPU_NATIVE_SO; libasan is preloaded so the
# uninstrumented python binary can host it. Leak detection is off (the
# CPython interpreter's arena allocations would drown the report).
set -euo pipefail
cd "$(dirname "$0")/.."

ASAN_SO=native/libsymphonia_host_asan.so
echo "[asan_fuzz] building $ASAN_SO"
g++ -O1 -g -fsanitize=address -fno-omit-frame-pointer -march=native \
    -shared -fPIC -o "$ASAN_SO" native/*.cpp

LIBASAN=$(g++ -print-file-name=libasan.so)
export SYMPHONIA_TPU_NATIVE_SO="$PWD/$ASAN_SO"
export LD_PRELOAD="$LIBASAN"
export ASAN_OPTIONS="detect_leaks=0:abort_on_error=1:strict_string_checks=1"

python tools/asan_replay.py "$@"
echo "[asan_fuzz] ASAN-clean"
