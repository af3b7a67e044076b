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
    -o "$BUILD/libschwarzwald_native_tsan.so" \
    "$HERE/src/schwarzwald_native.cpp" "$HERE/src/laz.cpp"
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
u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
lib.laz_encode_stream.argtypes = [u8p, ctypes.c_int64, ctypes.c_int32,
                                  u16p, i32p, ctypes.c_int32, u8p,
                                  ctypes.c_int64]
lib.laz_encode_stream.restype = ctypes.c_int64
lib.laz_decode_points.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64,
                                  ctypes.c_int32, u16p, i32p,
                                  ctypes.c_int32, u8p]
lib.laz_decode_points.restype = ctypes.c_int64

rng = np.random.default_rng(0)

def laz_worker():
    # concurrent encode/decode of independent streams: the codec must be
    # state-free across calls (each invocation owns its models)
    n = 20_000
    rec = np.zeros(n * 20, dtype=np.uint8)
    xyz = np.cumsum(rng.integers(-9, 10, (n, 3)), axis=0).astype(np.int32)
    rec.view(np.int32).reshape(n, 5)[:, :3] = xyz
    types = np.array([6], dtype=np.uint16)
    sizes = np.array([20], dtype=np.int32)
    out = np.empty(n * 40 + 65536, dtype=np.uint8)
    for _ in range(3):
        written = lib.laz_encode_stream(rec, n, 5000, types, sizes, 1,
                                        out, out.size)
        assert written > 8
        back = np.empty(n * 20, dtype=np.uint8)
        rc = lib.laz_decode_points(out[8:written], written - 8, n, 5000,
                                   types, sizes, 1, back)
        assert rc > 0
        assert np.array_equal(back, rec)

def worker():
    keys = rng.integers(0, 1 << 63, 200_000, dtype=np.uint64)
    out = np.empty(keys.size, dtype=np.int64)
    for _ in range(3):
        lib.radix_argsort_u64(keys, keys.size, out)
    assert (np.diff(keys[out].astype(np.int64)) >= 0).all()

threads = [threading.Thread(target=worker) for _ in range(4)] \
    + [threading.Thread(target=laz_worker) for _ in range(2)]
for t in threads: t.start()
for t in threads: t.join()
print("tsan stress run completed without reports")
EOF
