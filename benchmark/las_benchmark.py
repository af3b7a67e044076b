"""LAS I/O micro-benchmark harness.

Parity: LASBenchmark (schwarzwald/benchmark/las_benchmark/
LASBenchmark.cpp): read and write benchmarks over a LAS directory, in
sequential and file-parallel variants, printing duration, byte volume and
points/sec with metric-prefix formatting. Usage:

    python -m benchmark.las_benchmark <las-dir-or-file> [--mode read|write|all]
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from schwarzwald_tpu.core.aabb import AABB  # noqa: E402
from schwarzwald_tpu.core.pointbuffer import PointBuffer  # noqa: E402
from schwarzwald_tpu.io import las  # noqa: E402
from schwarzwald_tpu.util.parallel import parallel_transform  # noqa: E402
from schwarzwald_tpu.util.units import format_bytes, format_metric  # noqa: E402


def find_las_files(path: str):
    if os.path.isfile(path):
        return [path]
    return [os.path.join(root, f)
            for root, _, files in os.walk(path)
            for f in sorted(files)
            if f.lower().endswith((".las", ".laz"))]


def bench_read(files, parallel: bool):
    t0 = time.perf_counter()
    if parallel:
        buffers = parallel_transform(files, las.read_las, num_threads=4)
    else:
        buffers = [las.read_las(f) for f in files]
    elapsed = time.perf_counter() - t0
    points = sum(b.count for b in buffers)
    nbytes = sum(os.path.getsize(f) for f in files)
    label = "parallel" if parallel else "sequential"
    print(f"read {label}: {elapsed:.2f}s, {format_bytes(nbytes)}, "
          f"{format_metric(points / elapsed, 'pts/s')}")
    return buffers


def bench_write(buffers, out_dir: str, parallel: bool,
                compressed: bool = False):
    bounds = AABB()
    for b in buffers:
        if b.count:
            bounds.update_point(b.positions.min(axis=0))
            bounds.update_point(b.positions.max(axis=0))
    ext = ".laz" if compressed else ".las"

    def write_one(args):
        i, buf = args
        las.write_las(os.path.join(out_dir, f"out_{i}{ext}"), buf, bounds,
                      compressed=compressed)

    t0 = time.perf_counter()
    items = list(enumerate(buffers))
    if parallel:
        parallel_transform(items, write_one, num_threads=4)
    else:
        for item in items:
            write_one(item)
    elapsed = time.perf_counter() - t0
    points = sum(b.count for b in buffers)
    nbytes = sum(os.path.getsize(os.path.join(out_dir, f))
                 for f in os.listdir(out_dir))
    label = ("parallel" if parallel else "sequential") + (" laz" if compressed
                                                          else " las")
    print(f"write {label}: {elapsed:.2f}s, "
          f"{format_metric(points / elapsed, 'pts/s')}, "
          f"{format_bytes(nbytes)}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("path", nargs="?", default=None,
                    help="LAS file or directory (default: synthetic 1M)")
    ap.add_argument("--mode", default="all",
                    choices=["read", "write", "all"])
    ap.add_argument("--laz", action="store_true",
                    help="also benchmark LAZ (compressed) writes")
    args = ap.parse_args(argv)

    tmp = None
    if args.path is None:
        tmp = tempfile.mkdtemp(prefix="las_bench_")
        rng = np.random.default_rng(0)
        for i in range(4):
            buf = PointBuffer(rng.uniform(0, 1000, (250_000, 3)))
            las.write_las(os.path.join(tmp, f"gen_{i}.las"), buf,
                          AABB([0.0] * 3, [1000.0] * 3))
        args.path = tmp

    files = find_las_files(args.path)
    if not files:
        print("no LAS files found")
        return 1
    buffers = bench_read(files, parallel=False)
    if args.mode in ("read", "all"):
        bench_read(files, parallel=True)
    if args.mode in ("write", "all"):
        with tempfile.TemporaryDirectory() as out:
            bench_write(buffers, out, parallel=False)
        with tempfile.TemporaryDirectory() as out:
            bench_write(buffers, out, parallel=True)
        if args.laz:
            with tempfile.TemporaryDirectory() as out:
                bench_write(buffers, out, parallel=False, compressed=True)
            with tempfile.TemporaryDirectory() as out:
                bench_write(buffers, out, parallel=True, compressed=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
