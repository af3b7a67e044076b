"""Async write-behind coherence and byte-identity.

The .pnts and LAS/LAZ sinks encode node payloads synchronously into
pooled buffers and push the open/write/close onto a small IO pool
(io/write_behind.py). These tests pin the contract: files are
byte-identical to the synchronous path (same encode parts), reads wait
for in-flight writes, and worker failures surface on the caller."""
import os

import numpy as np
import pytest

from schwarzwald_tpu.core.aabb import AABB
from schwarzwald_tpu.core.attributes import OutputFormat, PointAttribute
from schwarzwald_tpu.core.pointbuffer import PointBuffer
from schwarzwald_tpu.io import las
from schwarzwald_tpu.io.write_behind import AsyncFileWriter

BOUNDS = AABB([0.0, 0.0, 0.0], [100.0, 100.0, 100.0])


def _cloud(rng, n=5000, rgb=True):
    buf = PointBuffer(rng.uniform(1, 99, (n, 3)))
    buf.set_column(PointAttribute.Intensity,
                   rng.integers(0, 65535, n, dtype=np.uint16))
    if rgb:
        buf.set_column(PointAttribute.RGB,
                       rng.integers(0, 65535, (n, 3), dtype=np.uint16))
    return buf


@pytest.mark.parametrize("compressed", [False, True])
@pytest.mark.parametrize("extended", [False, True])
def test_encode_las_into_matches_write_las(tmp_path, rng, compressed,
                                           extended):
    buf = _cloud(rng)
    ref = tmp_path / ("ref.laz" if compressed else "ref.las")
    las.write_las(str(ref), buf, BOUNDS, compressed=compressed,
                  extended=extended)
    out, total = las.encode_las_into(buf, BOUNDS, bytearray,
                                     compressed=compressed,
                                     extended=extended)
    assert bytes(out[:total]) == ref.read_bytes()


def test_write_behind_output_identical_to_sync(tmp_path, rng, monkeypatch):
    """Full tiler run, ENTWINE_LAS and 3DTILES: the async and synchronous
    write paths must produce byte-identical output trees."""
    from schwarzwald_tpu.process.tiler_process import (TilerArguments,
                                                       TilerProcess)

    src = tmp_path / "in.las"
    las.write_las(str(src), _cloud(rng, 30_000), BOUNDS)

    def run(out, fmt, sync):
        if sync:
            monkeypatch.setenv("SCHWARZWALD_NO_WRITE_BEHIND", "1")
        else:
            monkeypatch.delenv("SCHWARZWALD_NO_WRITE_BEHIND",
                               raising=False)
        TilerProcess(TilerArguments(
            sources=[str(src)], output_directory=str(out), spacing=5.0,
            max_points_per_node=400, sampling_strategy="RANDOM_GRID",
            output_format=fmt)).run()
        files = {}
        for root, _, names in os.walk(out):
            for name in names:
                p = os.path.join(root, name)
                files[os.path.relpath(p, out)] = open(p, "rb").read()
        return files

    for fmt in (OutputFormat.ENTWINE_LAS, OutputFormat.CZM_3DTILES):
        sync_files = run(tmp_path / f"sync_{fmt.name}", fmt, True)
        async_files = run(tmp_path / f"async_{fmt.name}", fmt, False)
        assert set(sync_files) == set(async_files), fmt
        diff = [k for k in sync_files if sync_files[k] != async_files[k]
                and not k.endswith("properties.json")]  # timings differ
        assert not diff, (fmt, diff)


def test_reads_wait_for_inflight_writes(tmp_path, rng):
    """retrieve_points / node_exists on a node whose write is still
    queued must return the complete file, not ENOENT or a partial."""
    from schwarzwald_tpu.io.las_persistence import LASPersistence

    sink = LASPersistence(str(tmp_path))
    if sink._writer is None:
        pytest.skip("write-behind disabled in this environment")
    buf = _cloud(rng, 20_000)
    for i in range(40):  # keep the queue busy
        sink.persist_points(buf, BOUNDS, f"r{i % 8}{i // 8}")
    got = sink.retrieve_points("r00")
    assert got.count == buf.count
    assert sink.node_exists("r00")
    sink.close()


def test_worker_error_surfaces(tmp_path):
    writer = AsyncFileWriter(threads=1)
    writer.submit(str(tmp_path / "no_dir" / "x.bin"), bytearray(b"abc"), 3)
    with pytest.raises(OSError):
        writer.drain()
    writer.close()
