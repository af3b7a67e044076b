"""Start-node thread fan-out (round-3 verdict item 3): disjoint subtrees
tile concurrently and the output is byte-identical to the serial run, for
every sink family. XLA/backend-independent — pure host engine."""
import os

import numpy as np
import pytest

from schwarzwald_tpu.core.aabb import AABB
from schwarzwald_tpu.core.attributes import OutputFormat, PointAttribute
from schwarzwald_tpu.core.pointbuffer import PointBuffer
from schwarzwald_tpu.io import las
from schwarzwald_tpu.process.scheduler import FixedThreadCount
from schwarzwald_tpu.process.tiler_process import (TilerArguments,
                                                   TilerProcess)

BOUNDS = AABB([0.0, 0.0, 0.0], [100.0, 100.0, 100.0])


def _source(tmp_path, rng, n=30_000):
    src = str(tmp_path / "in.las")
    buf = PointBuffer(rng.uniform(1, 99, (n, 3)))
    buf.set_column(PointAttribute.Intensity,
                   rng.integers(0, 65535, n, dtype=np.uint16))
    las.write_las(src, buf, BOUNDS)
    return src


def _run(src, out, fmt, threads, sampling="RANDOM_GRID", batch=10_000):
    TilerProcess(TilerArguments(
        sources=[src], output_directory=str(out), spacing=4.0,
        max_points_per_node=800, sampling_strategy=sampling,
        tiling_strategy="FAST", output_format=fmt,
        thread_config=FixedThreadCount(1, threads),
        internal_cache_size=batch, max_batch_read_size=batch,
        fixed_start_level=2)).run()


def _tree_bytes(root):
    """Every output file's bytes, keyed by relative path."""
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for name in files:
            full = os.path.join(dirpath, name)
            rel = os.path.relpath(full, root)
            with open(full, "rb") as f:
                out[rel] = f.read()
    return out


@pytest.mark.parametrize("fmt,sampling", [
    (OutputFormat.BIN, "RANDOM_GRID"),
    (OutputFormat.CZM_3DTILES, "MIN_DISTANCE"),
    (OutputFormat.ENTWINE_LAS, "JITTERED"),
])
def test_concurrency_4_output_is_byte_identical(tmp_path, rng, fmt,
                                                sampling):
    src = _source(tmp_path, rng)
    serial = tmp_path / "serial"
    threaded = tmp_path / "threaded"
    _run(src, serial, fmt, threads=1, sampling=sampling)
    _run(src, threaded, fmt, threads=4, sampling=sampling)
    a = _tree_bytes(serial)
    b = _tree_bytes(threaded)
    # properties.json embeds wall-clock timings; everything else must match
    skip = {"properties.json"}
    assert {k for k in a if k not in skip} == {k for k in b if k not in skip}
    for rel in a:
        if rel in skip:
            continue
        assert a[rel] == b[rel], f"{rel} differs at concurrency 4"


def test_worker_exception_propagates(tmp_path, rng):
    """A worker failure must surface in the caller, not hang the pool."""
    from schwarzwald_tpu.tiling import engine as engine_mod

    src = _source(tmp_path, rng, n=20_000)

    class Boom(RuntimeError):
        pass

    orig = engine_mod.TilingAlgorithmBase._tile_node
    calls = {"n": 0}

    def failing(self, arena, task):
        calls["n"] += 1
        if calls["n"] == 3:
            raise Boom()
        return orig(self, arena, task)

    engine_mod.TilingAlgorithmBase._tile_node = failing
    try:
        with pytest.raises(Boom):
            _run(src, tmp_path / "boom", OutputFormat.BIN, threads=4)
    finally:
        engine_mod.TilingAlgorithmBase._tile_node = orig
