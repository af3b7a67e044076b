"""LAZ codec tests: native round trips per item type, chunk-table random
access, LAS<->LAZ file equality, and the formerly-gated ENTWINE_LAZ /
converter LAZ flows end-to-end.

The reference reads and writes LAZ through the LASzip library
(schwarzwald/core/io/LASFile.cpp:446-560, LASPersistence.cpp); these tests
pin the native reimplementation (native/src/laz.cpp) to the same format:
chunked compressor (2), item versions 2, 50k default chunks.
"""
import os
import struct

import numpy as np
import pytest

from schwarzwald_tpu import native
from schwarzwald_tpu.core.aabb import AABB
from schwarzwald_tpu.core.attributes import PointAttribute
from schwarzwald_tpu.core.pointbuffer import PointBuffer
from schwarzwald_tpu.io import las, laz

A = PointAttribute
BOUNDS = AABB([0.0, 0.0, 0.0], [100.0, 100.0, 100.0])


def lib():
    codec = native.las_codec()
    if codec is None:
        pytest.skip("native codec unavailable")
    return codec


def synth_records(rng, n, fmt):
    """Correlated synthetic records shaped like real LiDAR streams."""
    rec = np.zeros(n, dtype=las.point_record_dtype(fmt))
    rec["x"] = np.cumsum(rng.integers(-50, 60, n)).astype(np.int32)
    rec["y"] = np.cumsum(rng.integers(-40, 45, n)).astype(np.int32)
    rec["z"] = (100000 + np.cumsum(rng.integers(-8, 8, n))).astype(np.int32)
    rec["intensity"] = (500 + np.cumsum(rng.integers(-9, 10, n))
                        ).astype(np.uint16)
    rn = rng.integers(1, 4, n)
    nr = np.maximum(rn, rng.integers(1, 4, n))
    rec["flags"] = (rn | (nr << 3) | (rng.integers(0, 2, n) << 6)
                    ).astype(np.uint8)
    rec["classification"] = rng.integers(0, 6, n).astype(np.uint8)
    rec["scan_angle"] = rng.integers(-30, 30, n).astype(np.int8)
    rec["user_data"] = rng.integers(0, 3, n).astype(np.uint8)
    rec["point_source_id"] = rng.integers(100, 104, n).astype(np.uint16)
    if fmt in (1, 3):
        rec["gps_time"] = 250000.0 + np.cumsum(rng.uniform(0, 1e-4, n))
    if fmt in (2, 3):
        base = rng.integers(0, 65536, 3)
        for i, c in enumerate(("red", "green", "blue")):
            rec[c] = (base[i] + np.cumsum(rng.integers(-300, 300, n))
                      ).astype(np.uint16)
    return rec


@pytest.mark.parametrize("fmt", [0, 1, 2, 3])
def test_native_stream_round_trip(rng, fmt):
    codec = lib()
    n = 120_000  # > 2 chunks
    raw = synth_records(rng, n, fmt).view(np.uint8).reshape(-1)
    rl = las.record_length_for_format(fmt)
    items = laz.items_for_point_format(fmt, rl)
    types = np.array([t for t, _, _ in items], dtype=np.uint16)
    sizes = np.array([s for _, s, _ in items], dtype=np.int32)

    stream = codec.laz_encode_stream(raw, rl, 50_000, types, sizes)
    assert stream.size < raw.size  # actually compresses correlated data

    back = codec.laz_decode_points(stream[8:], n, 50_000, types, sizes, rl)
    np.testing.assert_array_equal(back, raw)

    # chunk table: offsets partition the stream exactly
    table_off = struct.unpack("<q", stream[:8].tobytes())[0]
    chunk_sizes = codec.laz_read_chunk_table(stream[table_off:], 100)
    assert chunk_sizes.size == 3
    assert chunk_sizes.sum() == table_off - 8


def test_native_extra_bytes_round_trip(rng):
    codec = lib()
    n = 10_000
    rl = 20 + 5  # point10 + 5 extra bytes
    base = synth_records(rng, n, 0).view(np.uint8).reshape(n, 20)
    extra = rng.integers(0, 4, (n, 5)).astype(np.uint8)
    raw = np.concatenate([base, extra], axis=1).reshape(-1)
    types = np.array([laz.ITEM_POINT10, laz.ITEM_BYTE], dtype=np.uint16)
    sizes = np.array([20, 5], dtype=np.int32)
    stream = codec.laz_encode_stream(raw, rl, 50_000, types, sizes)
    back = codec.laz_decode_points(stream[8:], n, 50_000, types, sizes, rl)
    np.testing.assert_array_equal(back, raw)


def test_gps_time_sequences_round_trip(rng):
    """Interleaved time sequences + exact repeats + huge jumps exercise the
    GPSTIME11 multi-sequence machinery."""
    codec = lib()
    n = 30_000
    rec = synth_records(rng, n, 1)
    t = np.empty(n)
    seq_a = 100000.0 + np.arange(n) * 1e-5
    seq_b = 900000.0 + np.arange(n) * 2e-5
    t[0::3] = seq_a[0::3]
    t[1::3] = seq_b[1::3]
    t[2::3] = t[1::3][: (n - 2) // 3 + 1]  # exact repeats
    rec["gps_time"] = t
    raw = rec.view(np.uint8).reshape(-1)
    types = np.array([6, 7], dtype=np.uint16)
    sizes = np.array([20, 8], dtype=np.int32)
    stream = codec.laz_encode_stream(raw, 28, 50_000, types, sizes)
    back = codec.laz_decode_points(stream[8:], n, 50_000, types, sizes, 28)
    np.testing.assert_array_equal(back, raw)


def make_buffer(rng, n, with_gps=True, with_rgb=True):
    buf = PointBuffer(rng.uniform(BOUNDS.min + 1, BOUNDS.max - 1, (n, 3)))
    buf.set_column(A.Intensity, rng.integers(0, 65535, n, dtype=np.uint16))
    buf.set_column(A.Classification, rng.integers(0, 10, n, dtype=np.uint8))
    buf.set_column(A.ReturnNumber, rng.integers(1, 4, n, dtype=np.uint8))
    buf.set_column(A.NumberOfReturns, np.full(n, 3, dtype=np.uint8))
    if with_gps:
        buf.set_column(A.GPSTime, 1000.0 + np.sort(rng.uniform(0, 10, n)))
    if with_rgb:
        buf.set_column(A.RGB, rng.integers(0, 255, (n, 3), dtype=np.uint8))
    return buf


def test_write_laz_read_back_equals_las(tmp_path, rng):
    """A .laz written by write_las(compressed=True) decodes identically to
    the .las written from the same buffer."""
    buf = make_buffer(rng, 60_000)
    las.write_las(str(tmp_path / "a.las"), buf, BOUNDS)
    las.write_las(str(tmp_path / "a.laz"), buf, BOUNDS, compressed=True)
    assert (tmp_path / "a.laz").stat().st_size \
        < (tmp_path / "a.las").stat().st_size

    plain = las.read_las(str(tmp_path / "a.las"))
    packed = las.read_las(str(tmp_path / "a.laz"))
    np.testing.assert_array_equal(packed.positions, plain.positions)
    for attr in (A.Intensity, A.Classification, A.RGB, A.GPSTime,
                 A.ReturnNumber, A.NumberOfReturns):
        np.testing.assert_array_equal(packed.get(attr), plain.get(attr),
                                      err_msg=str(attr))


def test_laz_reader_random_access(tmp_path, rng):
    buf = make_buffer(rng, 120_000, with_rgb=False)
    path = str(tmp_path / "r.laz")
    las.write_las(path, buf, BOUNDS, compressed=True)
    f = las.LASFile(path)
    assert f.header.is_compressed
    full = f.read_points(0, f.count).positions
    # arbitrary (non chunk aligned) windows
    for start, count in [(0, 10), (49_999, 2), (50_000, 50_000),
                         (99_990, 30_000), (119_999, 1), (7_123, 61_000)]:
        got = f.read_points(start, count).positions
        want = full[start:start + min(count, f.count - start)]
        np.testing.assert_array_equal(got, want, err_msg=f"{start}+{count}")


def test_laz_fused_read_path(tmp_path, rng):
    """The fused decode+Morton-index read path must work from LAZ input."""
    buf = make_buffer(rng, 30_000, with_gps=False, with_rgb=False)
    path = str(tmp_path / "f.laz")
    las.write_las(path, buf, BOUNDS, compressed=True)
    f = las.LASFile(path)
    center = BOUNDS.center()
    fused = f.read_points_fused(0, f.count, f.attributes(), False, center,
                                BOUNDS.min, BOUNDS.max)
    plain = f.read_points(0, f.count)
    from schwarzwald_tpu.ops import indexing
    keys, clamped = indexing.index_points(plain.positions, BOUNDS.min,
                                          BOUNDS.max)
    np.testing.assert_array_equal(fused.morton_keys, keys)
    np.testing.assert_array_equal(fused.positions, clamped)


def test_cli_tiler_laz_input_matches_las(tmp_path, rng):
    """Same cloud via .las and .laz inputs -> identical octrees."""
    from schwarzwald_tpu.cli import main as cli_main
    from schwarzwald_tpu.io.bin_persistence import BinaryPersistence

    buf = make_buffer(rng, 20_000, with_gps=False, with_rgb=False)
    las.write_las(str(tmp_path / "in.las"), buf, BOUNDS)
    las.write_las(str(tmp_path / "in.laz"), buf, BOUNDS, compressed=True)
    outs = {}
    for ext in ("las", "laz"):
        out = tmp_path / f"out_{ext}"
        rc = cli_main(["--tiler", "-i", str(tmp_path / f"in.{ext}"),
                       "-o", str(out), "--spacing", "5",
                       "--max-points-per-node", "1000",
                       "--sampling", "RANDOM_GRID", "--output-format", "BIN"])
        assert rc == 0
        sink = BinaryPersistence(str(out))
        outs[ext] = {name[:-4]: sink.retrieve_points(name[:-4]).positions
                     for name in os.listdir(out) if name.endswith(".bin")}
    assert outs["las"].keys() == outs["laz"].keys()
    for name, pos in outs["las"].items():
        np.testing.assert_array_equal(outs["laz"][name], pos, err_msg=name)


def test_cli_tiler_entwine_laz_end_to_end(tmp_path, rng):
    """ENTWINE_LAZ (the Potree-standard output) end-to-end: ept.json says
    laszip, node files are valid .laz, and points survive the round trip
    within LAS quantization."""
    import json

    from schwarzwald_tpu.cli import main as cli_main

    buf = make_buffer(rng, 8_000, with_gps=False, with_rgb=False)
    src = tmp_path / "in.las"
    out = tmp_path / "out"
    las.write_las(str(src), buf, BOUNDS)
    # ACCURATE: no finalize-time ancestor reconstruction, so stored points
    # are conserved exactly (FAST duplicates sampled points into ancestors
    # by design, matching reconstruct_single_node,
    # TilingAlgorithms.cpp:1661-1715)
    rc = cli_main(["--tiler", "-i", str(src), "-o", str(out),
                   "--spacing", "10", "--max-points-per-node", "500",
                   "--sampling", "RANDOM_GRID", "--tiling-strategy",
                   "ACCURATE", "--output-format", "ENTWINE_LAZ"])
    assert rc == 0
    ept = json.load(open(out / "ept.json"))
    assert ept["dataType"] == "laszip"
    root_file = out / "ept-data" / "0-0-0-0.laz"
    assert root_file.exists()
    node = las.read_las(str(root_file))
    assert node.count > 0
    # all decoded points fall inside the node bounds (quantization slack)
    assert (node.positions >= BOUNDS.min - 0.01).all()
    assert (node.positions <= BOUNDS.max + 0.01).all()
    # conservation: every input point appears exactly once across ept-data
    total = sum(las.read_las(str(out / "ept-data" / f)).count
                for f in os.listdir(out / "ept-data"))
    assert total == 8_000


def test_converter_laz_output(tmp_path, rng):
    from schwarzwald_tpu.cli import main as cli_main

    buf = make_buffer(rng, 5_000, with_gps=False, with_rgb=False)
    las.write_las(str(tmp_path / "in.las"), buf, BOUNDS)
    tiled = tmp_path / "tiled"
    conv = tmp_path / "conv"
    cli_main(["--tiler", "-i", str(tmp_path / "in.las"), "-o", str(tiled),
              "--spacing", "10", "--sampling", "RANDOM_GRID",
              "--output-format", "BIN"])
    rc = cli_main(["--converter", "-i", str(tiled), "-o", str(conv),
                   "--output-format", "LAZ"])
    assert rc == 0
    assert (conv / "r.laz").exists()
    assert las.read_las(str(conv / "r.laz")).count > 0


def test_corrupted_laz_ignored(tmp_path, rng):
    """Truncated LAZ chunk stream: --ignore CORRUPTED_FILES drops the
    unreadable remainder and finishes (PointSource.cpp:36-50 semantics)."""
    from schwarzwald_tpu.cli import main as cli_main

    good = tmp_path / "good.las"
    bad = tmp_path / "bad.laz"
    buf_g = make_buffer(rng, 3000, with_gps=False, with_rgb=False)
    buf_b = make_buffer(rng, 60_000, with_gps=False, with_rgb=False)
    las.write_las(str(good), buf_g, BOUNDS)
    las.write_las(str(bad), buf_b, BOUNDS, compressed=True)
    data = bad.read_bytes()
    bad.write_bytes(data[: len(data) // 2])  # cut mid-chunk-stream

    out = tmp_path / "out"
    rc = cli_main(["--tiler", "-i", str(good), str(bad), "-o", str(out),
                   "--spacing", "8", "--sampling", "RANDOM_GRID",
                   "--output-format", "BIN", "--ignore", "CORRUPTED_FILES"])
    assert rc == 0


def test_laz_multi_batch_streaming(tmp_path, rng):
    """BASELINE config #5 shape in miniature: a LAZ input streamed through
    multiple batches (chunk-table seeks + the LAZReader chunk cache),
    conserving every point."""
    import os

    from schwarzwald_tpu.core.attributes import OutputFormat
    from schwarzwald_tpu.io.bin_persistence import BinaryPersistence
    from schwarzwald_tpu.process.tiler_process import (TilerArguments,
                                                       TilerProcess)

    n = 300_000
    buf = make_buffer(rng, n, with_gps=False, with_rgb=False)
    src = tmp_path / "big.laz"
    las.write_las(str(src), buf, BOUNDS, compressed=True)
    out = tmp_path / "out"
    args = TilerArguments(
        sources=[str(src)], output_directory=str(out), spacing=5.0,
        sampling_strategy="RANDOM_GRID", tiling_strategy="ACCURATE",
        output_format=OutputFormat.BIN,
        internal_cache_size=80_000, max_batch_read_size=30_000)
    TilerProcess(args).run()
    sink = BinaryPersistence(str(out))
    total = sum(sink.retrieve_points(f[:-4]).count
                for f in os.listdir(out) if f.endswith(".bin"))
    assert total == n


def test_lossy_sink_node_cache_identical_output(tmp_path, rng):
    """The node cache now also serves LOSSY sinks (caching the quantized
    re-read, invalidated on rewrite): multi-batch LAZ-node runs with and
    without the cache must produce identical octrees, with fewer decodes."""
    from schwarzwald_tpu.core.pointbuffer import PointBuffer as PB
    from schwarzwald_tpu.io import las_persistence
    from schwarzwald_tpu.ops.sampling import SamplingStrategy
    from schwarzwald_tpu.tiling import (TilerMetaParameters, TilingStrategy,
                                        make_tiling_algorithm)

    batches = [rng.uniform(BOUNDS.min, BOUNDS.max, (8000, 3))
               for _ in range(3)]

    reads = {"n": 0}
    orig = las_persistence.LASPersistence.retrieve_points

    def counting(self, name):
        reads["n"] += 1
        return orig(self, name)

    las_persistence.LASPersistence.retrieve_points = counting
    try:
        def run(tag, cache_bytes):
            reads["n"] = 0
            sink = las_persistence.LASPersistence(str(tmp_path / tag),
                                                  compressed=True)
            meta = TilerMetaParameters(spacing_at_root=8.0,
                                       max_points_per_node=300,
                                       cache_size_bytes=cache_bytes,
                                       concurrency=4)
            algo = make_tiling_algorithm(
                TilingStrategy.Fast, SamplingStrategy("RANDOM_GRID", 300),
                sink, meta)
            algo.level_of_start_nodes = 2  # keep the node count test-sized
            for pos in batches:
                algo.process_batch(PB(pos.copy()), BOUNDS)
            algo.finalize(BOUNDS)
            return sink, reads["n"]

        plain_sink, n_plain = run("plain", 0)
        cached_sink, n_cached = run("cached", 1 << 30)
    finally:
        las_persistence.LASPersistence.retrieve_points = orig

    names = {f[:-4] for f in os.listdir(tmp_path / "plain")
             if f.endswith(".laz")}
    assert names == {f[:-4] for f in os.listdir(tmp_path / "cached")
                     if f.endswith(".laz")}
    for name in names:
        np.testing.assert_array_equal(
            cached_sink.retrieve_points(name).positions,
            plain_sink.retrieve_points(name).positions, err_msg=name)
    assert n_cached < n_plain  # the cache absorbed LAZ node re-decodes


def test_decoder_survives_corrupt_streams(rng):
    """Bit-flipped / truncated / random streams must return an error (or
    wrong data), never crash or read out of bounds — the decoder is native
    code fed by untrusted files."""
    codec = lib()
    n = 5_000
    raw = synth_records(rng, n, 1).view(np.uint8).reshape(-1)
    types = np.array([6, 7], dtype=np.uint16)
    sizes = np.array([20, 8], dtype=np.int32)
    stream = codec.laz_encode_stream(raw, 28, 2000, types, sizes)
    payload = stream[8:]

    def try_decode(data):
        try:
            codec.laz_decode_points(np.ascontiguousarray(data), n, 2000,
                                    types, sizes, 28)
        except ValueError:
            pass  # error code is the correct outcome

    # truncations at various depths
    for frac in (0.01, 0.3, 0.7, 0.99):
        try_decode(payload[: int(payload.size * frac)])
    # single-bit flips scattered through the stream
    for _ in range(60):
        mutated = payload.copy()
        i = int(rng.integers(0, mutated.size))
        mutated[i] ^= np.uint8(1 << int(rng.integers(0, 8)))
        try_decode(mutated)
    # pure noise
    for _ in range(10):
        try_decode(rng.integers(0, 256, payload.size,
                                dtype=np.uint8).view(np.uint8))
    # corrupt chunk table
    for _ in range(20):
        table = rng.integers(0, 256, 64, dtype=np.uint8)
        try:
            codec.laz_read_chunk_table(table, 1000)
        except ValueError:
            pass


def test_converter_entwine_laz_to_3dtiles(tmp_path, rng):
    """The Potree -> Cesium migration flow: an ENTWINE_LAZ octree (entwine
    node names, laz node files) converts to 3D Tiles."""
    import json

    from schwarzwald_tpu.cli import main as cli_main
    from schwarzwald_tpu.io.pnts import read_pnts

    buf = make_buffer(rng, 5000, with_gps=False, with_rgb=False)
    las.write_las(str(tmp_path / "in.las"), buf, BOUNDS)
    ept = tmp_path / "ept"
    out = tmp_path / "3dt"
    cli_main(["--tiler", "-i", str(tmp_path / "in.las"), "-o", str(ept),
              "--spacing", "10", "--sampling", "RANDOM_GRID",
              "--tiling-strategy", "ACCURATE",
              "--output-format", "ENTWINE_LAZ"])
    rc = cli_main(["--converter", "-i", str(ept), "-o", str(out),
                   "--output-format", "3DTILES"])
    assert rc == 0
    assert (out / "r.json").exists()
    node, rtc = read_pnts(str(out / "r.pnts"))
    assert node.count > 0
    doc = json.load(open(out / "r.json"))
    assert doc["root"]["geometricError"] > 0
    # conservation: pnts nodes hold as many points as the ept laz nodes
    total_pnts = 0
    for f in os.listdir(out):
        if f.endswith(".pnts"):
            b, _ = read_pnts(str(out / f))
            total_pnts += b.count
    assert total_pnts == 5000


def test_malformed_laz_headers_raise_cleanly(tmp_path, rng):
    """Garbage VLR payloads / truncated headers raise Python exceptions
    (never crash) when opening claimed-LAZ files."""
    import struct as _struct

    base = bytearray(400)
    base[0:4] = b"LASF"
    base[24] = 1
    base[25] = 2
    _struct.pack_into("<H", base, 94, 227)       # header size
    _struct.pack_into("<I", base, 96, 300)       # offset to point data
    _struct.pack_into("<I", base, 100, 1)        # one VLR
    base[104] = 0x80                             # compressed flag
    _struct.pack_into("<H", base, 105, 20)
    _struct.pack_into("<I", base, 107, 10)       # point count
    _struct.pack_into("<3d", base, 131, 0.01, 0.01, 0.01)

    for variant in range(6):
        raw = bytearray(base)
        if variant == 0:
            pass  # VLR region is all zeros: no laszip VLR found
        elif variant == 1:
            # laszip VLR header with absurd record length
            _struct.pack_into("<H16sHH", raw, 227, 0, b"laszip encoded",
                              22204, 60000)
        elif variant == 2:
            # laszip VLR with garbage payload
            _struct.pack_into("<H16sHH", raw, 227, 0, b"laszip encoded",
                              22204, 40)
            raw[281:321] = rng.integers(0, 256, 40, dtype=np.uint8).tobytes()
        elif variant == 3:
            raw = raw[:250]  # truncated mid-VLR
        elif variant == 4:
            raw = raw[:50]   # truncated mid-header
        else:
            raw[104] = 0x86  # compressed + unsupported format 6
        path = tmp_path / f"bad{variant}.laz"
        path.write_bytes(bytes(raw))
        try:
            f = las.LASFile(str(path))
            f.read_points(0, 10)
        except Exception as err:
            assert not isinstance(err, (SystemExit, MemoryError)), err


# ---------------------------------------------------------------------------
# LAS 1.4 layered compressor (compressor 3, POINT14/RGB14/RGBNIR14/BYTE14 v3)
# ---------------------------------------------------------------------------

def synth_records_ext(rng, n, fmt, channels=2, sorted_gps=True):
    """Correlated synthetic LAS 1.4 extended records (formats 6-8)."""
    rec = np.zeros(n, dtype=las.point_record_dtype(fmt))
    rec["x"] = np.cumsum(rng.integers(-50, 60, n)).astype(np.int32)
    rec["y"] = np.cumsum(rng.integers(-40, 45, n)).astype(np.int32)
    rec["z"] = (100000 + np.cumsum(rng.integers(-8, 8, n))).astype(np.int32)
    rec["intensity"] = (500 + np.cumsum(rng.integers(-9, 10, n))
                        ).astype(np.uint16)
    nr = rng.integers(1, 12, n)
    rn = np.minimum(nr, rng.integers(1, 12, n))
    rec["flags"] = (rn | (nr << 4)).astype(np.uint8)
    chan = rng.integers(0, channels, n).astype(np.uint8)
    rec["flags2"] = (rng.integers(0, 16, n) | (chan << 4)
                     | (rng.integers(0, 2, n) << 6)
                     | (rng.integers(0, 2, n) << 7)).astype(np.uint8)
    rec["classification"] = rng.integers(0, 200, n).astype(np.uint8)
    rec["user_data"] = rng.integers(0, 3, n).astype(np.uint8)
    rec["scan_angle"] = (np.cumsum(rng.integers(-40, 40, n))
                         ).astype(np.int16)
    rec["point_source_id"] = rng.integers(100, 104, n).astype(np.uint16)
    gps = 250000.0 + np.cumsum(rng.uniform(0, 1e-4, n))
    rec["gps_time"] = gps if sorted_gps else rng.permutation(gps)
    if fmt in (7, 8):
        base = rng.integers(0, 65536, 3)
        for i, c in enumerate(("red", "green", "blue")):
            rec[c] = (base[i] + np.cumsum(rng.integers(-300, 300, n))
                      ).astype(np.uint16)
    if fmt == 8:
        rec["nir"] = (20000 + np.cumsum(rng.integers(-200, 200, n))
                      ).astype(np.uint16)
    return rec


@pytest.mark.parametrize("fmt", [6, 7, 8])
def test_native_layered_stream_round_trip(rng, fmt):
    codec = lib()
    n = 120_000  # > 2 chunks
    raw = synth_records_ext(rng, n, fmt).view(np.uint8).reshape(-1)
    rl = las.record_length_for_format(fmt)
    items = laz.items_for_point_format(fmt, rl)
    assert laz.compressor_for_items(items) == laz.COMPRESSOR_LAYERED_CHUNKED
    types = np.array([t for t, _, _ in items], dtype=np.uint16)
    sizes = np.array([s for _, s, _ in items], dtype=np.int32)

    stream = codec.laz_encode_stream(raw, rl, 50_000, types, sizes)
    assert stream.size < raw.size  # actually compresses correlated data

    back = codec.laz_decode_points(stream[8:], n, 50_000, types, sizes, rl)
    np.testing.assert_array_equal(back, raw)

    # chunk table framing is shared with compressor 2
    table_off = struct.unpack("<q", stream[:8].tobytes())[0]
    chunk_sizes = codec.laz_read_chunk_table(stream[table_off:], 100)
    assert chunk_sizes.size == 3
    assert chunk_sizes.sum() == table_off - 8


@pytest.mark.parametrize("channels", [1, 4])
def test_native_layered_scanner_channels(rng, channels):
    """Scanner-channel context switching: each channel keeps independent
    prediction state; all 4 contexts exercised, small chunks force frequent
    context re-creation."""
    codec = lib()
    n = 20_000
    raw = synth_records_ext(rng, n, 6, channels=channels,
                            sorted_gps=False).view(np.uint8).reshape(-1)
    types = np.array([laz.ITEM_POINT14], dtype=np.uint16)
    sizes = np.array([30], dtype=np.int32)
    for chunk in (512, 50_000):
        stream = codec.laz_encode_stream(raw, 30, chunk, types, sizes)
        back = codec.laz_decode_points(stream[8:], n, chunk, types, sizes, 30)
        np.testing.assert_array_equal(back, raw)


def test_native_layered_extra_bytes_round_trip(rng):
    codec = lib()
    n = 10_000
    rl = 30 + 5  # point14 + 5 extra bytes (BYTE14: one layer per byte)
    base = synth_records_ext(rng, n, 6).view(np.uint8).reshape(n, 30)
    extra = rng.integers(0, 4, (n, 5)).astype(np.uint8)
    raw = np.concatenate([base, extra], axis=1).reshape(-1)
    types = np.array([laz.ITEM_POINT14, laz.ITEM_BYTE14], dtype=np.uint16)
    sizes = np.array([30, 5], dtype=np.int32)
    stream = codec.laz_encode_stream(raw, rl, 50_000, types, sizes)
    back = codec.laz_decode_points(stream[8:], n, 50_000, types, sizes, rl)
    np.testing.assert_array_equal(back, raw)


def test_native_layered_single_point_chunks(rng):
    """Chunk-size edge cases: 1-point chunks (layers hold only coder flush
    bytes) and an exact chunk-size multiple."""
    codec = lib()
    types = np.array([laz.ITEM_POINT14], dtype=np.uint16)
    sizes = np.array([30], dtype=np.int32)
    for n, chunk in [(1, 50_000), (2, 1), (7, 1), (4000, 2000), (2000, 2000)]:
        raw = synth_records_ext(rng, n, 6).view(np.uint8).reshape(-1)
        stream = codec.laz_encode_stream(raw, 30, chunk, types, sizes)
        back = codec.laz_decode_points(stream[8:], n, chunk, types, sizes, 30)
        np.testing.assert_array_equal(back, raw, err_msg=f"n={n} cs={chunk}")


def test_write_extended_laz_read_back_equals_las(tmp_path, rng):
    """write_las(extended=True): LAS 1.4 format 6/7 .las and .laz decode
    identically, preserving extended ranges (returns > 7, classes > 31)."""
    n = 60_000
    buf = make_buffer(rng, n)
    buf.set_column(A.ReturnNumber, rng.integers(1, 15, n, dtype=np.uint8))
    buf.set_column(A.NumberOfReturns, np.full(n, 14, dtype=np.uint8))
    buf.set_column(A.Classification, rng.integers(0, 250, n, dtype=np.uint8))
    las.write_las(str(tmp_path / "a.las"), buf, BOUNDS, extended=True)
    las.write_las(str(tmp_path / "a.laz"), buf, BOUNDS, compressed=True,
                  extended=True)
    assert (tmp_path / "a.laz").stat().st_size \
        < (tmp_path / "a.las").stat().st_size

    f = las.LASFile(str(tmp_path / "a.las"))
    assert (f.header.version_major, f.header.version_minor) == (1, 4)
    assert f.header.point_data_format == 7
    plain = las.read_las(str(tmp_path / "a.las"))
    packed = las.read_las(str(tmp_path / "a.laz"))
    np.testing.assert_array_equal(packed.positions, plain.positions)
    for attr in (A.Intensity, A.Classification, A.RGB, A.GPSTime,
                 A.ReturnNumber, A.NumberOfReturns):
        np.testing.assert_array_equal(packed.get(attr), plain.get(attr),
                                      err_msg=str(attr))
    # extended ranges actually survived (legacy formats would clamp)
    np.testing.assert_array_equal(plain.get(A.ReturnNumber),
                                  buf.get(A.ReturnNumber))
    np.testing.assert_array_equal(plain.get(A.Classification),
                                  buf.get(A.Classification))


def test_layered_laz_reader_random_access(tmp_path, rng):
    rec = synth_records_ext(rng, 120_000, 6)
    path = str(tmp_path / "r14.laz")
    header = las.LASHeader(
        version_minor=4, point_data_format=6, point_record_length=30,
        point_count=120_000, scale=np.full(3, 0.01), offset=np.zeros(3),
        mins=np.zeros(3), maxs=np.full(3, 100.0),
        offset_to_point_data=las.HEADER_SIZE_14,
        header_size=las.HEADER_SIZE_14)
    laz.write_laz(path, header, rec)
    f = las.LASFile(path)
    assert f.header.is_compressed and f.header.point_data_format == 6
    full = f.read_points(0, f.count)
    for start, count in [(0, 10), (49_999, 2), (50_000, 50_000),
                         (99_990, 30_000), (119_999, 1), (7_123, 61_000)]:
        got = f.read_points(start, count)
        end = start + min(count, f.count - start)
        np.testing.assert_array_equal(got.positions,
                                      full.positions[start:end],
                                      err_msg=f"{start}+{count}")
        np.testing.assert_array_equal(got.get(A.GPSTime),
                                      full.get(A.GPSTime)[start:end])


def test_cli_tiler_extended_laz_input_to_entwine(tmp_path, rng):
    """A LAS 1.4 fmt-6 .laz input tiles end-to-end. ENTWINE_LAZ output
    emits interoperable legacy LAZ (compressor 2) by default and LAS 1.4
    layered (v3) only under --laz-extended-output."""
    import json

    from schwarzwald_tpu.cli import main as cli_main

    n = 20_000
    rec = synth_records_ext(rng, n, 6)
    # spread positions over the bounds so the octree has structure
    for axis, name in enumerate("xyz"):
        rec[name] = (rng.uniform(1, 99, n) / 0.01).astype(np.int32)
    src = str(tmp_path / "in14.laz")
    header = las.LASHeader(
        version_minor=4, point_data_format=6, point_record_length=30,
        point_count=n, scale=np.full(3, 0.01), offset=np.zeros(3),
        mins=np.zeros(3), maxs=np.full(3, 100.0),
        offset_to_point_data=las.HEADER_SIZE_14,
        header_size=las.HEADER_SIZE_14)
    laz.write_laz(src, header, rec)

    # DEFAULT: compressed output downgrades to the legacy interoperable
    # formats (compressor 2) because the v3 context tables are a
    # reconstruction (round-3 verdict item 4 'done' bar)
    out = tmp_path / "out"
    rc = cli_main(["--tiler", "-i", src, "-o", str(out),
                   "--spacing", "10", "--max-points-per-node", "2000",
                   "--sampling", "RANDOM_GRID", "--tiling-strategy",
                   "ACCURATE", "--output-format", "ENTWINE_LAZ"])
    assert rc == 0
    ept = json.load(open(out / "ept.json"))
    assert ept["dataType"] == "laszip"
    root = out / "ept-data" / "0-0-0-0.laz"
    node_header = las.LASFile(str(root)).header
    assert node_header.point_data_format <= 3  # legacy, compressor 2
    reader = laz.LAZReader(str(root), node_header)
    assert reader.vlr.compressor == laz.COMPRESSOR_POINTWISE_CHUNKED
    total = sum(las.read_las(str(out / "ept-data" / f)).count
                for f in os.listdir(out / "ept-data"))
    assert total == n

    # OPT-IN: --laz-extended-output writes LAS 1.4 layered (v3)
    out2 = tmp_path / "out_ext"
    rc = cli_main(["--tiler", "-i", src, "-o", str(out2),
                   "--spacing", "10", "--max-points-per-node", "2000",
                   "--sampling", "RANDOM_GRID", "--tiling-strategy",
                   "ACCURATE", "--output-format", "ENTWINE_LAZ",
                   "--laz-extended-output"])
    assert rc == 0
    node_header = las.LASFile(str(out2 / "ept-data" / "0-0-0-0.laz")).header
    assert (node_header.version_major, node_header.version_minor) == (1, 4)
    assert node_header.point_data_format >= 6
    reader = laz.LAZReader(str(out2 / "ept-data" / "0-0-0-0.laz"),
                           node_header)
    assert reader.vlr.compressor == laz.COMPRESSOR_LAYERED_CHUNKED
    total = sum(las.read_las(str(out2 / "ept-data" / f)).count
                for f in os.listdir(out2 / "ept-data"))
    assert total == n


def test_layered_decoder_survives_corrupt_streams(rng):
    """Layered-stream fuzzing: truncations, bit flips, and noise must error
    or mis-decode, never crash (same harness as the v2 fuzz test)."""
    codec = lib()
    n = 5_000
    raw = synth_records_ext(rng, n, 8).view(np.uint8).reshape(-1)
    types = np.array([laz.ITEM_POINT14, laz.ITEM_RGBNIR14], dtype=np.uint16)
    sizes = np.array([30, 8], dtype=np.int32)
    stream = codec.laz_encode_stream(raw, 38, 2000, types, sizes)
    payload = stream[8:]

    def try_decode(data):
        try:
            codec.laz_decode_points(np.ascontiguousarray(data), n, 2000,
                                    types, sizes, 38)
        except ValueError:
            pass  # error code is the correct outcome

    for frac in (0.01, 0.3, 0.7, 0.99):
        try_decode(payload[: int(payload.size * frac)])
    for _ in range(60):
        mutated = payload.copy()
        i = int(rng.integers(0, mutated.size))
        mutated[i] ^= np.uint8(1 << int(rng.integers(0, 8)))
        try_decode(mutated)
    for _ in range(10):
        try_decode(rng.integers(0, 256, payload.size,
                                dtype=np.uint8).view(np.uint8))


def _build_variable_chunk_laz(tmp_path, rng, chunk_counts):
    """Assemble an adaptive-chunking (chunk_size == U32_MAX) .laz from
    independently encoded chunks + a variable chunk table built with the
    spec-transcribed Python coder (tests/test_laz_primitives.py) — the
    file layout a third-party LASzip writer would produce. Returns
    (laz_path, plain_las_path) holding identical points."""
    import dataclasses
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_laz_primitives import SpecEncoder, SpecIntegerCompressor

    from schwarzwald_tpu.io.las import build_header_bytes

    codec = lib()
    n = int(sum(chunk_counts))
    buf = make_buffer(rng, n, with_rgb=False)
    plain = str(tmp_path / "plain.las")
    las.write_las(plain, buf, BOUNDS)
    f = las.LASFile(plain)
    header = f.header
    rl = header.point_record_length
    raw = np.fromfile(plain, dtype=np.uint8)[
        header.offset_to_point_data:
        header.offset_to_point_data + n * rl]
    fmt = header.point_data_format
    items = laz.items_for_point_format(fmt, rl)
    types = np.array([t for t, _, _ in items], dtype=np.uint16)
    sizes = np.array([s for _, s, _ in items], dtype=np.int32)

    chunk_bytes = []
    off = 0
    for cn in chunk_counts:
        sub = np.ascontiguousarray(raw[off * rl:(off + cn) * rl])
        stream = codec.laz_encode_stream(sub, rl, cn, types, sizes)
        table_off = struct.unpack("<q", stream[:8].tobytes())[0]
        chunk_bytes.append(stream[8:table_off].tobytes())
        off += cn
    body = b"".join(chunk_bytes)

    enc = SpecEncoder()
    ic = SpecIntegerCompressor(enc, 32, 2)
    prev_c = prev_s = 0
    for cn, cb in zip(chunk_counts, chunk_bytes):
        ic.compress(prev_c, cn, 0)
        ic.compress(prev_s, len(cb), 1)
        prev_c, prev_s = cn, len(cb)
    table = struct.pack("<II", 0, len(chunk_counts)) + enc.done()

    vlr_bytes = laz.build_laszip_vlr(items, laz.VARIABLE_CHUNK_SIZE)
    patched = dataclasses.replace(
        header,
        point_data_format=fmt | 0x80,
        offset_to_point_data=header.header_size + len(vlr_bytes),
        n_vlrs=1)
    out = str(tmp_path / "variable.laz")
    with open(out, "wb") as fh:
        fh.write(build_header_bytes(patched))
        fh.write(vlr_bytes)
        # absolute chunk-table offset, like write_laz
        fh.write(struct.pack(
            "<q", patched.offset_to_point_data + 8 + len(body)))
        fh.write(body)
        fh.write(table)
    return out, plain


def test_variable_chunk_laz_reads(tmp_path, rng):
    """Adaptive chunking (chunk_size == U32_MAX): full decode + random
    access through the variable chunk table, against the identical plain
    .las."""
    path, plain = _build_variable_chunk_laz(tmp_path, rng,
                                            [700, 1300, 500, 500])
    f = las.LASFile(path)
    assert f.header.is_compressed
    assert f.header.point_count == 3000
    reader = laz.LAZReader(path, f.header)
    assert reader.variable_chunks
    want = las.read_las(plain)
    got = las.read_las(path)
    np.testing.assert_array_equal(got.positions, want.positions)
    np.testing.assert_array_equal(got.get(A.Intensity),
                                  want.get(A.Intensity))
    # random access crossing chunk boundaries of differing sizes
    for start_, count in [(0, 10), (695, 10), (1990, 20), (2999, 1),
                          (700, 1300)]:
        g = f.read_points(start_, count).positions
        np.testing.assert_array_equal(
            g, want.positions[start_:start_ + count], err_msg=str(start_))


def test_variable_chunk_count_mismatch_raises(tmp_path, rng):
    """A variable table whose counts do not sum to the header count is a
    clear error, not a garbage decode."""
    path, _ = _build_variable_chunk_laz(tmp_path, rng, [1500, 1500])
    blob = bytearray(open(path, "rb").read())
    struct.pack_into("<I", blob, 107, 2999)  # legacy point count field
    open(path, "wb").write(bytes(blob))
    f = las.LASFile(path)
    reader = laz.LAZReader(path, f.header)
    with pytest.raises(ValueError, match="counts sum"):
        reader.read_records(0, 100)


def test_pointwise_unchunked_laz_reads(tmp_path, rng):
    """Ancient compressor-1 (pointwise, unchunked) streams: one chunk,
    no chunk-table offset prefix. Regression: the reader's early-return
    path must still initialize its chunking state (a round-3 review
    caught an AttributeError here)."""
    import dataclasses

    from schwarzwald_tpu.io.las import build_header_bytes

    codec = lib()
    n = 2000
    buf = make_buffer(rng, n, with_rgb=False)
    plain = str(tmp_path / "plain.las")
    las.write_las(plain, buf, BOUNDS)
    f = las.LASFile(plain)
    header = f.header
    rl = header.point_record_length
    raw = np.fromfile(plain, dtype=np.uint8)[
        header.offset_to_point_data:header.offset_to_point_data + n * rl]
    fmt = header.point_data_format
    items = laz.items_for_point_format(fmt, rl)
    types = np.array([t for t, _, _ in items], dtype=np.uint16)
    sizes = np.array([s for _, s, _ in items], dtype=np.int32)
    stream = codec.laz_encode_stream(np.ascontiguousarray(raw), rl, n,
                                     types, sizes)
    table_off = struct.unpack("<q", stream[:8].tobytes())[0]
    chunk = stream[8:table_off].tobytes()  # the single chunk, raw

    vlr = bytearray(laz.build_laszip_vlr(items, n))
    # compressor field = first u16 of the VLR payload (after the 54-byte
    # VLR header): set to 1 (pointwise, unchunked)
    struct.pack_into("<H", vlr, 54, laz.COMPRESSOR_POINTWISE)
    patched = dataclasses.replace(
        header, point_data_format=fmt | 0x80,
        offset_to_point_data=header.header_size + len(vlr), n_vlrs=1)
    out = str(tmp_path / "pointwise.laz")
    with open(out, "wb") as fh:
        fh.write(build_header_bytes(patched))
        fh.write(bytes(vlr))
        fh.write(chunk)  # NO 8-byte table offset, no table

    want = las.read_las(plain)
    got = las.read_las(out)
    np.testing.assert_array_equal(got.positions, want.positions)
    lf = las.LASFile(out)
    g = lf.read_points(500, 100).positions
    np.testing.assert_array_equal(g, want.positions[500:600])


def test_variable_chunk_table_corruption_is_loud(tmp_path, rng):
    """Truncated or bit-flipped variable chunk tables must raise, never
    crash or silently misdecode (counts are validated against the
    header)."""
    path, _ = _build_variable_chunk_laz(tmp_path, rng, [800, 1200, 1000])
    blob = open(path, "rb").read()
    f = las.LASFile(path)
    table_off = struct.unpack_from(
        "<q", blob, f.header.offset_to_point_data)[0]

    # truncate the table body mid-stream
    for cut in (table_off + 4, table_off + 9, len(blob) - 3):
        p = str(tmp_path / "trunc.laz")
        open(p, "wb").write(blob[:cut])
        reader = laz.LAZReader(p, las.LASFile(p).header)
        with pytest.raises((ValueError, laz.LAZNotAvailableError)):
            reader.read_records(0, 100)

    # flip bits inside the table's coder stream
    flips = rng.integers(table_off + 8, len(blob), 6)
    for pos in flips:
        corrupted = bytearray(blob)
        corrupted[pos] ^= 0xFF
        p = str(tmp_path / "flip.laz")
        open(p, "wb").write(bytes(corrupted))
        reader = laz.LAZReader(p, las.LASFile(p).header)
        try:
            reader.read_records(0, 3000)  # error OR correct decode only
        except (ValueError, laz.LAZNotAvailableError):
            pass


def test_coder_state_reuse_randomized_signature_interleave(rng):
    """The thread-local coder-state cache re-creates on signature change
    and re-inits on reuse; a randomized interleave of point formats and
    sizes in ONE process must round-trip losslessly every time (guards
    cross-signature contamination of reused model state)."""
    import numpy as np
    from schwarzwald_tpu import native
    from schwarzwald_tpu.core.aabb import AABB
    from schwarzwald_tpu.core.pointbuffer import PointBuffer
    from schwarzwald_tpu.io import las
    from schwarzwald_tpu.core.attributes import PointAttribute as A

    lib = native.las_codec()
    if lib is None:
        import pytest
        pytest.skip("native codec unavailable")
    fmts = [0, 1, 2, 3, 6, 7, 8]
    for trial in range(24):
        fmt = fmts[int(rng.integers(0, len(fmts)))]
        n = int(rng.integers(1, 4000))
        buf = PointBuffer(rng.uniform(0.0, 100.0, (n, 3)))
        if fmt in (2, 3, 7, 8):
            buf.set_column(A.RGB,
                           rng.integers(0, 256, (n, 3), dtype=np.uint8))
        if fmt in (1, 3, 6, 7, 8):
            buf.set_column(A.GPSTime, rng.uniform(0, 1e6, n))
        buf.set_column(A.Intensity,
                       rng.integers(0, 65536, n, dtype=np.uint16))
        scale = np.full(3, 0.001)
        offset = np.zeros(3)
        records = las.encode_records(buf, fmt, scale, offset)
        raw = np.ascontiguousarray(records.view(np.uint8).reshape(-1))
        rl = las.record_length_for_format(fmt)
        from schwarzwald_tpu.io import laz as laz_mod
        items = laz_mod.items_for_point_format(fmt, rl)
        item_types = np.asarray([t for t, _, _ in items], np.uint16)
        item_sizes = np.asarray([sz for _, sz, _ in items], np.int32)
        stream = lib.laz_encode_stream(raw, rl, 50000, item_types,
                                       item_sizes)
        # skip the 8-byte chunk-table offset; decode the point chunks
        back = lib.laz_decode_points(np.ascontiguousarray(stream[8:]), n,
                                     50000, item_types, item_sizes, rl)
        np.testing.assert_array_equal(
            back[:n * rl], raw, err_msg=f"trial {trial} fmt {fmt} n {n}")
