"""End-to-end process tests: CLI tiler runs over real temp LAS files for
every output format, converter round trips, error-ignoring behavior.
(The reference's Tiler integration tests are commented out for lack of an
in-memory source, TestTiler.cpp:1-2 — these run against real files.)"""
import json
import os

import numpy as np
import pytest

from schwarzwald_tpu.cli import main as cli_main, parse_memory_size, parse_threads
from schwarzwald_tpu.core.aabb import AABB
from schwarzwald_tpu.core.attributes import PointAttribute
from schwarzwald_tpu.core.pointbuffer import PointBuffer
from schwarzwald_tpu.io import las
from schwarzwald_tpu.process.scheduler import (AdaptiveThreadCount,
                                               FixedThreadCount)

A = PointAttribute
BOUNDS = AABB([0.0, 0.0, 0.0], [100.0, 100.0, 100.0])


def write_test_las(path, rng, n, with_attrs=True):
    buf = PointBuffer(rng.uniform(BOUNDS.min + 1, BOUNDS.max - 1, (n, 3)))
    if with_attrs:
        buf.set_column(A.RGB, rng.integers(0, 255, (n, 3), dtype=np.uint8))
        buf.set_column(A.Intensity, rng.integers(0, 65535, n, dtype=np.uint16))
        buf.set_column(A.Classification, rng.integers(0, 10, n, dtype=np.uint8))
    las.write_las(str(path), buf, BOUNDS)
    return buf


def test_cli_tiler_3dtiles_end_to_end(tmp_path, rng):
    src = tmp_path / "in.las"
    out = tmp_path / "out"
    write_test_las(src, rng, 20_000)
    rc = cli_main(["--tiler", "-i", str(src), "-o", str(out),
                   "--spacing", "5", "--max-points-per-node", "1000",
                   "--sampling", "RANDOM_GRID"])
    assert rc == 0
    files = os.listdir(out)
    assert "r.json" in files and "r.pnts" in files
    assert "properties.json" in files
    props = json.load(open(out / "properties.json"))
    assert props["source_properties"]["processed_points"] == 20_000
    assert props["source_properties"]["root_spacing"] == 5.0
    # every pnts node parses and positions are shifted to cloud center
    from schwarzwald_tpu.io.pnts import read_pnts
    buf, rtc = read_pnts(str(out / "r.pnts"))
    assert buf.count > 0
    assert buf.has(A.RGB) and buf.has(A.Intensity)
    # RTC center = cubic bounds center
    np.testing.assert_allclose(rtc, [50.0, 50.0, 50.0])


@pytest.mark.parametrize("fmt,probe", [
    ("BIN", "r.bin"), ("BINZ", "r.binz"),
    ("ENTWINE_LAS", os.path.join("ept-data", "0-0-0-0.las")),
    ("LAS", "r.las"),
])
def test_cli_tiler_other_formats(tmp_path, rng, fmt, probe):
    src = tmp_path / "in.las"
    out = tmp_path / "out"
    write_test_las(src, rng, 5000)
    rc = cli_main(["--tiler", "-i", str(src), "-o", str(out),
                   "--spacing", "10", "--max-points-per-node", "500",
                   "--sampling", "RANDOM_GRID", "--output-format", fmt])
    assert rc == 0
    assert os.path.exists(out / probe), os.listdir(out)
    if fmt.startswith("ENTWINE"):
        assert os.path.exists(out / "ept.json")
        ept = json.load(open(out / "ept.json"))
        assert ept["dataType"] == "las"
        assert ept["points"] == 5000
        assert os.path.exists(out / "ept-hierarchy" / "0-0-0-0.json")


def test_cli_tiler_conservation_bin(tmp_path, rng):
    """Lossless BIN output: all input points come back exactly once from
    start-level-and-deeper nodes."""
    src = tmp_path / "in.las"
    out = tmp_path / "out"
    write_test_las(src, rng, 8000, with_attrs=False)
    original = las.read_las(str(src)).positions
    rc = cli_main(["--tiler", "-i", str(src), "-o", str(out),
                   "--spacing", "5", "--max-points-per-node", "400",
                   "--sampling", "RANDOM_GRID", "--output-format", "BIN",
                   "--tiling-strategy", "ACCURATE"])
    assert rc == 0
    from schwarzwald_tpu.io.bin_persistence import BinaryPersistence
    sink = BinaryPersistence(str(out))
    collected = []
    for name in os.listdir(out):
        if name.endswith(".bin"):
            collected.append(sink.retrieve_points(name[:-4]).positions)
    got = np.concatenate(collected)
    assert got.shape[0] == 8000
    np.testing.assert_array_equal(got[np.lexsort(got.T)],
                                  original[np.lexsort(original.T)])


def test_cli_multi_file_input_and_dir_expansion(tmp_path, rng):
    d = tmp_path / "data"
    d.mkdir()
    write_test_las(d / "a.las", rng, 3000)
    write_test_las(d / "b.las", rng, 2000)
    (d / "ignored.txt").write_text("not a las file")
    out = tmp_path / "out"
    rc = cli_main(["--tiler", "-i", str(d), "-o", str(out),
                   "--spacing", "8", "--sampling", "RANDOM_GRID",
                   "--output-format", "BIN", "--threads", "2 2"])
    assert rc == 0
    props = json.load(open(out / "properties.json"))
    assert props["source_properties"]["processed_points"] == 5000


def test_cli_ignore_missing_files(tmp_path, rng):
    src = tmp_path / "in.las"
    out = tmp_path / "out"
    write_test_las(src, rng, 1000)
    missing = str(tmp_path / "nope.las")
    # without --ignore: fails
    with pytest.raises(FileNotFoundError):
        cli_main(["--tiler", "-i", str(src), missing, "-o", str(out),
                  "--spacing", "8", "--output-format", "BIN"])
    # with --ignore MISSING_FILES: proceeds
    rc = cli_main(["--tiler", "-i", str(src), missing, "-o", str(out),
                   "--spacing", "8", "--sampling", "RANDOM_GRID",
                   "--output-format", "BIN", "--ignore", "MISSING_FILES"])
    assert rc == 0


def test_cli_default_diagonal_fraction(tmp_path, rng):
    src = tmp_path / "in.las"
    out = tmp_path / "out"
    write_test_las(src, rng, 2000)
    rc = cli_main(["--tiler", "-i", str(src), "-o", str(out),
                   "--sampling", "RANDOM_GRID", "--output-format", "BIN"])
    assert rc == 0
    props = json.load(open(out / "properties.json"))
    # spacing = cubic diagonal / 250
    want = float(np.float32(np.sqrt(3 * 100.0 ** 2) / 250))
    assert abs(props["source_properties"]["root_spacing"] - want) < 1e-6


def test_converter_3dtiles_to_las(tmp_path, rng):
    src = tmp_path / "in.las"
    tiled = tmp_path / "tiled"
    converted = tmp_path / "converted"
    write_test_las(src, rng, 5000)
    cli_main(["--tiler", "-i", str(src), "-o", str(tiled),
              "--spacing", "10", "--sampling", "RANDOM_GRID",
              "--output-format", "BIN"])
    rc = cli_main(["--converter", "-i", str(tiled), "-o", str(converted),
                   "--output-format", "LAS"])
    assert rc == 0
    assert os.path.exists(converted / "r.las")
    back = las.read_las(str(converted / "r.las"))
    assert back.count > 0


def test_converter_bin_to_3dtiles(tmp_path, rng):
    src = tmp_path / "in.las"
    tiled = tmp_path / "tiled"
    converted = tmp_path / "conv3d"
    write_test_las(src, rng, 5000)
    cli_main(["--tiler", "-i", str(src), "-o", str(tiled),
              "--spacing", "10", "--sampling", "RANDOM_GRID",
              "--output-format", "BIN"])
    rc = cli_main(["--converter", "-i", str(tiled), "-o", str(converted),
                   "--output-format", "3DTILES"])
    assert rc == 0
    assert os.path.exists(converted / "r.json")
    assert os.path.exists(converted / "r.pnts")
    # Position round trip: pnts positions are RTC-relative; absolute
    # positions (pos + RTC_CENTER) must match the source node points.
    from schwarzwald_tpu.io.bin_persistence import BinaryPersistence
    from schwarzwald_tpu.io.pnts import read_pnts
    src_pts = BinaryPersistence(str(tiled)).retrieve_points("r").positions
    buf, rtc = read_pnts(str(converted / "r.pnts"))
    np.testing.assert_allclose(rtc, BOUNDS.center())
    got = buf.positions + rtc
    np.testing.assert_allclose(np.sort(got, axis=0),
                               np.sort(src_pts, axis=0), atol=1e-4)
    # and the re-centered coordinates stay small (f32-precision safe)
    assert np.abs(buf.positions).max() <= 100.0


def test_parse_memory_size():
    assert parse_memory_size("800MiB") == 800 * (1 << 20)
    assert parse_memory_size("256MB") == 256 * 10 ** 6
    assert parse_memory_size("1GiB") == 1 << 30
    assert parse_memory_size("512") == 512


def test_parse_threads():
    t = parse_threads("6")
    assert isinstance(t, AdaptiveThreadCount) and t.num_threads == 6
    t = parse_threads("2 6")
    assert isinstance(t, FixedThreadCount)
    assert (t.num_threads_for_reading, t.num_threads_for_indexing) == (2, 6)


def test_converter_cloud_js_input(tmp_path, rng):
    """Potree v1 cloud.js properties parsing (parse_cloud_js,
    ConverterProcess.cpp:146-187)."""
    import json as _json

    from schwarzwald_tpu.io.bin_persistence import BinaryPersistence

    src_dir = tmp_path / "potree"
    src_dir.mkdir()
    buf = PointBuffer(rng.uniform(1, 99, (500, 3)))
    sink = BinaryPersistence(str(src_dir))
    sink.persist_points(buf, BOUNDS, "r")
    (src_dir / "cloud.js").write_text(_json.dumps({
        "spacing": 5.0,
        "boundingBox": {"lx": 0.0, "ly": 0.0, "lz": 0.0,
                        "ux": 100.0, "uy": 100.0, "uz": 100.0}}))
    out = tmp_path / "out3d"
    rc = cli_main(["--converter", "-i", str(src_dir), "-o", str(out),
                   "--output-format", "3DTILES"])
    assert rc == 0
    doc = json.load(open(out / "r.json"))
    assert doc["root"]["geometricError"] == 5.0


def test_corrupted_file_mid_read_ignored(tmp_path, rng):
    """Truncated LAS: --ignore CORRUPTED_FILES drops the remainder and
    finishes (PointSource.cpp:36-50 semantics)."""
    good = tmp_path / "good.las"
    bad = tmp_path / "bad.las"
    write_test_las(good, rng, 3000, with_attrs=False)
    write_test_las(bad, rng, 3000, with_attrs=False)
    # truncate the bad file mid-records: header claims 3000 points
    data = bad.read_bytes()
    bad.write_bytes(data[:len(data) // 2])

    out = tmp_path / "out"
    rc = cli_main(["--tiler", "-i", str(good), str(bad), "-o", str(out),
                   "--spacing", "8", "--sampling", "RANDOM_GRID",
                   "--output-format", "BIN", "--ignore", "CORRUPTED_FILES"])
    assert rc == 0
    props = json.load(open(out / "properties.json"))
    # full counts reported; the log reconciliation covers dropped points
    assert props["source_properties"]["processed_points"] == 6000


def test_library_api_tile_and_convert(tmp_path, rng):
    """High-level package API: schwarzwald_tpu.tile / convert."""
    import schwarzwald_tpu as sz

    src = tmp_path / "in.las"
    write_test_las(src, rng, 3000, with_attrs=False)
    stats = sz.tile(str(src), str(tmp_path / "out"),
                    sampling_strategy="RANDOM_GRID",
                    output_format="BIN", spacing=8.0)
    assert stats.points_processed == 3000
    assert os.path.exists(tmp_path / "out" / "r.bin")
    sz.convert(str(tmp_path / "out"), str(tmp_path / "conv"),
               output_format="LAS")
    assert os.path.exists(tmp_path / "conv" / "r.las")


def test_cli_use_device_equivalent_output(tmp_path, rng):
    """--use-device cpu produces byte-identical BIN nodes to the host path
    for a single-batch ACCURATE run."""
    import filecmp

    src = tmp_path / "in.las"
    write_test_las(src, rng, 4000, with_attrs=False)
    outs = {}
    for label, extra in (("host", []), ("dev", ["--use-device", "cpu"])):
        out = tmp_path / label
        rc = cli_main(["--tiler", "-i", str(src), "-o", str(out),
                       "--spacing", "8", "--sampling", "RANDOM_GRID",
                       "--output-format", "BIN",
                       "--tiling-strategy", "ACCURATE"] + extra)
        assert rc == 0
        outs[label] = out
    host_files = sorted(f for f in os.listdir(outs["host"])
                        if f.endswith(".bin"))
    dev_files = sorted(f for f in os.listdir(outs["dev"])
                       if f.endswith(".bin"))
    assert host_files == dev_files and host_files
    for f in host_files:
        assert filecmp.cmp(outs["host"] / f, outs["dev"] / f, shallow=False), f
