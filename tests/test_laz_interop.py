"""True-interop LAZ tests against stock LASzip via laspy (optional).

The native codec (native/src/laz.cpp) is validated offline by golden
streams and a spec-transcribed Python oracle, but a shared transcription
error would pass both (ADVICE r3). These tests pin actual interop:
our writer's files must decode under laspy's laszip/lazrs backend, and
files written by that backend — including layered (v3) point-14 streams
with adaptive chunking — must decode under our reader.

They skip cleanly when laspy is unavailable (this offline deployment);
CI environments with laspy+lazrs installed run them for real.
"""
import numpy as np
import pytest

laspy = pytest.importorskip("laspy")

from schwarzwald_tpu.io import las, laz  # noqa: E402

from .test_laz import synth_records  # noqa: E402


def _laspy_backend_or_skip():
    try:
        backends = [b for b in laspy.LazBackend.detect_available()]
    except Exception:
        backends = []
    if not backends:
        pytest.skip("laspy present but no LAZ backend (laszip/lazrs)")
    return backends[0]


def _header(fmt, rl, n, minor=2, hsize=None):
    hsize = hsize or (las.HEADER_SIZE_14 if minor == 4 else 227)
    return las.LASHeader(
        version_minor=minor, point_data_format=fmt, point_record_length=rl,
        point_count=n, scale=np.full(3, 0.01), offset=np.zeros(3),
        mins=np.zeros(3), maxs=np.full(3, 100.0),
        offset_to_point_data=hsize, header_size=hsize)


def test_our_laz_reads_under_stock_laszip(tmp_path, rng):
    """Files written by write_laz (compressor 2, pointwise v2 items) must
    decode byte-identically under the stock backend."""
    _laspy_backend_or_skip()
    n = 60_000
    rec = synth_records(rng, n, 1)
    path = str(tmp_path / "ours.laz")
    laz.write_laz(path, _header(1, 28, n), rec)

    theirs = laspy.read(path)
    np.testing.assert_array_equal(np.asarray(theirs.X), rec["x"])
    np.testing.assert_array_equal(np.asarray(theirs.Y), rec["y"])
    np.testing.assert_array_equal(np.asarray(theirs.Z), rec["z"])
    np.testing.assert_array_equal(np.asarray(theirs.intensity),
                                  rec["intensity"])
    np.testing.assert_allclose(np.asarray(theirs.gps_time), rec["gps_time"])


def test_stock_laszip_file_reads_under_our_codec(tmp_path, rng):
    """Files written by the stock backend must decode under LASFile."""
    backend = _laspy_backend_or_skip()
    n = 60_000
    rec = synth_records(rng, n, 1)
    hdr = laspy.LasHeader(version="1.2", point_format=1)
    hdr.scales = np.full(3, 0.01)
    hdr.offsets = np.zeros(3)
    f = laspy.LasData(hdr)
    f.X, f.Y, f.Z = rec["x"], rec["y"], rec["z"]
    f.intensity = rec["intensity"]
    f.gps_time = rec["gps_time"]
    path = str(tmp_path / "stock.laz")
    f.write(path, laz_backend=backend)

    ours = las.LASFile(path)
    buf = ours.read_points(0, ours.count)
    from schwarzwald_tpu.core.attributes import PointAttribute as A

    np.testing.assert_allclose(buf.positions[:, 0], rec["x"] * 0.01)
    np.testing.assert_array_equal(buf.get(A.Intensity), rec["intensity"])
    np.testing.assert_allclose(buf.get(A.GPSTime), rec["gps_time"])


def test_stock_layered_v3_file_reads_under_our_codec(tmp_path, rng):
    """Layered (compressor 3, v3 items) point-14 stream written by the
    stock backend — pins the reconstructed context tables and the
    adaptive chunk-table reader against a true implementation."""
    backend = _laspy_backend_or_skip()
    n = 120_000
    hdr = laspy.LasHeader(version="1.4", point_format=6)
    hdr.scales = np.full(3, 0.01)
    hdr.offsets = np.zeros(3)
    f = laspy.LasData(hdr)
    rec = synth_records(rng, n, 1)
    f.X, f.Y, f.Z = rec["x"], rec["y"], rec["z"]
    f.intensity = rec["intensity"]
    f.gps_time = rec["gps_time"]
    path = str(tmp_path / "stock14.laz")
    f.write(path, laz_backend=backend)

    ours = las.LASFile(path)
    assert ours.header.point_data_format == 6
    buf = ours.read_points(0, ours.count)
    from schwarzwald_tpu.core.attributes import PointAttribute as A

    np.testing.assert_allclose(buf.positions[:, 0], rec["x"] * 0.01)
    np.testing.assert_array_equal(buf.get(A.Intensity), rec["intensity"])
