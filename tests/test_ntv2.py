"""NTv2 grid-shift reader + +nadgrids integration tests.

No real .gsb can ship here, so the grids are SYNTHETIC but the checks are
exact: bilinear interpolation of a field that is linear in (lat, lon)
must reproduce it to float32 rounding at arbitrary interior points, both
byte orders must decode identically, the NTv2 positive-west longitude
convention must flip sign at the east-positive API, and the densest
containing sub-grid must win (PROJ's selection rule)."""
import math
import struct

import numpy as np
import pytest

from schwarzwald_tpu.io import ntv2, srs


def _rec(key: str, value: bytes) -> bytes:
    assert len(value) == 8
    return key.ljust(8).encode()[:8] + value


def _i4(v, bo):
    return struct.pack(bo + "i", v) + b"\x00" * 4


def _f8(v, bo):
    return struct.pack(bo + "d", v)


def write_gsb(path, subgrids, byte_order="<"):
    """subgrids: list of dicts with keys name, parent, s_lat, n_lat,
    e_lon, w_lon, lat_inc, lon_inc (arc-seconds, lon positive WEST) and
    shift(lat_sec_row_grid, lon_west_sec_col_grid) -> (dlat, dlon_west).
    Node order: rows south->north, columns east->west."""
    bo = byte_order
    out = [
        _rec("NUM_OREC", _i4(11, bo)), _rec("NUM_SREC", _i4(11, bo)),
        _rec("NUM_FILE", _i4(len(subgrids), bo)),
        _rec("GS_TYPE", b"SECONDS "), _rec("VERSION", b"NTv2.0  "),
        _rec("SYSTEM_F", b"NAD27   "), _rec("SYSTEM_T", b"NAD83   "),
        _rec("MAJOR_F", _f8(6378206.4, bo)),
        _rec("MINOR_F", _f8(6356583.8, bo)),
        _rec("MAJOR_T", _f8(6378137.0, bo)),
        _rec("MINOR_T", _f8(6356752.314, bo)),
    ]
    for g in subgrids:
        rows = int(round((g["n_lat"] - g["s_lat"]) / g["lat_inc"])) + 1
        cols = int(round((g["w_lon"] - g["e_lon"]) / g["lon_inc"])) + 1
        out += [
            _rec("SUB_NAME", g["name"].ljust(8).encode()[:8]),
            _rec("PARENT", g.get("parent", "NONE").ljust(8).encode()[:8]),
            _rec("CREATED", b"2026    "), _rec("UPDATED", b"2026    "),
            _rec("S_LAT", _f8(g["s_lat"], bo)),
            _rec("N_LAT", _f8(g["n_lat"], bo)),
            _rec("E_LONG", _f8(g["e_lon"], bo)),
            _rec("W_LONG", _f8(g["w_lon"], bo)),
            _rec("LAT_INC", _f8(g["lat_inc"], bo)),
            _rec("LONG_INC", _f8(g["lon_inc"], bo)),
            _rec("GS_COUNT", _i4(rows * cols, bo)),
        ]
        for r in range(rows):
            for c in range(cols):
                dlat, dlon_w = g["shift"](g["s_lat"] + r * g["lat_inc"],
                                          g["e_lon"] + c * g["lon_inc"])
                out.append(struct.pack(bo + "ffff", dlat, dlon_w, 1.0, 1.0))
    with open(path, "wb") as f:
        f.write(b"".join(out))
    return str(path)


# a linear shift field: bilinear interpolation reproduces it exactly
def _linear_shift(lat_sec, lon_west_sec):
    return (1.0 + 0.25 * (lat_sec - 126000.0) / 3600.0
            - 0.125 * (lon_west_sec - 342000.0) / 3600.0,
            -2.0 + 0.5 * (lon_west_sec - 342000.0) / 3600.0)


# CONUS-ish window: lat 35..40 N, lon 95..100 W (NTv2 positive west)
_MAIN = dict(name="MAIN", s_lat=35 * 3600.0, n_lat=40 * 3600.0,
             e_lon=95 * 3600.0, w_lon=100 * 3600.0,
             lat_inc=1800.0, lon_inc=1800.0, shift=_linear_shift)


@pytest.fixture
def gsb(tmp_path):
    return write_gsb(tmp_path / "test.gsb", [_MAIN])


def test_bilinear_is_exact_on_linear_field(gsb, rng):
    grid = ntv2.NTv2Grid(gsb)
    lon = rng.uniform(-99.9, -95.1, 200)   # east-positive
    lat = rng.uniform(35.1, 39.9, 200)
    d_lat, d_lon_east = grid.shift_seconds(lon, lat)
    want_lat, want_lon_w = _linear_shift(lat * 3600.0, -lon * 3600.0)
    np.testing.assert_allclose(d_lat, want_lat, atol=1e-5)
    np.testing.assert_allclose(-d_lon_east, want_lon_w, atol=1e-5)


def test_longitude_sign_convention(gsb):
    """NTv2 stores positive-WEST shifts; a positive stored lon shift must
    DECREASE an east-positive longitude."""
    grid = ntv2.NTv2Grid(gsb)
    lon0, lat0 = np.array([-97.0]), np.array([37.0])
    # at this point the stored west shift is -2 + 0.5*(97-95) = -1.0 s
    # (i.e. one arc-second EAST), so east-positive lon must INCREASE
    lon1, lat1 = grid.forward(lon0, lat0)
    assert lon1[0] > lon0[0]
    np.testing.assert_allclose((lon1 - lon0) * 3600.0, [1.0], atol=1e-5)


def test_big_endian_decodes_identically(tmp_path, gsb):
    be = write_gsb(tmp_path / "be.gsb", [_MAIN], byte_order=">")
    g_le, g_be = ntv2.NTv2Grid(gsb), ntv2.NTv2Grid(be)
    lon = np.linspace(-99.5, -95.5, 9)
    lat = np.linspace(35.5, 39.5, 9)
    np.testing.assert_array_equal(g_le.shift_seconds(lon, lat),
                                  g_be.shift_seconds(lon, lat))


def test_densest_subgrid_wins(tmp_path):
    child = dict(name="CHILD", parent="MAIN", s_lat=36 * 3600.0,
                 n_lat=38 * 3600.0, e_lon=96 * 3600.0, w_lon=98 * 3600.0,
                 lat_inc=450.0, lon_inc=450.0,
                 shift=lambda la, lo: (100.0, 50.0))
    path = write_gsb(tmp_path / "nested.gsb", [_MAIN, child])
    grid = ntv2.NTv2Grid(path)
    # inside the child -> constant child shift
    d_lat, d_lon = grid.shift_seconds(np.array([-97.0]), np.array([37.0]))
    np.testing.assert_allclose(d_lat, [100.0], atol=1e-5)
    np.testing.assert_allclose(d_lon, [-50.0], atol=1e-5)
    # outside the child but inside MAIN -> the linear parent field
    d_lat, d_lon = grid.shift_seconds(np.array([-99.0]), np.array([39.0]))
    want_lat, _ = _linear_shift(39 * 3600.0, 99 * 3600.0)
    np.testing.assert_allclose(d_lat, [want_lat], atol=1e-5)


def test_inverse_roundtrip(gsb):
    grid = ntv2.NTv2Grid(gsb)
    lon = np.linspace(-99.5, -95.5, 11)
    lat = np.linspace(35.5, 39.5, 11)
    f_lon, f_lat = grid.forward(lon, lat)
    b_lon, b_lat = grid.inverse(f_lon, f_lat)
    np.testing.assert_allclose(b_lon, lon, atol=1e-12)
    np.testing.assert_allclose(b_lat, lat, atol=1e-12)


def test_outside_grid_raises_and_null_passes_through(gsb):
    grid = ntv2.NTv2Grid(gsb)
    with pytest.raises(ValueError, match="outside every sub-grid"):
        grid.shift_seconds(np.array([-50.0]), np.array([10.0]))
    # nadgrids spec: ,null catches uncovered points
    lon, lat = srs._apply_nadgrids(
        [gsb, "null"], np.array([-97.0, -50.0]), np.array([37.0, 10.0]))
    assert lon[0] != -97.0          # covered point shifted
    assert lon[1] == -50.0 and lat[1] == 10.0  # uncovered passed through
    with pytest.raises(ValueError, match="outside every"):
        srs._apply_nadgrids([gsb], np.array([-50.0]), np.array([10.0]))


def test_optional_and_missing_grid_specs(gsb, tmp_path):
    # '@missing' skipped; missing without '@' raises
    lon, lat = srs._apply_nadgrids(
        [f"@{tmp_path}/nope.gsb", gsb], np.array([-97.0]), np.array([37.0]))
    assert lon[0] != -97.0
    with pytest.raises(FileNotFoundError):
        srs._apply_nadgrids([f"{tmp_path}/nope.gsb"],
                            np.array([-97.0]), np.array([37.0]))


def test_nadgrids_transform_chain_and_towgs84_precedence(gsb):
    """+nadgrids in a full Proj4Transform: the ECEF output must equal the
    manual chain (grid shift -> WGS84 ECEF), and a +towgs84 in the same
    string must be IGNORED (PROJ precedence)."""
    pts = np.array([[-97.0, 37.0, 120.0], [-96.2, 38.4, 0.0]])
    tr = srs.Proj4Transform(
        f"+proj=longlat +ellps=clrk66 +nadgrids={gsb} "
        f"+towgs84=1000,1000,1000")
    out = tr.transform_positions(pts.copy())
    grid = ntv2.load_grid(gsb)
    lon, lat = grid.forward(pts[:, 0], pts[:, 1])
    want = srs.geodetic_to_ecef(np.column_stack([lon, lat, pts[:, 2]]))
    np.testing.assert_allclose(out, want, atol=1e-9)
    # plain WGS84 longlat + nadgrids also routes through the grid
    tr2 = srs.Proj4Transform(f"+proj=longlat +nadgrids={gsb}")
    np.testing.assert_allclose(tr2.transform_positions(pts.copy()), want,
                               atol=1e-9)


def test_nadgrids_after_projected_inverse(gsb):
    """Projected source CRS + nadgrids: UTM zone 14 on Clarke 1866
    (NAD27-style) -> inverse -> grid shift -> WGS84 ECEF."""
    lon0, lat0 = np.array([-97.3]), np.array([37.8])
    x, y = srs.tmerc_forward_p(lon0, lat0,
                               srs._parse_projection("+proj=utm +zone=14 "
                                                     "+ellps=clrk66"))
    tr = srs.Proj4Transform(
        f"+proj=utm +zone=14 +ellps=clrk66 +nadgrids={gsb}")
    out = tr.transform_positions(
        np.column_stack([x, y, np.zeros(1)]))
    grid = ntv2.load_grid(gsb)
    g_lon, g_lat = grid.forward(lon0, lat0)
    want = srs.geodetic_to_ecef(np.column_stack([g_lon, g_lat, [0.0]]))
    np.testing.assert_allclose(out, want, atol=1e-6)


def test_reader_rejects_non_ntv2(tmp_path):
    bad = tmp_path / "bad.gsb"
    bad.write_bytes(b"\x00" * 400)
    with pytest.raises(ValueError, match="NUM_OREC"):
        ntv2.NTv2Grid(str(bad))


def test_shift_magnitude_is_realistic_nad27(gsb):
    """Sanity: arc-second scale shifts move points metres, not km."""
    grid = ntv2.NTv2Grid(gsb)
    lon, lat = grid.forward(np.array([-97.0]), np.array([37.0]))
    d_m = np.hypot((lon[0] + 97.0) * 111_320 * math.cos(math.radians(37)),
                   (lat[0] - 37.0) * 110_574)
    assert 0.1 < d_m < 200.0


def test_degenerate_single_row_grid_rejected(tmp_path):
    """A 1-row sub-grid cannot be bilinearly interpolated; the index clip
    would wrap to -1 silently — reject at load."""
    flat = dict(name="FLAT", s_lat=36 * 3600.0, n_lat=36 * 3600.0,
                e_lon=95 * 3600.0, w_lon=100 * 3600.0,
                lat_inc=1800.0, lon_inc=1800.0,
                shift=lambda la, lo: (1.0, 1.0))
    path = write_gsb(tmp_path / "flat.gsb", [flat])
    with pytest.raises(ValueError, match="degenerate"):
        ntv2.NTv2Grid(path)


def test_missing_header_records_raise_value_error(tmp_path):
    """Corrupt headers must raise ValueError naming the file, not a bare
    KeyError (callers catch ValueError for bad grids)."""
    # overview header missing NUM_FILE
    recs = [_rec("NUM_OREC", _i4(11, "<")), _rec("NUM_SREC", _i4(11, "<"))]
    bad = tmp_path / "noh.gsb"
    bad.write_bytes(b"".join(recs) + b"\x00" * 16 * 9)
    with pytest.raises(ValueError, match="NUM_FILE"):
        ntv2.NTv2Grid(str(bad))
    # sub-grid header present but all-zero keys -> missing GS_COUNT etc.
    recs = [
        _rec("NUM_OREC", _i4(11, "<")), _rec("NUM_SREC", _i4(11, "<")),
        _rec("NUM_FILE", _i4(1, "<")), _rec("GS_TYPE", b"SECONDS "),
        _rec("VERSION", b"x       "), _rec("SYSTEM_F", b"A       "),
        _rec("SYSTEM_T", b"B       "), _rec("MAJOR_F", _f8(1.0, "<")),
        _rec("MINOR_F", _f8(1.0, "<")), _rec("MAJOR_T", _f8(1.0, "<")),
        _rec("MINOR_T", _f8(1.0, "<")),
    ] + [_rec("JUNK", b"\x00" * 8)] * 11
    bad2 = tmp_path / "nosub.gsb"
    bad2.write_bytes(b"".join(recs))
    with pytest.raises(ValueError, match="corrupt NTv2"):
        ntv2.NTv2Grid(str(bad2))


def test_try_forward_matches_covers_plus_forward(gsb, rng):
    """try_forward (single containment scan) must agree with the
    covers() + forward() composition, including pass-through of
    uncovered points."""
    grid = ntv2.NTv2Grid(gsb)
    lon = np.concatenate([rng.uniform(-99.5, -95.5, 50),
                          rng.uniform(10.0, 20.0, 10)])  # 10 uncovered
    lat = np.concatenate([rng.uniform(35.5, 39.5, 50),
                          rng.uniform(-10.0, 0.0, 10)])
    t_lon, t_lat, covered = grid.try_forward(lon, lat)
    want = grid.covers(lon, lat)
    np.testing.assert_array_equal(covered, want)
    f_lon, f_lat = grid.forward(lon[want], lat[want])
    np.testing.assert_array_equal(t_lon[want], f_lon)
    np.testing.assert_array_equal(t_lat[want], f_lat)
    np.testing.assert_array_equal(t_lon[~want], lon[~want])
    np.testing.assert_array_equal(t_lat[~want], lat[~want])


def test_reader_fuzz_never_crashes_unexpectedly(tmp_path, rng):
    """Arbitrary mutations of a valid grid must either load or raise
    ValueError/NotImplementedError — never IndexError/KeyError/segfault
    (the reader is fed user-supplied files via +nadgrids)."""
    base = bytearray(open(write_gsb(tmp_path / "f.gsb", [_MAIN]), "rb").read())
    for trial in range(60):
        buf = bytearray(base)
        kind = trial % 3
        if kind == 0:      # truncate
            buf = buf[:int(rng.integers(0, len(buf)))]
        elif kind == 1:    # flip random bytes
            for _ in range(8):
                buf[int(rng.integers(0, len(buf)))] = int(
                    rng.integers(0, 256))
        else:              # corrupt a header field
            off = int(rng.integers(0, 22)) * 16 + 8
            buf[off:off + 8] = rng.integers(0, 256, 8, dtype=np.uint8) \
                .tobytes()
        path = tmp_path / f"fz{trial}.gsb"
        path.write_bytes(bytes(buf))
        try:
            g = ntv2.NTv2Grid(str(path))
            # a grid that still loads must interpolate without crashing
            g.covers(np.array([-97.0]), np.array([37.0]))
        except (ValueError, NotImplementedError):
            pass
