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
