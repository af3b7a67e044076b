"""Spatial reference system transforms.

Parity: SRSTransformHelper / IdentityTransform / Proj4Transform
(schwarzwald/core/util/Transformation.{h,cpp}). The reference wraps the
PROJ C library (proj_create_crs_to_crs, Transformation.cpp:74+); here the
transforms the tiler actually needs are implemented directly:

  - WGS84 geodetic (EPSG:4326 / +proj=longlat) -> Cesium world (ECEF)
  - Transverse Mercator / UTM (EPSG:326xx north, 327xx south,
    +proj=utm +zone=N [+south], +proj=tmerc ...) -> geodetic -> ECEF,
    via Karney's exact-to-nanometers 6th-order Krueger series
    (C.F.F. Karney, "Transverse Mercator with an accuracy of a few
    nanometers", J. Geod. 85, 2011)
  - Lambert conformal conic 1SP/2SP (+proj=lcc; EPSG:2154 Lambert-93 and
    the state-plane/national-grid family) via the ellipsoidal formulas of
    Snyder, "Map Projections: A Working Manual", USGS PP 1395, p. 105-110
  - Albers equal-area conic (+proj=aea; EPSG:5070 CONUS Albers),
    Snyder p. 98-103

AABB transform follows the reference: transform the 8 corners and
re-min/max (Transformation.cpp:10-45).
"""
from __future__ import annotations

import math
import re

import numpy as np

from ..core.aabb import AABB

# WGS84 ellipsoid
_A = 6378137.0
_F = 1.0 / 298.257223563
_E2 = _F * (2 - _F)
_E = math.sqrt(_E2)


class IdentityTransform:
    def transform_positions(self, positions: np.ndarray) -> np.ndarray:
        return positions

    def transform_aabb(self, aabb: AABB) -> AABB:
        return aabb


def geodetic_to_ecef(positions: np.ndarray) -> np.ndarray:
    """lon/lat (degrees) + height -> Cesium world (ECEF) coordinates."""
    lon = np.radians(positions[:, 0])
    lat = np.radians(positions[:, 1])
    h = positions[:, 2]
    n = _A / np.sqrt(1 - _E2 * np.sin(lat) ** 2)
    out = np.empty_like(positions)
    out[:, 0] = (n + h) * np.cos(lat) * np.cos(lon)
    out[:, 1] = (n + h) * np.cos(lat) * np.sin(lon)
    out[:, 2] = (n * (1 - _E2) + h) * np.sin(lat)
    return out


# ---------------------------------------------------------------------------
# Transverse Mercator (Krueger series, order n^6)
# ---------------------------------------------------------------------------

_N = _F / (2.0 - _F)
_A_BAR = _A / (1 + _N) * (1 + _N ** 2 / 4 + _N ** 4 / 64 + _N ** 6 / 256)

_ALPHA = (
    _N / 2 - 2 * _N ** 2 / 3 + 5 * _N ** 3 / 16 + 41 * _N ** 4 / 180
    - 127 * _N ** 5 / 288 + 7891 * _N ** 6 / 37800,
    13 * _N ** 2 / 48 - 3 * _N ** 3 / 5 + 557 * _N ** 4 / 1440
    + 281 * _N ** 5 / 630 - 1983433 * _N ** 6 / 1935360,
    61 * _N ** 3 / 240 - 103 * _N ** 4 / 140 + 15061 * _N ** 5 / 26880
    + 167603 * _N ** 6 / 181440,
    49561 * _N ** 4 / 161280 - 179 * _N ** 5 / 168
    + 6601661 * _N ** 6 / 7257600,
    34729 * _N ** 5 / 80640 - 3418889 * _N ** 6 / 1995840,
    212378941 * _N ** 6 / 319334400,
)

_BETA = (
    _N / 2 - 2 * _N ** 2 / 3 + 37 * _N ** 3 / 96 - _N ** 4 / 360
    - 81 * _N ** 5 / 512 + 96199 * _N ** 6 / 604800,
    _N ** 2 / 48 + _N ** 3 / 15 - 437 * _N ** 4 / 1440 + 46 * _N ** 5 / 105
    - 1118711 * _N ** 6 / 3870720,
    17 * _N ** 3 / 480 - 37 * _N ** 4 / 840 - 209 * _N ** 5 / 4480
    + 5569 * _N ** 6 / 90720,
    4397 * _N ** 4 / 161280 - 11 * _N ** 5 / 504
    - 830251 * _N ** 6 / 7257600,
    4583 * _N ** 5 / 161280 - 108847 * _N ** 6 / 3991680,
    20648693 * _N ** 6 / 638668800,
)


def tmerc_forward(lon_deg, lat_deg, lon0_deg: float, k0: float,
                  false_easting: float, false_northing: float):
    """Geodetic (degrees) -> transverse Mercator easting/northing."""
    lam = np.radians(np.asarray(lon_deg, np.float64) - lon0_deg)
    phi = np.radians(np.asarray(lat_deg, np.float64))
    sphi = np.sin(phi)
    t = np.sinh(np.arctanh(sphi) - _E * np.arctanh(_E * sphi))
    xi = np.arctan2(t, np.cos(lam))
    eta = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
    xi_s, eta_s = xi, eta
    for j, a in enumerate(_ALPHA, start=1):
        xi_s = xi_s + a * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_s = eta_s + a * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    return (k0 * _A_BAR * eta_s + false_easting,
            k0 * _A_BAR * xi_s + false_northing)


def _tau_from_tau_prime(tau_p):
    """Invert tau' = tau*sqrt(1+sigma^2) - sigma*sqrt(1+tau^2) by Newton
    (Karney 2011, eq. 19-21)."""
    e2m = 1 - _E2
    tau = tau_p / math.sqrt(e2m)  # first guess
    for _ in range(6):
        sig = np.sinh(_E * np.arctanh(_E * tau / np.sqrt(1 + tau * tau)))
        tau_p_i = tau * np.sqrt(1 + sig * sig) - sig * np.sqrt(1 + tau * tau)
        dtau = ((tau_p - tau_p_i) * (1 + e2m * tau * tau)
                / (e2m * np.sqrt((1 + tau_p_i * tau_p_i) * (1 + tau * tau))))
        tau = tau + dtau
    return tau


def tmerc_inverse(easting, northing, lon0_deg: float, k0: float,
                  false_easting: float, false_northing: float):
    """Transverse Mercator easting/northing -> geodetic lon/lat (degrees)."""
    xi = (np.asarray(northing, np.float64) - false_northing) / (k0 * _A_BAR)
    eta = (np.asarray(easting, np.float64) - false_easting) / (k0 * _A_BAR)
    xi_p, eta_p = xi, eta
    for j, b in enumerate(_BETA, start=1):
        xi_p = xi_p - b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p = eta_p - b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    tau_p = np.sin(xi_p) / np.sqrt(np.sinh(eta_p) ** 2 + np.cos(xi_p) ** 2)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    tau = _tau_from_tau_prime(tau_p)
    lat = np.degrees(np.arctan(tau))
    lon = lon0_deg + np.degrees(lam)
    return lon, lat


# ---------------------------------------------------------------------------
# Conic projections (Lambert conformal 1SP/2SP, Albers equal-area)
# ---------------------------------------------------------------------------
# Ellipsoidal formulas from Snyder, USGS PP 1395. Ellipsoid is a parameter
# (default WGS84) so the published Clarke-1866 test vectors (Snyder's
# worked examples) validate the implementation independently.

_ELLIPSOIDS = {
    "wgs84": (6378137.0, 1.0 / 298.257223563),
    "grs80": (6378137.0, 1.0 / 298.257222101),
    "clrk66": (6378206.4, 1.0 - math.sqrt(1.0 - 0.00676866)),
}


def _snyder_m(phi, e):
    return np.cos(phi) / np.sqrt(1 - (e * np.sin(phi)) ** 2)


def _snyder_t(phi, e):
    s = np.sin(phi)
    return (np.tan(math.pi / 4 - phi / 2)
            / ((1 - e * s) / (1 + e * s)) ** (e / 2))


def _phi_from_t(t, e):
    """Invert t(phi) (Snyder eq. 7-9, fixed-point iteration)."""
    phi = math.pi / 2 - 2 * np.arctan(t)
    for _ in range(8):
        s = e * np.sin(phi)
        phi = (math.pi / 2
               - 2 * np.arctan(t * ((1 - s) / (1 + s)) ** (e / 2)))
    return phi


class LCCParams:
    """Lambert conformal conic. 2SP when lat2 is given (EPSG:9802),
    1SP with scale k0 otherwise (EPSG:9801)."""

    def __init__(self, lat0: float, lon0: float, lat1: float,
                 lat2: float | None = None, k0: float = 1.0,
                 x0: float = 0.0, y0: float = 0.0,
                 ellipsoid: str = "wgs84"):
        a, f = _ELLIPSOIDS[ellipsoid]
        e = math.sqrt(f * (2 - f))
        self.a, self.e = a, e
        self.lon0 = lon0
        self.x0, self.y0 = x0, y0
        phi0, phi1 = math.radians(lat0), math.radians(lat1)
        m1, t1 = _snyder_m(phi1, e), _snyder_t(phi1, e)
        if lat2 is not None and lat2 != lat1:
            phi2 = math.radians(lat2)
            m2, t2 = _snyder_m(phi2, e), _snyder_t(phi2, e)
            self.n = ((math.log(m1) - math.log(m2))
                      / (math.log(t1) - math.log(t2)))
            self.k0 = 1.0
        else:
            self.n = math.sin(phi1)
            self.k0 = k0
        self.F = m1 / (self.n * t1 ** self.n)
        t0 = _snyder_t(phi0, e)
        self.rho0 = a * self.F * t0 ** self.n * self.k0


def lcc_forward(lon_deg, lat_deg, p: LCCParams):
    phi = np.radians(np.asarray(lat_deg, np.float64))
    lam = np.radians(np.asarray(lon_deg, np.float64) - p.lon0)
    t = _snyder_t(phi, p.e)
    rho = p.a * p.F * t ** p.n * p.k0
    theta = p.n * lam
    return (rho * np.sin(theta) + p.x0,
            p.rho0 - rho * np.cos(theta) + p.y0)


def lcc_inverse(easting, northing, p: LCCParams):
    sign = 1.0 if p.n >= 0 else -1.0  # southern-cone sign flips (Snyder)
    x = np.asarray(easting, np.float64) - p.x0
    y = p.rho0 - (np.asarray(northing, np.float64) - p.y0)
    rho = sign * np.sqrt(x * x + y * y)
    theta = np.arctan2(sign * x, sign * y)
    t = (rho / (p.a * p.F * p.k0)) ** (1.0 / p.n)
    phi = _phi_from_t(t, p.e)
    return (p.lon0 + np.degrees(theta / p.n), np.degrees(phi))


def _snyder_q(phi, e):
    s = np.sin(phi)
    return (1 - e * e) * (s / (1 - (e * s) ** 2)
                          - (1 / (2 * e)) * np.log((1 - e * s) / (1 + e * s)))


class AlbersParams:
    """Albers equal-area conic, two standard parallels (EPSG:9822)."""

    def __init__(self, lat0: float, lon0: float, lat1: float, lat2: float,
                 x0: float = 0.0, y0: float = 0.0,
                 ellipsoid: str = "wgs84"):
        a, f = _ELLIPSOIDS[ellipsoid]
        e = math.sqrt(f * (2 - f))
        self.a, self.e = a, e
        self.lon0 = lon0
        self.x0, self.y0 = x0, y0
        phi0 = math.radians(lat0)
        phi1, phi2 = math.radians(lat1), math.radians(lat2)
        m1, m2 = _snyder_m(phi1, e), _snyder_m(phi2, e)
        q0, q1, q2 = (_snyder_q(p, e) for p in (phi0, phi1, phi2))
        if lat1 != lat2:
            self.n = (m1 * m1 - m2 * m2) / (q2 - q1)
        else:
            self.n = math.sin(phi1)
        self.C = m1 * m1 + self.n * q1
        self.rho0 = a * math.sqrt(self.C - self.n * q0) / self.n


def albers_forward(lon_deg, lat_deg, p: AlbersParams):
    phi = np.radians(np.asarray(lat_deg, np.float64))
    lam = np.radians(np.asarray(lon_deg, np.float64) - p.lon0)
    q = _snyder_q(phi, p.e)
    rho = p.a * np.sqrt(p.C - p.n * q) / p.n
    theta = p.n * lam
    return (rho * np.sin(theta) + p.x0,
            p.rho0 - rho * np.cos(theta) + p.y0)


def albers_inverse(easting, northing, p: AlbersParams):
    sign = 1.0 if p.n >= 0 else -1.0
    x = np.asarray(easting, np.float64) - p.x0
    y = p.rho0 - (np.asarray(northing, np.float64) - p.y0)
    rho = np.sqrt(x * x + y * y)
    theta = np.arctan2(sign * x, sign * y)
    q = (p.C - (rho * p.n / p.a) ** 2) / p.n
    e, e2 = p.e, p.e * p.e
    # Snyder eq. 3-16 iteration, seeded by the spherical inverse
    phi = np.arcsin(np.clip(q / 2, -1, 1))
    for _ in range(8):
        s = np.sin(phi)
        es = e * s
        phi = phi + ((1 - es * es) ** 2 / (2 * np.cos(phi))
                     * (q / (1 - e2) - s / (1 - es * es)
                        + (1 / (2 * e)) * np.log((1 - es) / (1 + es))))
    return (p.lon0 + np.degrees(theta / p.n), np.degrees(phi))


class TmercParams:
    def __init__(self, lon0: float, lat0: float = 0.0, k0: float = 0.9996,
                 x0: float = 500000.0, y0: float = 0.0):
        if lat0 != 0.0:
            raise NotImplementedError(
                "tmerc with lat_0 != 0 is not supported yet")
        self.lon0, self.k0, self.x0, self.y0 = lon0, k0, x0, y0


def _parse_projection(text: str):
    """Returns 'geodetic', or TmercParams / LCCParams / AlbersParams."""
    s = text.strip().lower()

    def param(name, default):
        m2 = re.search(rf"\+{name}=(-?[\d.]+)", s)
        return float(m2.group(1)) if m2 else default

    def ellps():
        m2 = re.search(r"\+ellps=(\w+)", s)
        name = m2.group(1) if m2 else "wgs84"
        if name not in _ELLIPSOIDS:
            raise NotImplementedError(f"ellipsoid {name!r} not supported "
                                      f"(supported: {list(_ELLIPSOIDS)})")
        return name

    m = re.fullmatch(r"epsg:\s*(\d+)", s)
    if m:
        code = int(m.group(1))
        if code == 4326:
            return "geodetic"
        if 32601 <= code <= 32660:  # WGS84 / UTM north
            return TmercParams(lon0=(code - 32600) * 6 - 183)
        if 32701 <= code <= 32760:  # WGS84 / UTM south
            return TmercParams(lon0=(code - 32700) * 6 - 183, y0=10000000.0)
        if code == 2154:  # RGF93 / Lambert-93 (France national grid)
            return LCCParams(lat0=46.5, lon0=3.0, lat1=49.0, lat2=44.0,
                             x0=700000.0, y0=6600000.0, ellipsoid="grs80")
        if code == 5070:  # NAD83 / CONUS Albers
            return AlbersParams(lat0=23.0, lon0=-96.0, lat1=29.5,
                                lat2=45.5, ellipsoid="grs80")
        raise NotImplementedError(
            f"EPSG:{code} is not supported (supported: 4326, 326xx/327xx "
            f"UTM, 2154, 5070; or a +proj=tmerc/utm/lcc/aea/longlat string)")
    if "longlat" in s or "latlong" in s:
        return "geodetic"
    if "+proj=utm" in s:
        zone = re.search(r"\+zone=(\d+)", s)
        if not zone:
            raise ValueError(f"+proj=utm without +zone= in {text!r}")
        return TmercParams(lon0=int(zone.group(1)) * 6 - 183,
                           y0=10000000.0 if "+south" in s else 0.0)
    if "+proj=tmerc" in s:
        return TmercParams(lon0=param("lon_0", 0.0),
                           lat0=param("lat_0", 0.0),
                           k0=param("k", 1.0),
                           x0=param("x_0", 0.0), y0=param("y_0", 0.0))
    if "+proj=lcc" in s:
        # EPSG:9801 (1SP) gives only lat_0 — the natural origin IS the
        # single standard parallel; EPSG:9802 (2SP) gives lat_1/lat_2
        lat0 = param("lat_0", None)
        lat1 = param("lat_1", lat0 if lat0 is not None else 0.0)
        lat2 = re.search(r"\+lat_2=(-?[\d.]+)", s)
        two_sp = lat2 is not None and float(lat2.group(1)) != lat1
        # Only the 1SP form degenerates at the equator (n = sin(lat1) = 0);
        # a 2SP cone with lat_1=0, lat_2!=0 has a nonzero cone constant
        # n = (ln m1 - ln m2) / (ln t1 - ln t2).
        if lat1 == 0.0 and lat0 in (None, 0.0) and not two_sp:
            raise NotImplementedError(
                f"+proj=lcc without a standard parallel (lat_1 or lat_0) "
                f"in {text!r}: the 1SP cone constant would be 0")
        return LCCParams(lat0=lat0 if lat0 is not None else lat1,
                         lon0=param("lon_0", 0.0),
                         lat1=lat1,
                         lat2=float(lat2.group(1)) if lat2 else None,
                         k0=param("k_0", param("k", 1.0)),
                         x0=param("x_0", 0.0), y0=param("y_0", 0.0),
                         ellipsoid=ellps())
    if "+proj=aea" in s:
        return AlbersParams(lat0=param("lat_0", 0.0),
                            lon0=param("lon_0", 0.0),
                            lat1=param("lat_1", 0.0),
                            lat2=param("lat_2", 0.0),
                            x0=param("x_0", 0.0), y0=param("y_0", 0.0),
                            ellipsoid=ellps())
    raise NotImplementedError(
        f"Source projection {text!r} is not supported (supported: WGS84 "
        f"geodetic, UTM EPSG:326xx/327xx, EPSG:2154, EPSG:5070, "
        f"+proj=utm/tmerc/lcc/aea strings)")


class Proj4Transform:
    """Source CRS -> Cesium world (ECEF). Geodetic WGS84 directly; UTM /
    transverse Mercator via the Krueger-series inverse, then to ECEF."""

    def __init__(self, source_projection: str):
        self.source_projection = source_projection
        self._params = _parse_projection(source_projection)

    def transform_positions(self, positions: np.ndarray) -> np.ndarray:
        if self._params == "geodetic":
            return geodetic_to_ecef(positions)
        p = self._params
        if isinstance(p, LCCParams):
            lon, lat = lcc_inverse(positions[:, 0], positions[:, 1], p)
        elif isinstance(p, AlbersParams):
            lon, lat = albers_inverse(positions[:, 0], positions[:, 1], p)
        else:
            lon, lat = tmerc_inverse(positions[:, 0], positions[:, 1],
                                     p.lon0, p.k0, p.x0, p.y0)
        geo = np.column_stack([lon, lat, positions[:, 2]])
        return geodetic_to_ecef(geo)

    def transform_aabb(self, aabb: AABB) -> AABB:
        corners = np.array([[aabb.min[0] if i & 1 else aabb.max[0],
                             aabb.min[1] if i & 2 else aabb.max[1],
                             aabb.min[2] if i & 4 else aabb.max[2]]
                            for i in range(8)])
        transformed = self.transform_positions(corners)
        return AABB(transformed.min(axis=0), transformed.max(axis=0))


def make_transform(source_projection: str | None):
    if source_projection:
        return Proj4Transform(source_projection)
    return IdentityTransform()
