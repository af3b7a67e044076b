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


class TmercParams:
    def __init__(self, lon0: float, lat0: float = 0.0, k0: float = 0.9996,
                 x0: float = 500000.0, y0: float = 0.0):
        if lat0 != 0.0:
            raise NotImplementedError(
                "tmerc with lat_0 != 0 is not supported yet")
        self.lon0, self.k0, self.x0, self.y0 = lon0, k0, x0, y0


def _parse_projection(text: str) -> TmercParams | str:
    """Returns 'geodetic', or TmercParams for UTM/tmerc inputs."""
    s = text.strip().lower()
    m = re.fullmatch(r"epsg:\s*(\d+)", s)
    if m:
        code = int(m.group(1))
        if code == 4326:
            return "geodetic"
        if 32601 <= code <= 32660:  # WGS84 / UTM north
            return TmercParams(lon0=(code - 32600) * 6 - 183)
        if 32701 <= code <= 32760:  # WGS84 / UTM south
            return TmercParams(lon0=(code - 32700) * 6 - 183, y0=10000000.0)
        raise NotImplementedError(
            f"EPSG:{code} is not supported (supported: 4326, 326xx/327xx "
            f"UTM; or a +proj=tmerc/utm/longlat string)")
    if "longlat" in s or "latlong" in s:
        return "geodetic"
    if "+proj=utm" in s:
        zone = re.search(r"\+zone=(\d+)", s)
        if not zone:
            raise ValueError(f"+proj=utm without +zone= in {text!r}")
        return TmercParams(lon0=int(zone.group(1)) * 6 - 183,
                           y0=10000000.0 if "+south" in s else 0.0)
    if "+proj=tmerc" in s:
        def param(name, default):
            m2 = re.search(rf"\+{name}=(-?[\d.]+)", s)
            return float(m2.group(1)) if m2 else default
        return TmercParams(lon0=param("lon_0", 0.0),
                           lat0=param("lat_0", 0.0),
                           k0=param("k", 1.0),
                           x0=param("x_0", 0.0), y0=param("y_0", 0.0))
    raise NotImplementedError(
        f"Source projection {text!r} is not supported (supported: WGS84 "
        f"geodetic, UTM EPSG:326xx/327xx, +proj=utm/tmerc strings)")


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
