"""Spatial reference system transforms.

Parity: SRSTransformHelper / IdentityTransform / Proj4Transform
(schwarzwald/core/util/Transformation.{h,cpp}). The reference wraps PROJ;
here the Cesium-world (geocentric/ECEF) conversion from WGS84 geodetic
coordinates is implemented directly, and arbitrary projected CRS inputs are
gated until a native PROJ-equivalent lands. AABB transform follows the
reference: transform the 8 corners and re-min/max (Transformation.cpp:10-45).
"""
from __future__ import annotations

import numpy as np

from ..core.aabb import AABB

# WGS84 ellipsoid
_A = 6378137.0
_F = 1.0 / 298.257223563
_E2 = _F * (2 - _F)


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


class Proj4Transform:
    """Source CRS -> Cesium world. Supports geodetic WGS84 inputs
    ("EPSG:4326", "+proj=longlat ..."); other CRS require a PROJ backend."""

    def __init__(self, source_projection: str):
        self.source_projection = source_projection
        normalized = source_projection.strip().lower()
        if not ("4326" in normalized or "longlat" in normalized
                or "latlong" in normalized):
            raise NotImplementedError(
                f"Source projection '{source_projection}' requires the PROJ "
                f"backend, which is not available in this build. Supported: "
                f"WGS84 geodetic (EPSG:4326 / +proj=longlat).")

    def transform_positions(self, positions: np.ndarray) -> np.ndarray:
        return geodetic_to_ecef(positions)

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
