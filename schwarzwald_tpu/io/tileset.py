"""3D Tiles tileset model + tileset.json writer.

Parity: Tileset (schwarzwald/core/pointcloud/Tileset.h:68-117,
boundingBoxFromAABB Tileset.cpp) and writeTilesetJSON
(core/io/TileSetWriter.cpp): refine ADD, box bounding volumes
(center + axis half-vectors), external-tileset references below max_depth.
"""
from __future__ import annotations

import dataclasses
import json
from typing import List

from ..core.aabb import AABB


@dataclasses.dataclass
class Tileset:
    name: str = ""
    url: str = ""              # external tileset json, e.g. "r04.json"
    content_url: str = ""      # pnts content, e.g. "r04.pnts"
    geometric_error: float = 500.0
    bounding_box: list = None  # 12 doubles: center + 3 axis vectors
    children: List["Tileset"] = dataclasses.field(default_factory=list)
    version: str = "0.0"

    @staticmethod
    def bounding_box_from_aabb(aabb: AABB) -> list:
        """boundingBoxFromAABB: center + extent-aligned axes
        (Tileset.cpp:95-118)."""
        c = aabb.center()
        e = aabb.extent()
        return [float(c[0]), float(c[1]), float(c[2]),
                float(e[0]), 0.0, 0.0,
                0.0, float(e[1]), 0.0,
                0.0, 0.0, float(e[2])]


def _write_tile(tileset: Tileset, remaining_levels: int) -> dict:
    """write_tileset (TileSetWriter.cpp:41-81): at remaining_levels == 0 the
    content uri points to the external tileset json instead of the pnts."""
    node = {
        "boundingVolume": {"box": tileset.bounding_box},
        "geometricError": tileset.geometric_error,
        "refine": "ADD",
        "content": {
            "uri": tileset.url if remaining_levels == 0 else tileset.content_url
        },
    }
    if tileset.children and remaining_levels > 0:
        node["children"] = [_write_tile(c, remaining_levels - 1)
                            for c in tileset.children]
    return node


def write_tileset_json(path: str, tileset: Tileset, max_depth: int) -> None:
    doc = {
        "asset": {"version": tileset.version},
        "geometricError": tileset.geometric_error,
        "root": _write_tile(tileset, max_depth),
    }
    with open(path, "w") as f:
        json.dump(doc, f, separators=(",", ":"))
