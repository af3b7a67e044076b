"""Octree node structure and spacing/level math.

Parity: octree::NodeStructure (schwarzwald/core/tiling/Node.h:12-19) and the
spacing -> level formulas (Node.cpp:37-57). The root of the whole octree is
level -1; level 0 nodes have half the root side length.
"""
from __future__ import annotations

import dataclasses
import math

import numpy as np

from .aabb import AABB, bounds_from_octants
from . import morton


@dataclasses.dataclass
class NodeStructure:
    name: str           # Potree-style name, e.g. "r0426"
    morton_key: int     # absolute Morton key with octants set down to `level`
    bounds: AABB
    level: int          # root = -1
    max_spacing: float  # spacing at this node
    max_depth: int


def root_node(bounds: AABB, spacing_at_root: float, max_depth: int) -> NodeStructure:
    return NodeStructure(
        name="r",
        morton_key=0,
        bounds=bounds,
        level=-1,
        max_spacing=float(spacing_at_root),
        max_depth=int(max_depth),
    )


def node_from_index(node_key: int, levels: int, root: NodeStructure) -> NodeStructure:
    """Build the NodeStructure for a node index below the given root.

    Matches the construction in TilingAlgorithmV3 (TilingAlgorithms.cpp:
    1327-1343, 1640-1656): level = levels - 1, spacing halves per level,
    bounds by iterative octant halving, morton key with the node's octants in
    the top levels.
    """
    octants = [(node_key >> (3 * (levels - 1 - i))) & 0b111 for i in range(levels)]
    key = 0
    for i, o in enumerate(octants):
        key = int(morton.set_octant_at_level(key, i, o))
    return NodeStructure(
        name="r" + "".join(str(o) for o in octants),
        morton_key=key,
        bounds=bounds_from_octants(octants, root.bounds),
        level=levels - 1,
        max_spacing=root.max_spacing / (2.0 ** levels),
        max_depth=root.max_depth,
    )


def spacing_at_level(spacing_at_root: float, node_level: int) -> float:
    """Spacing halves per level; root is level -1 (Node.cpp:48-56)."""
    return spacing_at_root / (2.0 ** (node_level + 1))


def first_node_level_obeying_spacing(target_spacing: float, root_extent_x: float) -> int:
    """Last level (from root) where the node side is >= target spacing.

    Matches Node.cpp:37-46 including the float32 log2f evaluation: the C++
    code computes std::log2f on a float argument, so we narrow to float32
    before the log for bit-comparable level decisions.
    """
    ratio = np.float32(root_extent_x / target_spacing)
    return max(-1, int(math.floor(float(np.log2(ratio)))) - 1)


def node_level_to_sample_from(source_node_level: int, root: NodeStructure) -> int:
    """Grid-sampling candidate level for a node (Node.cpp:48-57)."""
    spacing = root.max_spacing / (2.0 ** (source_node_level + 1))
    return first_node_level_obeying_spacing(spacing, float(root.bounds.extent()[0]))
