"""Morton index tests, mirroring the reference's property-test strategy
(TestMortonIndex.cpp, TestOctreeIndexing.cpp: golden octant math, fast-vs-naive
encoder agreement, round trips)."""
import numpy as np
import pytest

from schwarzwald_tpu.core import morton
from schwarzwald_tpu.core.aabb import AABB, bounds_from_octants, octant_bounds


def test_expand_contract_roundtrip(rng):
    vals = rng.integers(0, 2**21, size=1000, dtype=np.uint64)
    expanded = morton.expand_bits_by_3(vals)
    assert np.array_equal(morton.contract_bits_by_3(expanded), vals)


def test_expand_bits_spreads_correctly():
    # bit i of input lands at bit 3*i of output
    for i in range(21):
        out = morton.expand_bits_by_3(np.uint64(1 << i))
        assert int(out) == 1 << (3 * i)


def test_truncate_to_level():
    # key with octants [1, 4, 3, 7] at levels 0..3 (MortonIndex.h:75-78)
    key = 0
    for level, o in enumerate([1, 4, 3, 7]):
        key = morton.set_octant_at_level(key, level, o)
    assert int(morton.truncate_to_level(key, 0)) == 0b001
    assert int(morton.truncate_to_level(key, 1)) == 0b001100
    assert int(morton.truncate_to_level(key, 3)) == 0b001100011111
    for level, o in enumerate([1, 4, 3, 7]):
        assert int(morton.octant_at_level(key, level)) == o
    # remaining levels are zero
    assert int(morton.octant_at_level(key, 10)) == 0


def test_fast_encoder_agrees_with_naive(rng):
    # "smart octree key calculation works" (TestOctreeIndexing.cpp:584)
    bounds = AABB([10.0, -20.0, 5.0], [74.0, 44.0, 69.0])
    pts = rng.uniform(bounds.min, bounds.max, size=(200, 3))
    fast = morton.encode(pts, bounds.min, bounds.extent())
    for i in range(pts.shape[0]):
        naive = morton.encode_naive(pts[i], bounds)
        # The fast encoder and octant descent may differ in the very last
        # levels due to FP rounding of repeated halving vs a single divide;
        # the reference asserts exact equality of the full key on random
        # inputs, which holds for cleanly representable bounds like these.
        assert int(fast[i]) == naive, f"point {pts[i]}"


def test_encode_clamps_edge_points():
    bounds = AABB([0.0, 0.0, 0.0], [1.0, 1.0, 1.0])
    # Point exactly on the max corner must clamp to the last cell
    key = morton.encode(np.array([[1.0, 1.0, 1.0]]), bounds.min, bounds.extent())
    assert int(key[0]) == (1 << 63) - 1  # all 63 bits set


def test_node_names_roundtrip():
    key, levels = morton.parse_node_name("r0426")
    assert levels == 4
    assert morton.node_name_potree(key, levels) == "r0426"
    assert morton.node_name_simple(key, levels) == "0426"
    ent = morton.node_name_entwine(key, levels)
    k2, l2 = morton.parse_node_name(ent)
    assert (k2, l2) == (key, levels)
    assert morton.entwine_name_to_potree_name(ent) == "r0426"
    assert morton.potree_name_to_entwine_name("r0426") == ent


def test_entwine_name_grid_coords():
    # Octant bit layout: x=bit2, y=bit1, z=bit0 (MortonIndex.h:62-74).
    # Node "r4" is the +x half -> grid (1, 0, 0) at depth 1.
    assert morton.potree_name_to_entwine_name("r4") == "1-1-0-0"
    assert morton.potree_name_to_entwine_name("r2") == "1-0-1-0"
    assert morton.potree_name_to_entwine_name("r1") == "1-0-0-1"
    assert morton.potree_name_to_entwine_name("r") == "0-0-0-0"
    assert morton.potree_name_to_entwine_name("r76") == "2-3-3-2"


def test_octant_bounds_math():
    root = AABB([0.0, 0.0, 0.0], [8.0, 8.0, 8.0])
    b4 = octant_bounds(4, root)  # +x half
    assert np.array_equal(b4.min, [4.0, 0.0, 0.0])
    assert np.array_equal(b4.max, [8.0, 4.0, 4.0])
    b1 = octant_bounds(1, root)  # +z half
    assert np.array_equal(b1.min, [0.0, 0.0, 4.0])
    b7 = bounds_from_octants([7, 7], root)
    assert np.array_equal(b7.min, [6.0, 6.0, 6.0])
    assert np.array_equal(b7.max, [8.0, 8.0, 8.0])


def test_encoded_key_prefix_matches_octant_path(rng):
    """Each 3-bit group of the key is the octant at that level."""
    bounds = AABB([0.0, 0.0, 0.0], [64.0, 64.0, 64.0])
    pts = rng.uniform(0, 64, size=(100, 3))
    keys = morton.encode(pts, bounds.min, bounds.extent())
    for i in range(100):
        cur = bounds
        for level in range(6):
            o = int(morton.octant_at_level(keys[i], level))
            cur = octant_bounds(o, cur)
            assert cur.is_inside(pts[i])[0], (pts[i], level, o)


def test_grid_coords_roundtrip(rng):
    xs = rng.integers(0, 2**10, 100).astype(np.uint64)
    ys = rng.integers(0, 2**10, 100).astype(np.uint64)
    zs = rng.integers(0, 2**10, 100).astype(np.uint64)
    keys = morton.from_grid_coords(xs, ys, zs)
    x2, y2, z2 = morton.grid_coords(keys, 10)
    assert np.array_equal(x2, xs)
    assert np.array_equal(y2, ys)
    assert np.array_equal(z2, zs)
