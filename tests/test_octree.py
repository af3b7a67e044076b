"""Octree container + node index navigation tests, mirroring the depth of
TestOctree.cpp:7-480 and TestOctreeNodeIndex.cpp:8-457."""
import numpy as np
import pytest

from schwarzwald_tpu.core import morton, octree
from schwarzwald_tpu.core.octree import (Octree, child, octant_of, parent,
                                         parent_at_level)


def test_node_index_navigation():
    root = (0, 0)
    c3 = child(child(child(root, 0), 4), 2)  # r042
    assert c3 == (0o042, 3)
    assert parent(c3) == (0o04, 2)
    assert octant_of(c3) == 2
    assert parent_at_level(c3, 1) == (0, 1)
    assert parent_at_level(c3, 3) == c3
    with pytest.raises(ValueError):
        parent(root)
    with pytest.raises(ValueError):
        octant_of(root)
    with pytest.raises(ValueError):
        parent_at_level(c3, 4)


def test_octree_insert_lookup_erase():
    t = Octree()
    t.insert((0, 0), "root")
    t.insert((0o3, 1), "r3")
    t.insert((0o37, 2), "r37")
    assert len(t) == 3
    assert t[(0o3, 1)] == "r3"
    assert (0o37, 2) in t
    assert t.children_of((0o3, 1)) == [(0o37, 2)]
    assert t.is_leaf((0o37, 2))
    assert not t.is_leaf((0o3, 1))
    t.erase((0o37, 2))
    assert (0o37, 2) not in t
    assert t.is_leaf((0o3, 1))


def test_octree_traversals():
    t = Octree()
    for name in ("r", "r0", "r1", "r04", "r040"):
        key, levels = morton.parse_node_name(name)
        t.insert((key, levels), name)
    level_order = [t[i] for i in t.traverse_level_order()]
    assert level_order == ["r", "r0", "r1", "r04", "r040"]
    pre = [t[i] for i in t.traverse_preorder()]
    assert pre == ["r", "r0", "r04", "r040", "r1"]
    post = list(t.traverse_postorder())
    # children always appear before their parents
    seen = set()
    for idx in post:
        for c in t.children_of(idx):
            assert c in seen
        seen.add(idx)


def test_octree_transform_merge():
    a = Octree({(0, 0): [1], (0o2, 1): [2]})
    b = Octree({(0o2, 1): 30, (0o5, 1): 50})
    merged = Octree.transform_merge(a, b,
                                    transform=lambda v: [v],
                                    merge=lambda l, r: l + r)
    assert merged[(0, 0)] == [1]
    assert merged[(0o2, 1)] == [2, 30]
    assert merged[(0o5, 1)] == [50]


def test_octree_graphviz():
    t = Octree()
    for name in ("r", "r0"):
        key, levels = morton.parse_node_name(name)
        t.insert((key, levels), name)
    dot = t.to_graphviz()
    assert dot.startswith("digraph")
    assert '"r" -> "r0"' in dot


def test_max_depth():
    t = Octree()
    assert t.max_depth() == 0
    key, levels = morton.parse_node_name("r01234")
    t.insert((key, levels), None)
    assert t.max_depth() == 5


def test_node_naming_all_conventions_deep():
    """All three conventions round-trip at every depth 0..21
    (TestOctreeNodeIndex.cpp string conversion coverage)."""
    rng = np.random.default_rng(3)
    for levels in range(0, 21):
        key = int(rng.integers(0, 8 ** levels)) if levels else 0
        potree = morton.node_name_potree(key, levels)
        simple = morton.node_name_simple(key, levels)
        entwine = morton.node_name_entwine(key, levels)
        assert morton.parse_node_name(potree) == (key, levels)
        if levels:  # '' parses as root
            assert morton.parse_node_name(simple) == (key, levels)
        assert morton.parse_node_name(entwine) == (key, levels)
        assert morton.potree_name_to_entwine_name(potree) == entwine
        assert morton.entwine_name_to_potree_name(entwine) == potree
