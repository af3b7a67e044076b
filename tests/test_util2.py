"""Tests for parallel primitives, range algorithms, DynamicMortonIndex,
point-file facade, throughput counter."""
import numpy as np
import pytest

from schwarzwald_tpu.core.dynamic_morton import DynamicMortonIndex
from schwarzwald_tpu.io import pointcloud_file
from schwarzwald_tpu.util.algorithms import (merge_ranges,
                                             stable_partition_with_jumps)
from schwarzwald_tpu.util.parallel import (Semaphore, TaskSystem, all_of,
                                           parallel_scatter,
                                           parallel_transform,
                                           split_range_into_chunks)
from schwarzwald_tpu.util.progress import ThroughputCounter


def test_stable_partition_with_jumps_even_odd():
    """TestAlgorithm.cpp:24-206 style: stability on both sides."""
    values = list(range(20))

    def pred(cur, end):
        # select first even in [cur, cur+4), consume 4
        nxt = min(cur + 4, end)
        for i in range(cur, nxt):
            if values[i] % 2 == 0:
                return i, nxt
        return nxt, nxt

    sel, unsel = stable_partition_with_jumps(20, pred)
    assert sel == [0, 4, 8, 12, 16]
    assert unsel == sorted(set(range(20)) - set(sel))


def test_merge_ranges_stable():
    a = np.array([1, 3, 5], dtype=np.uint64)
    b = np.array([1, 2, 5], dtype=np.uint64)
    merged = merge_ranges([a, b])
    np.testing.assert_array_equal(merged, [1, 1, 2, 3, 5, 5])


def test_split_range_into_chunks():
    assert split_range_into_chunks(3, 10) == [(0, 3), (3, 6), (6, 10)]
    assert split_range_into_chunks(4, 2) == [(0, 1), (1, 2)]


def test_task_system_and_parallel_helpers():
    with TaskSystem(2) as ts:
        futures = [ts.push(lambda x: x * x, i) for i in range(5)]
        assert all_of(futures) == [0, 1, 4, 9, 16]
    assert parallel_transform([1, 2, 3], lambda x: x + 1) == [2, 3, 4]
    seen = parallel_scatter(10, lambda lo, hi, i: (lo, hi, i), num_threads=2)
    assert seen == [(0, 5, 0), (5, 10, 1)]


def test_semaphore():
    sem = Semaphore(1)
    sem.wait()
    sem.notify()
    sem.wait()


def test_dynamic_morton_index_roundtrip():
    idx = DynamicMortonIndex.parse_string("r0426")
    assert idx.depth == 4
    assert idx.octants == (0, 4, 2, 6)
    assert idx.to_string("potree") == "r0426"
    assert idx.to_string("simple") == "0426"
    entwine = idx.to_string("entwine")
    assert DynamicMortonIndex.parse_string(entwine) == idx
    assert idx.child(7).to_string("potree") == "r04267"
    assert idx.parent().to_string("potree") == "r042"
    assert idx.truncate_to_depth(2).octants == (0, 4)
    with pytest.raises(ValueError):
        DynamicMortonIndex().parent()


def test_pointcloud_file_facade(tmp_path, rng):
    from schwarzwald_tpu.core.aabb import AABB
    from schwarzwald_tpu.core.attributes import PointAttribute
    from schwarzwald_tpu.core.pointbuffer import PointBuffer
    from schwarzwald_tpu.io import las

    path = str(tmp_path / "f.las")
    las.write_las(path, PointBuffer(rng.uniform(0, 10, (100, 3))),
                  AABB([0.0] * 3, [10.0] * 3))
    assert pointcloud_file.file_format_is_supported(path)
    assert not pointcloud_file.file_format_is_supported("x.xyz")
    f = pointcloud_file.open_point_file(path)
    assert pointcloud_file.get_point_count(f) == 100
    assert pointcloud_file.has_attribute(f, PointAttribute.Position)
    with pytest.raises(ValueError):
        pointcloud_file.open_point_file("nope.xyz")


def test_throughput_counter():
    tc = ThroughputCounter()
    tc.push_entry(0, timestamp=0.0)
    tc.push_entry(100, timestamp=1.0)
    tc.push_entry(100, timestamp=2.0)
    assert tc.get_throughput_per_second() == pytest.approx(100.0)
