"""Sampling strategy tests: vectorized implementations vs a literal scalar
oracle transcribing the reference's stable_partition_with_jumps flow
(util/algorithms/Algorithm.h:24-78 + Sampling.h predicates), plus the
property-test style of the reference suite (TestOctreeIndexing.cpp)."""
import math

import numpy as np
import pytest

from schwarzwald_tpu.core import morton
from schwarzwald_tpu.ops import indexing, sampling
from schwarzwald_tpu.ops.sampling import SamplingBehaviour, SamplingStrategy

ROOT_MIN = np.array([0.0, 0.0, 0.0])
ROOT_MAX = np.array([64.0, 64.0, 64.0])


def make_sorted_points(rng, n):
    pos = rng.uniform(ROOT_MIN, ROOT_MAX, size=(n, 3))
    keys, pos = indexing.index_points(pos, ROOT_MIN, ROOT_MAX)
    order = indexing.sort_by_key(keys)
    return keys[order], pos[order]


# ---------------------------------------------------------------------------
# Scalar oracle: literal jump-partition
# ---------------------------------------------------------------------------


def scalar_jump_partition(items, pred):
    """Transcription of stable_partition_with_jumps: pred(cur, end) ->
    (selected_index, next_index); selected==next means nothing selected."""
    selected, unselected = [], []
    cur, end = 0, len(items)
    while cur < end:
        sel, nxt = pred(cur, end)
        assert nxt > cur
        if sel == nxt:
            unselected.extend(range(cur, nxt))
        else:
            unselected.extend(range(cur, sel))
            selected.append(sel)
            unselected.extend(range(sel + 1, nxt))
        cur = nxt
    return selected, unselected


def oracle_random_grid(keys, level):
    def pred(cur, end):
        cell = morton.truncate_to_level(keys[cur], level)
        nxt = cur + 1
        while nxt < end and morton.truncate_to_level(keys[nxt], level) <= cell:
            nxt += 1
        return cur, nxt

    return scalar_jump_partition(keys, pred)


def oracle_grid_center(keys, positions, level, root_min, root_max):
    def pred(cur, end):
        cell = morton.truncate_to_level(keys[cur], level)
        nxt = cur + 1
        while nxt < end and morton.truncate_to_level(keys[nxt], level) <= cell:
            nxt += 1
        mins, maxs = indexing.bounds_from_prefixes(
            np.array([cell], dtype=np.uint64), level + 1, root_min, root_max)
        center = mins[0] + (maxs[0] - mins[0]) / 2
        best, best_d = cur, math.inf
        for i in range(cur, nxt):
            d = float(np.sum((positions[i] - center) ** 2))
            if d < best_d:
                best, best_d = i, d
        return best, nxt

    return scalar_jump_partition(keys, pred)


def test_random_grid_matches_scalar_oracle(rng):
    keys, pos = make_sorted_points(rng, 5000)
    level = 3
    # Use internals directly at a fixed candidate level via a spacing that
    # maps to it: pick spacing so candidate_level == 3.
    strat = SamplingStrategy("RANDOM_GRID", max_points_per_node=100)
    root_extent_x = ROOT_MAX[0] - ROOT_MIN[0]
    # find spacing with candidate level == 3 at node_level -1... easier:
    # call with node_level such that candidate becomes 3.
    spacing_at_root = 8.0  # cand = floor(log2(64/ (8/2^(l+1)) )) - 1
    # node_level = 0 -> spacing_at_node = 2 -> cand = floor(log2(32))-1 = 4
    res = strat.sample(keys, pos, 0, 0, ROOT_MIN, ROOT_MAX, spacing_at_root,
                       SamplingBehaviour.AlwaysAdhereToMinSpacing)
    cand = sampling.candidate_level_in_octree(
        root_extent_x, sampling.spacing_at_node_level(spacing_at_root, 0))
    sel, unsel = oracle_random_grid(keys, cand)
    assert res.order is not None
    np.testing.assert_array_equal(res.order[:res.selected_count], sel)
    np.testing.assert_array_equal(res.order[res.selected_count:], unsel)


def test_grid_center_matches_scalar_oracle(rng):
    keys, pos = make_sorted_points(rng, 3000)
    strat = SamplingStrategy("GRID_CENTER", max_points_per_node=100)
    spacing_at_root = 8.0
    res = strat.sample(keys, pos, 0, 0, ROOT_MIN, ROOT_MAX, spacing_at_root,
                       SamplingBehaviour.AlwaysAdhereToMinSpacing)
    cand = sampling.candidate_level_in_octree(
        float(ROOT_MAX[0] - ROOT_MIN[0]),
        sampling.spacing_at_node_level(spacing_at_root, 0))
    sel, unsel = oracle_grid_center(keys, pos, cand, ROOT_MIN, ROOT_MAX)
    np.testing.assert_array_equal(res.order[:res.selected_count], sel)
    np.testing.assert_array_equal(res.order[res.selected_count:], unsel)


def test_take_all_below_max_points(rng):
    keys, pos = make_sorted_points(rng, 50)
    for name in ("RANDOM_GRID", "GRID_CENTER", "MIN_DISTANCE", "JITTERED",
                 "MIN_DISTANCE_FAST"):
        strat = SamplingStrategy(name, max_points_per_node=100)
        res = strat.sample(keys, pos, 0, 0, ROOT_MIN, ROOT_MAX, 8.0,
                           SamplingBehaviour.TakeAllWhenCountBelowMaxPoints)
        assert res.order is None and res.selected_count == 50


def test_random_grid_one_point_per_cell(rng):
    keys, pos = make_sorted_points(rng, 5000)
    strat = SamplingStrategy("RANDOM_GRID", max_points_per_node=10)
    res = strat.sample(keys, pos, 0, -1, ROOT_MIN, ROOT_MAX, 8.0,
                       SamplingBehaviour.AlwaysAdhereToMinSpacing)
    cand = sampling.candidate_level_in_octree(
        64.0, sampling.spacing_at_node_level(8.0, -1))
    sel_keys = keys[res.order[:res.selected_count]]
    cells = morton.truncate_to_level(sel_keys, cand)
    assert np.unique(cells).size == cells.size  # one point per cell
    # every occupied cell is represented
    assert np.unique(morton.truncate_to_level(keys, cand)).size == cells.size


def test_min_distance_property(rng):
    keys, pos = make_sorted_points(rng, 2000)
    strat = SamplingStrategy("MIN_DISTANCE", max_points_per_node=10)
    spacing_at_root = 8.0
    res = strat.sample(keys, pos, 0, -1, ROOT_MIN, ROOT_MAX, spacing_at_root,
                       SamplingBehaviour.AlwaysAdhereToMinSpacing)
    sel = pos[res.order[:res.selected_count]]
    # all selected pairwise >= spacing apart (float32-narrowed spacing)
    spacing = float(np.float32(spacing_at_root / 2 ** 0))
    d2 = np.sum((sel[:, None, :] - sel[None, :, :]) ** 2, axis=-1)
    np.fill_diagonal(d2, np.inf)
    assert d2.min() >= float(np.float32(spacing) * np.float32(spacing)) - 1e-9
    # greedy-in-order: first point always accepted
    assert res.order[0] == 0


def test_min_distance_rejected_points_are_near_accepted(rng):
    keys, pos = make_sorted_points(rng, 500)
    strat = SamplingStrategy("MIN_DISTANCE", max_points_per_node=10)
    res = strat.sample(keys, pos, 0, -1, ROOT_MIN, ROOT_MAX, 8.0,
                       SamplingBehaviour.AlwaysAdhereToMinSpacing)
    sel = pos[res.order[:res.selected_count]]
    rej = pos[res.order[res.selected_count:]]
    if rej.size:
        d2 = np.sum((rej[:, None, :] - sel[None, :, :]) ** 2, axis=-1)
        spacing_sq = float(np.float32(8.0) * np.float32(8.0))
        # every rejected point has an accepted point within spacing
        assert (d2.min(axis=1) < spacing_sq).all()


def test_jittered_selects_one_per_grid_cell(rng):
    keys, pos = make_sorted_points(rng, 8000)
    strat = SamplingStrategy("JITTERED", max_points_per_node=10)
    # node level -1, spacing 2 -> cell count = 64/2 = 32 cells -> levels 5
    res = strat.sample(keys, pos, 0, -1, ROOT_MIN, ROOT_MAX, 2.0,
                       SamplingBehaviour.AlwaysAdhereToMinSpacing)
    grid_level = -1 + 5
    cells = morton.truncate_to_level(keys, grid_level)
    sel_cells = morton.truncate_to_level(keys[res.order[:res.selected_count]],
                                         grid_level)
    assert np.unique(sel_cells).size == sel_cells.size
    assert np.unique(cells).size == sel_cells.size


def test_jittered_small_grid_raises(rng):
    keys, pos = make_sorted_points(rng, 200)
    strat = SamplingStrategy("JITTERED", max_points_per_node=10)
    with pytest.raises(RuntimeError, match="16x16"):
        strat.sample(keys, pos, 0, -1, ROOT_MIN, ROOT_MAX, 30.0,
                     SamplingBehaviour.AlwaysAdhereToMinSpacing)


def test_min_distance_fast_analyzes_every_nth(rng):
    keys, pos = make_sorted_points(rng, 1000)
    strat = SamplingStrategy("MIN_DISTANCE_FAST", max_points_per_node=10)
    res = strat.sample(keys, pos, 0, -1, ROOT_MIN, ROOT_MAX, 1.0,
                       SamplingBehaviour.AlwaysAdhereToMinSpacing)
    # density at root level (-1) = 0.25 -> only indices 0, 4, 8, ... eligible
    assert all(i % 4 == 0 for i in res.order[:res.selected_count])
    assert res.selected_count > 0


def test_required_morton_index_depth():
    strat_pd = SamplingStrategy("MIN_DISTANCE")
    assert sampling.required_morton_index_depth(strat_pd, 5, 64.0, 8.0) == 5
    strat_rg = SamplingStrategy("RANDOM_GRID")
    # spacing at level 5 = 8/2^6 = 0.125 ; cand = floor(log2(64/0.125))-1 = 8
    assert sampling.required_morton_index_depth(strat_rg, 5, 64.0, 8.0) == 8


def test_stability_of_partition(rng):
    """Both partitions preserve relative order (reference stability tests,
    TestAlgorithm.cpp:24-206)."""
    keys, pos = make_sorted_points(rng, 4000)
    for name in ("RANDOM_GRID", "GRID_CENTER", "MIN_DISTANCE"):
        strat = SamplingStrategy(name, max_points_per_node=10)
        res = strat.sample(keys, pos, 0, 0, ROOT_MIN, ROOT_MAX, 8.0,
                           SamplingBehaviour.AlwaysAdhereToMinSpacing)
        sel = res.order[:res.selected_count]
        unsel = res.order[res.selected_count:]
        assert (np.diff(sel) > 0).all()
        assert (np.diff(unsel) > 0).all()


def test_argmin_per_run_all_nan_degrades_to_empty():
    """All-NaN distance values (NaN positions) must yield an empty
    selection, not IndexError on first[0] (ADVICE r3)."""
    from schwarzwald_tpu.ops.sampling import _argmin_per_run

    values = np.full(6, np.nan)
    starts = np.array([0, 3])
    out = _argmin_per_run(values, starts)
    assert out.size == 0


# ---------------------------------------------------------------------------
# Native standalone argmin samplers vs the numpy twins (the oracle tests
# above already validate the native path at n >= 512; these pin the numpy
# twin to it bit-for-bit, including NaN-poisoned cells)
# ---------------------------------------------------------------------------


def _native_available():
    from schwarzwald_tpu import native
    return native.las_codec() is not None


def _run_both(strategy, keys, pos, node_level, spacing, monkeypatch):
    from schwarzwald_tpu import native
    strat = SamplingStrategy(strategy, max_points_per_node=10)
    res_native = strat.sample(keys, pos, 0, node_level, ROOT_MIN, ROOT_MAX,
                              spacing,
                              SamplingBehaviour.AlwaysAdhereToMinSpacing)
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(native, "las_codec", lambda: None)
        res_numpy = strat.sample(keys, pos, 0, node_level, ROOT_MIN,
                                 ROOT_MAX, spacing,
                                 SamplingBehaviour.AlwaysAdhereToMinSpacing)
    return res_native, res_numpy


@pytest.mark.skipif(not _native_available(), reason="no native lib")
@pytest.mark.parametrize("strategy,node_level,spacing", [
    ("GRID_CENTER", 0, 8.0),
    ("JITTERED", -1, 2.0),
])
def test_native_argmin_matches_numpy(rng, monkeypatch, strategy, node_level,
                                     spacing):
    keys, pos = make_sorted_points(rng, 9000)
    a, b = _run_both(strategy, keys, pos, node_level, spacing, monkeypatch)
    assert a.selected_count == b.selected_count
    np.testing.assert_array_equal(a.order, b.order)


@pytest.mark.skipif(not _native_available(), reason="no native lib")
@pytest.mark.parametrize("strategy,node_level,spacing", [
    ("GRID_CENTER", 0, 8.0),
    ("JITTERED", -1, 2.0),
])
def test_native_argmin_nan_parity(rng, monkeypatch, strategy, node_level,
                                  spacing):
    """A NaN position anywhere in a cell must select nothing from that cell
    in both implementations (numpy minimum.reduceat parity)."""
    keys, pos = make_sorted_points(rng, 9000)
    poison = rng.choice(keys.size, size=200, replace=False)
    pos[poison] = np.nan
    a, b = _run_both(strategy, keys, pos, node_level, spacing, monkeypatch)
    assert a.selected_count == b.selected_count
    np.testing.assert_array_equal(a.order, b.order)
    # and poisoning genuinely removed selections vs the clean cloud
    assert a.selected_count > 0
