import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import schwarzwald_tpu
from schwarzwald_tpu.core import morton
from schwarzwald_tpu.core.aabb import AABB
from schwarzwald_tpu.core.pointbuffer import PointBuffer
from schwarzwald_tpu.io.memory import MemoryPersistence
from schwarzwald_tpu.ops import indexing
from schwarzwald_tpu.ops.sampling import SamplingStrategy
from schwarzwald_tpu.tiling import (TilerMetaParameters, TilingStrategy,
                                    make_tiling_algorithm)
from schwarzwald_tpu import native

BOUNDS = AABB([0.0]*3, [64.0]*3)
lib = native._lib()
rng = np.random.default_rng(5)

for strat, spacing, max_points, max_depth in [
        ("MIN_DISTANCE", 8.0, 300, 100),
        ("MIN_DISTANCE", 4.0, 50, 100),
        ("MIN_DISTANCE", 8.0, 100000, 100),   # take-all at root
        ("MIN_DISTANCE", 4.0, 50, 3),          # terminal
        ("MIN_DISTANCE_FAST", 4.0, 100, 100),
        ("RANDOM_GRID", 8.0, 300, 100),
        ("RANDOM_GRID", 40.0, 50, 100),
]:
    n = 20000
    pos = rng.uniform(BOUNDS.min, BOUNDS.max, (n, 3))
    # host engine
    sink = MemoryPersistence()
    meta = TilerMetaParameters(spacing_at_root=spacing, max_depth=max_depth,
                               max_points_per_node=max_points)
    algo = make_tiling_algorithm(TilingStrategy.Accurate,
                                 SamplingStrategy(strat, max_points),
                                 sink, meta)
    algo.process_batch(PointBuffer(pos.copy()), BOUNDS)
    # native sweep
    keys, clamped = indexing.index_points(pos.copy(), BOUNDS.min, BOUNDS.max)
    skeys, order = indexing.sort_with_keys(keys)
    spos = clamped[order]
    from schwarzwald_tpu.ops import device_tiling
    cands = np.asarray(device_tiling.candidate_levels(64.0, spacing,
                                                      max_depth), np.int32)
    levels = lib.octree_sweep(skeys, None, spos, strat, -1, max_depth,
                              max_points, BOUNDS.min, BOUNDS.max, spacing,
                              cands)
    assert (levels > 0).all(), (strat, "unassigned points")
    got = {}
    for lv in np.unique(levels):
        node_level = int(lv) - 2
        mask = levels == lv
        idx = np.flatnonzero(mask)
        if node_level == -1:
            got["r"] = idx; continue
        prefixes = morton.truncate_to_level(skeys[mask], node_level)
        starts = indexing.run_starts(prefixes)
        ends = np.append(starts[1:], idx.size)
        for s, e in zip(starts, ends):
            name = "r" + morton.node_name_simple(int(prefixes[s]), node_level+1)
            got[name] = idx[s:e]
    assert set(got) == set(sink.node_names()), (
        strat, sorted(set(got) ^ set(sink.node_names()))[:8])
    for name, idx in got.items():
        want = sink.retrieve_points(name).positions
        np.testing.assert_array_equal(spos[idx], want, err_msg=f"{strat}:{name}")
    print(f"{strat} spacing={spacing} mp={max_points} depth={max_depth}: OK ({len(got)} nodes)")
