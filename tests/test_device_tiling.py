"""Device level-synchronous octree selection vs the host tiling engine:
the single-jit sweep must reproduce the ACCURATE+RANDOM_GRID engine's node
assignment exactly (same nodes, same points per node, same order)."""
import numpy as np
import pytest

import schwarzwald_tpu  # noqa: F401
import jax.numpy as jnp

from schwarzwald_tpu.core import morton
from schwarzwald_tpu.core.aabb import AABB
from schwarzwald_tpu.core.pointbuffer import PointBuffer
from schwarzwald_tpu.io.memory import MemoryPersistence
from schwarzwald_tpu.ops import device_tiling, indexing
from schwarzwald_tpu.ops.sampling import SamplingStrategy
from schwarzwald_tpu.tiling import (TilerMetaParameters, TilingStrategy,
                                    make_tiling_algorithm)

BOUNDS = AABB([0.0] * 3, [64.0] * 3)


def engine_assignment(pos, spacing, max_points, max_depth=100):
    persistence = MemoryPersistence()
    meta = TilerMetaParameters(spacing_at_root=spacing, max_depth=max_depth,
                               max_points_per_node=max_points)
    algo = make_tiling_algorithm(TilingStrategy.Accurate,
                                 SamplingStrategy("RANDOM_GRID", max_points),
                                 persistence, meta)
    algo.process_batch(PointBuffer(pos.copy()), BOUNDS)
    return persistence


def device_assignment(pos, spacing, max_points, max_depth=100, on_cpu=None):
    import jax

    keys, _ = indexing.index_points(pos, BOUNDS.min, BOUNDS.max)
    order = indexing.sort_by_key(keys)
    skeys = keys[order]
    hi = (skeys >> np.uint64(32)).astype(np.uint32)
    lo = skeys.astype(np.uint32)
    cands = tuple(device_tiling.candidate_levels(64.0, spacing, max_depth))
    ctx = jax.default_device(on_cpu[0]) if on_cpu else _null()
    with ctx:
        levels = device_tiling.octree_select_random_grid(
            jnp.asarray(hi), jnp.asarray(lo), cands, max_points, max_depth)
    return skeys, order, np.asarray(levels)


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


@pytest.mark.parametrize("n,spacing,max_points", [
    (20000, 8.0, 300),
    (5000, 8.0, 100),
    (20000, 40.0, 50),   # coarse spacing: cand == -1 cases at the root
    (3000, 8.0, 10000),  # everything fits in the root (take-all at r)
])
def test_device_select_matches_engine(on_cpu, rng, n, spacing, max_points):
    pos = rng.uniform(BOUNDS.min, BOUNDS.max, size=(n, 3))
    persistence = engine_assignment(pos, spacing, max_points)
    skeys, order, levels = device_assignment(pos, spacing, max_points,
                                             on_cpu=on_cpu)
    assert (levels > 0).all(), "device sweep left points unassigned"

    # group device output by (level, node prefix) -> compare to engine
    got_nodes = {}
    for lv in np.unique(levels):
        node_level = int(lv) - 2
        mask = levels == lv
        if node_level == -1:
            got_nodes["r"] = np.flatnonzero(mask)
            continue
        prefixes = morton.truncate_to_level(skeys[mask], node_level)
        idx = np.flatnonzero(mask)
        starts = np.flatnonzero(np.diff(prefixes, prepend=prefixes[0] + 1)
                                .astype(bool))
        bounds_list = np.append(starts, idx.size)
        for s, e in zip(bounds_list[:-1], bounds_list[1:]):
            name = "r" + morton.node_name_simple(int(prefixes[s]),
                                                 node_level + 1)
            got_nodes[name] = idx[s:e]

    engine_names = set(persistence.node_names())
    assert set(got_nodes) == engine_names
    pos_sorted = pos[order]
    for name, idx in got_nodes.items():
        want = persistence.retrieve_points(name).positions
        np.testing.assert_array_equal(pos_sorted[idx], want, err_msg=name)


def test_device_select_max_depth(on_cpu, rng):
    pos = rng.uniform(BOUNDS.min, BOUNDS.max, size=(5000, 3))
    persistence = engine_assignment(pos, 8.0, 50, max_depth=3)
    skeys, order, levels = device_assignment(pos, 8.0, 50, max_depth=3,
                                             on_cpu=on_cpu)
    assert (levels > 0).all()
    assert levels.max() - 2 <= 3
    total_engine = sum(persistence.retrieve_points(n_).count
                       for n_ in persistence.node_names())
    assert total_engine == 5000 == (levels > 0).sum()


def test_device_grid_center_matches_engine(on_cpu, rng):
    import jax
    import jax.numpy as jnp

    n, spacing, max_points = 8000, 8.0, 200
    pos = rng.uniform(BOUNDS.min, BOUNDS.max, size=(n, 3))
    persistence = MemoryPersistence()
    meta = TilerMetaParameters(spacing_at_root=spacing,
                               max_points_per_node=max_points)
    algo = make_tiling_algorithm(TilingStrategy.Accurate,
                                 SamplingStrategy("GRID_CENTER", max_points),
                                 persistence, meta)
    algo.process_batch(PointBuffer(pos.copy()), BOUNDS)

    keys, cpos = indexing.index_points(pos.copy(), BOUNDS.min, BOUNDS.max)
    order = indexing.sort_by_key(keys)
    skeys, spos = keys[order], cpos[order]
    hi = (skeys >> np.uint64(32)).astype(np.uint32)
    lo = skeys.astype(np.uint32)
    cands = tuple(device_tiling.candidate_levels(64.0, spacing, 100))
    with jax.default_device(on_cpu[0]):
        levels = np.asarray(device_tiling.octree_select_grid(
            jnp.asarray(hi), jnp.asarray(lo), cands, max_points, 100,
            strategy="GRID_CENTER", positions=jnp.asarray(spos),
            root_min=jnp.asarray(BOUNDS.min),
            root_max=jnp.asarray(BOUNDS.max)))
    assert (levels > 0).all()

    for lv in np.unique(levels):
        node_level = int(lv) - 2
        mask = levels == lv
        if node_level == -1:
            want = persistence.retrieve_points("r").positions
            np.testing.assert_array_equal(spos[mask], want)
            continue
        prefixes = morton.truncate_to_level(skeys[mask], node_level)
        idx = np.flatnonzero(mask)
        starts = np.flatnonzero(np.diff(prefixes, prepend=prefixes[0] + 1)
                                .astype(bool))
        bounds_list = np.append(starts, idx.size)
        for s, e in zip(bounds_list[:-1], bounds_list[1:]):
            name = "r" + morton.node_name_simple(int(prefixes[s]),
                                                 node_level + 1)
            want = persistence.retrieve_points(name).positions
            np.testing.assert_array_equal(spos[idx[s:e]], want,
                                          err_msg=name)


def test_device_jittered_matches_engine(on_cpu, rng):
    import jax
    import jax.numpy as jnp

    n, spacing, max_points = 8000, 2.0, 100  # 64/2 = 32 cells at root
    pos = rng.uniform(BOUNDS.min, BOUNDS.max, size=(n, 3))
    persistence = MemoryPersistence()
    meta = TilerMetaParameters(spacing_at_root=spacing,
                               max_points_per_node=max_points)
    algo = make_tiling_algorithm(TilingStrategy.Accurate,
                                 SamplingStrategy("JITTERED", max_points),
                                 persistence, meta)
    algo.process_batch(PointBuffer(pos.copy()), BOUNDS)

    keys, cpos = indexing.index_points(pos.copy(), BOUNDS.min, BOUNDS.max)
    order = indexing.sort_by_key(keys)
    skeys, spos = keys[order], cpos[order]
    hi = (skeys >> np.uint64(32)).astype(np.uint32)
    lo = skeys.astype(np.uint32)
    cands = tuple(device_tiling.candidate_levels(64.0, spacing, 100))
    jcfgs = device_tiling.jittered_static_configs(64.0, spacing, 100)
    with jax.default_device(on_cpu[0]):
        levels = np.asarray(device_tiling.octree_select_grid(
            jnp.asarray(hi), jnp.asarray(lo), cands, max_points, 100,
            strategy="JITTERED", positions=jnp.asarray(spos),
            root_min=jnp.asarray(BOUNDS.min),
            root_max=jnp.asarray(BOUNDS.max), jit_cfgs=jcfgs))

    # device sweep may leave deep points unassigned (grid < 16 cells);
    # everything assigned must match the engine exactly
    for lv in np.unique(levels):
        if lv == 0:
            continue
        node_level = int(lv) - 2
        mask = levels == lv
        if node_level == -1:
            want = persistence.retrieve_points("r").positions
            np.testing.assert_array_equal(spos[mask], want)
            continue
        prefixes = morton.truncate_to_level(skeys[mask], node_level)
        idx = np.flatnonzero(mask)
        starts = np.flatnonzero(np.diff(prefixes, prepend=prefixes[0] + 1)
                                .astype(bool))
        bounds_list = np.append(starts, idx.size)
        for s, e in zip(bounds_list[:-1], bounds_list[1:]):
            name = "r" + morton.node_name_simple(int(prefixes[s]),
                                                 node_level + 1)
            # the sweep breaks BEFORE an unsupported level, so every
            # assigned node is complete: exact equality
            want = persistence.retrieve_points(name).positions
            np.testing.assert_array_equal(spos[idx[s:e]], want, err_msg=name)
    assert (levels > 0).sum() > 0.9 * n


@pytest.mark.parametrize("strategy", ["RANDOM_GRID", "GRID_CENTER"])
def test_engine_use_device_first_batch(on_cpu, rng, strategy):
    """meta.use_device routes the first ACCURATE batch through the device
    sweep; persisted nodes are identical to the host path."""
    pos = rng.uniform(BOUNDS.min, BOUNDS.max, size=(6000, 3))

    def run(use_device):
        persistence = MemoryPersistence()
        meta = TilerMetaParameters(spacing_at_root=8.0,
                                   max_points_per_node=200,
                                   use_device=use_device)
        algo = make_tiling_algorithm(TilingStrategy.Accurate,
                                     SamplingStrategy(strategy, 200),
                                     persistence, meta)
        algo.process_batch(PointBuffer(pos.copy()), BOUNDS)
        return persistence

    host = run(None)
    dev = run("cpu")
    assert set(host.node_names()) == set(dev.node_names())
    for name in host.node_names():
        np.testing.assert_array_equal(
            dev.retrieve_points(name).positions,
            host.retrieve_points(name).positions, err_msg=name)


def test_engine_use_device_second_batch_host(on_cpu, rng):
    """Later batches (cached merges) always use the host engine; totals
    conserve."""
    p1 = rng.uniform(BOUNDS.min, BOUNDS.max, size=(3000, 3))
    p2 = rng.uniform(BOUNDS.min, BOUNDS.max, size=(3000, 3))
    persistence = MemoryPersistence()
    meta = TilerMetaParameters(spacing_at_root=8.0, max_points_per_node=200,
                               use_device="cpu")
    algo = make_tiling_algorithm(TilingStrategy.Accurate,
                                 SamplingStrategy("RANDOM_GRID", 200),
                                 persistence, meta)
    algo.process_batch(PointBuffer(p1.copy()), BOUNDS)
    algo.process_batch(PointBuffer(p2.copy()), BOUNDS)
    total = sum(persistence.retrieve_points(n_).count
                for n_ in persistence.node_names())
    assert total == 6000


def test_fast_fresh_subtree_device_equals_host(rng, on_cpu):
    """FAST + use_device: batch-1 start nodes go through the device sweep
    (fresh subtrees), batch-2 revisits take the host merge path and new
    fresh nodes the device path — results must equal the pure host run
    node for node."""
    import numpy as np

    from schwarzwald_tpu.core.aabb import AABB
    from schwarzwald_tpu.core.pointbuffer import PointBuffer
    from schwarzwald_tpu.io.memory import MemoryPersistence
    from schwarzwald_tpu.ops.sampling import SamplingStrategy
    from schwarzwald_tpu.tiling import (TilerMetaParameters, TilingStrategy,
                                        make_tiling_algorithm)

    bounds = AABB([0.0] * 3, [64.0] * 3)
    # batch 1 fills the lower half; batch 2 revisits it AND opens fresh
    # start nodes in the upper half
    b1 = rng.uniform(0.0, 32.0, (5000, 3))
    b2 = rng.uniform(0.0, 64.0, (5000, 3))

    def run(use_device):
        persistence = MemoryPersistence()
        meta = TilerMetaParameters(spacing_at_root=6.0,
                                   max_points_per_node=300,
                                   concurrency=4, use_device=use_device)
        algo = make_tiling_algorithm(TilingStrategy.Fast,
                                     SamplingStrategy("RANDOM_GRID", 300),
                                     persistence, meta)
        algo.level_of_start_nodes = 3
        for pos in (b1, b2):
            algo.process_batch(PointBuffer(pos.copy()), bounds)
        algo.finalize(bounds)
        return persistence

    host = run(None)
    dev = run("cpu")
    assert set(host.node_names()) == set(dev.node_names())
    for name in host.node_names():
        np.testing.assert_array_equal(dev.retrieve_points(name).positions,
                                      host.retrieve_points(name).positions,
                                      err_msg=name)


def test_device_path_falls_back_on_rerooting_depths(on_cpu, rng):
    """A cluster forcing candidate levels past the 21-level Morton range
    makes the sweep leave points unassigned; the engine must silently
    fall back to the host path and still match the host run exactly —
    for the fresh first batch AND the revisit batch."""
    n = 3000
    center = np.array([10.0, 20.0, 30.0])
    batches = [center + rng.uniform(0, 1e-4, (n, 3)) for _ in range(2)]
    spacing = 64.0 / 2 ** 18  # re-root territory from level 3

    def run(device):
        meta = TilerMetaParameters(spacing_at_root=spacing,
                                   max_points_per_node=100, concurrency=4,
                                   use_device="cpu" if device else None)
        sink = MemoryPersistence()
        algo = make_tiling_algorithm(TilingStrategy.Accurate,
                                     SamplingStrategy("RANDOM_GRID", 100),
                                     sink, meta)
        for pos in batches:
            algo.process_batch(PointBuffer(pos.copy()), BOUNDS)
        algo.finalize(BOUNDS)
        return sink

    host_sink = run(False)
    dev_sink = run(True)
    assert set(host_sink.node_names()) == set(dev_sink.node_names())
    for name in host_sink.node_names():
        np.testing.assert_array_equal(
            dev_sink.retrieve_points(name).positions,
            host_sink.retrieve_points(name).positions, err_msg=name)


def test_fresh_sweep_pipelined_groups_equal_single_sweep(rng, on_cpu):
    """The pipelined fresh sweep (groups of ~N points dispatched async,
    persist overlapping compute) must produce the exact node set and
    contents of the single-concat sweep AND the pure host run — the
    per-group sweeps split only at start-node boundaries."""
    import numpy as np

    from schwarzwald_tpu.core.aabb import AABB
    from schwarzwald_tpu.core.pointbuffer import PointBuffer
    from schwarzwald_tpu.io.memory import MemoryPersistence
    from schwarzwald_tpu.ops.sampling import SamplingStrategy
    from schwarzwald_tpu.tiling import (TilerMetaParameters, TilingStrategy,
                                        make_tiling_algorithm)
    from schwarzwald_tpu.tiling import engine as engine_mod

    bounds = AABB([0.0] * 3, [64.0] * 3)
    pos = rng.uniform(0.0, 64.0, (12_000, 3))

    def run(use_device, group_points):
        persistence = MemoryPersistence()
        meta = TilerMetaParameters(spacing_at_root=6.0,
                                   max_points_per_node=300,
                                   concurrency=4, use_device=use_device)
        algo = make_tiling_algorithm(TilingStrategy.Fast,
                                     SamplingStrategy("RANDOM_GRID", 300),
                                     persistence, meta)
        algo.level_of_start_nodes = 2
        if group_points is not None:
            algo.DEVICE_SWEEP_GROUP_POINTS = group_points
        algo.process_batch(PointBuffer(pos.copy()), bounds)
        algo.finalize(bounds)
        return algo, persistence

    host_algo, host = run(None, None)
    single_algo, single = run("cpu", 10 ** 9)   # one group
    multi_algo, multi = run("cpu", 1_000)       # many pipelined groups
    assert multi_algo.device_sweeps_ok >= 3     # the pipeline really ran
    assert multi_algo.device_fallbacks == 0
    for dev in (single, multi):
        assert set(host.node_names()) == set(dev.node_names())
        for name in host.node_names():
            np.testing.assert_array_equal(
                dev.retrieve_points(name).positions,
                host.retrieve_points(name).positions, err_msg=name)


def test_hi_only_sweep_falls_back_cleanly_on_deep_trees(rng, on_cpu):
    """The fresh sweep uploads only the hi key word (4 B/pt); configs
    whose grids go past level 9 statically stop there and leave the rest
    unassigned — the engine must host-tile those groups and still match
    the pure host run exactly."""
    import numpy as np

    from schwarzwald_tpu.core.aabb import AABB
    from schwarzwald_tpu.core.pointbuffer import PointBuffer
    from schwarzwald_tpu.io.memory import MemoryPersistence
    from schwarzwald_tpu.ops.sampling import SamplingStrategy
    from schwarzwald_tpu.tiling import (TilerMetaParameters, TilingStrategy,
                                        make_tiling_algorithm)

    bounds = AABB([0.0] * 3, [64.0] * 3)
    # tiny spacing + tiny node capacity drives assignments deep past the
    # hi word's 10-level reach
    pos = rng.uniform(0.0, 4.0, (6000, 3))

    def run(use_device):
        persistence = MemoryPersistence()
        meta = TilerMetaParameters(spacing_at_root=0.05,
                                   max_points_per_node=50,
                                   concurrency=2, use_device=use_device)
        algo = make_tiling_algorithm(TilingStrategy.Fast,
                                     SamplingStrategy("RANDOM_GRID", 50),
                                     persistence, meta)
        algo.level_of_start_nodes = 3
        algo.process_batch(PointBuffer(pos.copy()), bounds)
        algo.finalize(bounds)
        return persistence

    host = run(None)
    dev = run("cpu")
    assert set(host.node_names()) == set(dev.node_names())
    for name in host.node_names():
        np.testing.assert_array_equal(dev.retrieve_points(name).positions,
                                      host.retrieve_points(name).positions,
                                      err_msg=name)


# ---------------------------------------------------------------------------
# While-loop RANDOM_GRID sweep: bit-identical to the unrolled program
# ---------------------------------------------------------------------------

def _sorted_words(rng, n, lo_extent=64.0, span=None):
    span = (0.0, lo_extent) if span is None else span
    pos = rng.uniform(span[0], span[1], (n, 3))
    keys, _ = indexing.index_points(pos, BOUNDS.min, BOUNDS.max)
    skeys = keys[indexing.sort_by_key(keys)]
    return ((skeys >> np.uint64(32)).astype(np.uint32),
            skeys.astype(np.uint32))


@pytest.mark.parametrize("case", [
    "fresh", "fresh_coarse", "fresh_takeall", "fast_level3", "padded",
    "hi_only", "terminal_depth3", "reroot",
])
def test_while_sweep_bit_identical_to_unrolled(on_cpu, rng, case):
    """octree_select_grid_while is a drop-in replacement for the
    statically-unrolled octree_select_grid(RANDOM_GRID): identical int8
    output (including 0 = unassigned host-fallback markers) on the same
    inputs, for fresh, padded, hi-only, FAST-start-level, terminal and
    re-root sweeps."""
    import jax.numpy as jnp

    n = 6000
    spacing, max_points, max_depth, minlv = 6.0, 200, 100, -1
    hi, lo = _sorted_words(rng, n)
    n_valid = None
    if case == "fresh_coarse":
        spacing, max_points = 40.0, 50       # cand == -1 at the root
    elif case == "fresh_takeall":
        max_points = 10 ** 6                  # take-all at the root
    elif case == "fast_level3":
        minlv = 3
    elif case == "padded":
        pad = 8192 - n
        hi = np.concatenate([hi, np.full(pad, 0xFFFFFFFF, np.uint32)])
        lo = np.concatenate([lo, np.full(pad, 0xFFFFFFFF, np.uint32)])
        n_valid = np.int32(n)
    elif case == "hi_only":
        lo = None
    elif case == "terminal_depth3":
        max_depth, max_points = 3, 50
    elif case == "reroot":
        hi, lo = _sorted_words(rng, 3000, span=(10.0, 10.0001))
        spacing, max_points = 64.0 / 2 ** 18, 100

    cands = tuple(device_tiling.candidate_levels(64.0, spacing, max_depth))
    kw = dict(cands=cands, max_points=max_points, max_depth=max_depth,
              min_node_level=minlv, n_valid=n_valid)
    hi_j = jnp.asarray(hi)
    lo_j = None if lo is None else jnp.asarray(lo)
    want = device_tiling.octree_select_grid(hi_j, lo_j,
                                            strategy="RANDOM_GRID", **kw)
    got = device_tiling.octree_select_grid_while(hi_j, lo_j,
                                                 strategy="RANDOM_GRID", **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                  err_msg=case)


def test_tiered_sweep_mode_matches_host_and_promotes(rng, on_cpu,
                                                     monkeypatch):
    """SCHWARZWALD_SWEEP_MODE=tiered serves early sweeps with the rolled
    (fast-compile) program and background-compiles the unrolled one; the
    tiled output must equal the host run regardless of which program
    served a given batch, and the per-process registry must eventually
    promote the signature to 'ready'."""
    import time

    from schwarzwald_tpu.core.aabb import AABB
    from schwarzwald_tpu.core.pointbuffer import PointBuffer
    from schwarzwald_tpu.io.memory import MemoryPersistence
    from schwarzwald_tpu.ops.sampling import SamplingStrategy
    from schwarzwald_tpu.tiling import (TilerMetaParameters, TilingStrategy,
                                        make_tiling_algorithm)
    from schwarzwald_tpu.tiling.engine import TilingAlgorithmBase

    monkeypatch.setenv("SCHWARZWALD_SWEEP_MODE", "tiered")
    TilingAlgorithmBase._tiered_state.clear()
    bounds = AABB([0.0] * 3, [64.0] * 3)
    pos = rng.uniform(0.0, 64.0, (6000, 3))

    def run(use_device, batches=2):
        persistence = MemoryPersistence()
        meta = TilerMetaParameters(spacing_at_root=4.0,
                                   max_points_per_node=200,
                                   concurrency=2, use_device=use_device)
        algo = make_tiling_algorithm(TilingStrategy.Accurate,
                                     SamplingStrategy("RANDOM_GRID", 200),
                                     persistence, meta)
        for b in range(batches):
            lo = b * pos.shape[0] // batches
            hi = (b + 1) * pos.shape[0] // batches
            algo.process_batch(PointBuffer(pos[lo:hi].copy()), bounds)
        algo.finalize(bounds)
        return persistence, algo

    monkeypatch.setenv("SCHWARZWALD_SWEEP_MODE", "")
    host, _ = run(None)
    monkeypatch.setenv("SCHWARZWALD_SWEEP_MODE", "tiered")
    dev, algo = run("cpu")
    assert algo.device_sweeps_ok > 0 and algo.device_fallbacks == 0
    assert set(host.node_names()) == set(dev.node_names())
    for name in host.node_names():
        np.testing.assert_array_equal(dev.retrieve_points(name).positions,
                                      host.retrieve_points(name).positions,
                                      err_msg=name)
    # the background compile of the tiny test program promotes quickly
    deadline = time.time() + 120
    while time.time() < deadline:
        if "ready" in TilingAlgorithmBase._tiered_state.values():
            break
        time.sleep(0.5)
    assert "ready" in TilingAlgorithmBase._tiered_state.values()


@pytest.mark.parametrize("strategy", ["GRID_CENTER", "JITTERED"])
@pytest.mark.parametrize("case", [
    "fresh", "fresh_takeall", "fast_level3", "padded", "terminal_depth3",
])
def test_while_sweep_positions_strategies_bit_identical(on_cpu, rng,
                                                        strategy, case):
    """octree_select_grid_while covers GRID_CENTER and JITTERED too:
    identical int8 output to the unrolled program on the same inputs (the
    traced-level geometry helpers perform the exact same FP operations in
    the same order, so the f64 distances are bit-identical on cpu)."""
    import jax.numpy as jnp

    n = 6000
    spacing, max_points, max_depth, minlv = 2.0, 100, 100, -1
    pos = rng.uniform(0.0, 64.0, (n, 3))
    keys, _ = indexing.index_points(pos, BOUNDS.min, BOUNDS.max)
    order = indexing.sort_by_key(keys)
    skeys, spos = keys[order], pos[order]
    n_valid = None
    if case == "fresh_takeall":
        max_points = 10 ** 6
    elif case == "fast_level3":
        minlv = 3
    elif case == "padded":
        pad = 8192 - n
        skeys = np.concatenate(
            [skeys, np.full(pad, np.uint64(0xFFFFFFFFFFFFFFFF))])
        spos = np.concatenate([spos, np.zeros((pad, 3))])
        n_valid = np.int32(n)
    elif case == "terminal_depth3":
        max_depth, max_points = 3, 50

    hi = (skeys >> np.uint64(32)).astype(np.uint32)
    lo = skeys.astype(np.uint32)
    cands = tuple(device_tiling.candidate_levels(64.0, spacing, max_depth))
    kw = dict(cands=cands, max_points=max_points, max_depth=max_depth,
              min_node_level=minlv, n_valid=n_valid,
              strategy=strategy, positions=jnp.asarray(spos),
              root_min=jnp.asarray(BOUNDS.min),
              root_max=jnp.asarray(BOUNDS.max))
    if strategy == "JITTERED":
        kw["jit_cfgs"] = device_tiling.jittered_static_configs(
            64.0, spacing, max_depth)
    hi_j, lo_j = jnp.asarray(hi), jnp.asarray(lo)
    want = device_tiling.octree_select_grid(hi_j, lo_j, **kw)
    got = device_tiling.octree_select_grid_while(hi_j, lo_j, **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                  err_msg=f"{strategy}/{case}")
