"""Tiling engine tests: an independent recursive oracle (single batch), the
conservation / structure / density invariants of the reference test suite
(TestTiler.cpp:85-476 semantics, resurrected hermetically via
MemoryPersistence), and FAST-strategy start-level + reconstruction checks."""
import numpy as np
import pytest

from schwarzwald_tpu.core import morton
from schwarzwald_tpu.core.aabb import AABB, octant_bounds
from schwarzwald_tpu.core.pointbuffer import PointBuffer
from schwarzwald_tpu.io.memory import MemoryPersistence
from schwarzwald_tpu.ops import indexing, sampling
from schwarzwald_tpu.ops.sampling import SamplingBehaviour, SamplingStrategy
from schwarzwald_tpu.tiling import (TilerMetaParameters, TilingStrategy,
                                    make_tiling_algorithm)

BOUNDS = AABB([0.0, 0.0, 0.0], [64.0, 64.0, 64.0])


def make_cloud(rng, n):
    pos = rng.uniform(BOUNDS.min, BOUNDS.max, size=(n, 3))
    return PointBuffer(pos)


def run_tiler(buffers, strategy=TilingStrategy.Fast, sampling_name="RANDOM_GRID",
              spacing=4.0, max_points=500, max_depth=100, concurrency=4):
    persistence = MemoryPersistence()
    meta = TilerMetaParameters(spacing_at_root=spacing, max_depth=max_depth,
                               max_points_per_node=max_points,
                               concurrency=concurrency)
    algo = make_tiling_algorithm(
        strategy, SamplingStrategy(sampling_name, max_points), persistence, meta)
    for buf in buffers:
        algo.process_batch(buf, BOUNDS)
    algo.finalize(BOUNDS)
    return persistence, algo


# ---------------------------------------------------------------------------
# Independent recursive oracle (single batch, ACCURATE, lossless persistence)
# ---------------------------------------------------------------------------


def oracle_tile_recursive(keys, positions, name, bounds, level, spacing_root,
                          max_points, strategy, out):
    """Plain recursion mirroring do_tiling_for_node for a fresh (no cached
    points) run: sample -> persist selected -> recurse children."""
    n = keys.size
    if n == 0:
        return
    max_level = 20
    root_extent_x = BOUNDS.extent()[0]
    sample_from = sampling.required_morton_index_depth(
        strategy, level, float(root_extent_x), spacing_root)
    requires_deeper = sample_from > level
    if (not requires_deeper and sample_from >= max_level) or \
            (requires_deeper and level >= max_level):
        out[name] = positions
        return
    res = strategy.sample(keys, positions, 0, level, BOUNDS.min, BOUNDS.max,
                          spacing_root,
                          SamplingBehaviour.TakeAllWhenCountBelowMaxPoints)
    if res.order is not None:
        keys = keys[res.order]
        positions = positions[res.order]
    out[name] = positions[:res.selected_count]
    rem_keys = keys[res.selected_count:]
    rem_pos = positions[res.selected_count:]
    if rem_keys.size == 0:
        return
    child_level = level + 1
    octants = morton.octant_at_level(rem_keys, child_level)
    for o in range(8):
        mask = octants == o
        if not mask.any():
            continue
        oracle_tile_recursive(rem_keys[mask], rem_pos[mask],
                              name + str(o), octant_bounds(o, bounds),
                              child_level, spacing_root, max_points,
                              strategy, out)


def test_accurate_single_batch_matches_recursive_oracle(rng):
    buf = make_cloud(rng, 6000)
    pos_copy = buf.positions.copy()
    persistence, _ = run_tiler([buf], strategy=TilingStrategy.Accurate,
                               sampling_name="RANDOM_GRID", spacing=8.0,
                               max_points=200)

    keys, pos = indexing.index_points(pos_copy, BOUNDS.min, BOUNDS.max)
    order = indexing.sort_by_key(keys)
    out = {}
    strategy = SamplingStrategy("RANDOM_GRID", 200)
    oracle_tile_recursive(keys[order], pos[order], "r", BOUNDS, -1, 8.0, 200,
                          strategy, out)
    oracle_names = {k for k, v in out.items() if len(v)}

    assert set(persistence.node_names()) == oracle_names
    for name in oracle_names:
        got = persistence.retrieve_points(name).positions
        np.testing.assert_array_equal(got, out[name])


# ---------------------------------------------------------------------------
# Invariants (multi-batch, FAST)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sampling_name", ["RANDOM_GRID", "GRID_CENTER",
                                           "MIN_DISTANCE"])
def test_conservation_across_batches(rng, sampling_name):
    n = 9000
    buf = make_cloud(rng, n)
    all_pos = buf.positions.copy()
    batches = [PointBuffer(all_pos[i * 3000:(i + 1) * 3000].copy())
               for i in range(3)]
    persistence, algo = run_tiler(batches, sampling_name=sampling_name,
                                  spacing=8.0, max_points=300)

    # Points above the start level are duplicated into reconstructed
    # ancestors (reconstruction samples FROM children without removing),
    # so conservation holds over the non-reconstructed part: every input
    # point appears exactly once across start-level-and-deeper nodes.
    names = persistence.node_names()
    deep = [n_ for n_ in names if len(n_) - 1 >= algo.level_of_start_nodes]
    collected = np.concatenate(
        [persistence.retrieve_points(n_).positions for n_ in deep])
    assert collected.shape[0] == n
    got = collected[np.lexsort(collected.T)]
    want = all_pos[np.lexsort(all_pos.T)]
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_fast_reconstructs_all_ancestors(rng):
    buf = make_cloud(rng, 9000)
    persistence, _ = run_tiler([buf], spacing=8.0, max_points=300)
    names = set(persistence.node_names())
    assert "r" in names
    for name in names:
        while len(name) > 1:
            name = name[:-1]
            assert name in names, f"missing ancestor {name}"


def test_nodes_contain_their_points(rng):
    buf = make_cloud(rng, 6000)
    persistence, _ = run_tiler([buf], spacing=8.0, max_points=300)
    for name in persistence.node_names():
        bounds = persistence.bounds_of(name)
        pts = persistence.retrieve_points(name).positions
        eps = 1e-9 * 64
        assert (pts >= bounds.min - eps).all() and (pts <= bounds.max + eps).all()


def test_is_sorted_basics():
    assert indexing.is_sorted(np.empty(0, dtype=np.uint64))
    assert indexing.is_sorted(np.array([7], dtype=np.uint64))
    assert indexing.is_sorted(np.array([1, 1, 2], dtype=np.uint64))
    assert not indexing.is_sorted(np.array([2, 1], dtype=np.uint64))
    assert not indexing.is_sorted(np.array([1, 3, 2, 4], dtype=np.uint64))


def test_reconstruct_sorts_out_of_order_lossy_children(rng, tmp_path):
    """The reconstruction sort-skip (indexing.is_sorted guard) must fall
    back to the full stable sort when a retrieved child's contents are NOT
    key-ordered — e.g. an output dir pre-populated by another tool, or a
    lossy re-read whose quantization genuinely reorders keys. Differential:
    a hand-written oracle twin of _reconstruct_single_node (always-sort)
    over the same lossy LAS persistence."""
    from schwarzwald_tpu.io.las_persistence import LASPersistence
    from schwarzwald_tpu.ops.sampling import SamplingBehaviour

    persistence = LASPersistence(str(tmp_path))
    # Two root children: r4's contents are deliberately UNSORTED by key.
    pos0 = rng.uniform([0.0, 0.0, 0.0], [32.0, 32.0, 32.0], size=(500, 3))
    pos4 = rng.uniform([32.0, 0.0, 0.0], [64.0, 32.0, 32.0], size=(500, 3))
    keys4, _ = indexing.index_points(pos4.copy(), BOUNDS.min, BOUNDS.max)
    assert not indexing.is_sorted(keys4[np.argsort(keys4)][::-1].copy())
    pos4 = pos4[np.argsort(keys4)][::-1]  # reverse key order
    persistence.persist_points(PointBuffer(pos0), octant_bounds(0, BOUNDS), "r0")
    persistence.persist_points(PointBuffer(pos4), octant_bounds(4, BOUNDS), "r4")

    meta = TilerMetaParameters(spacing_at_root=8.0, max_depth=100,
                               max_points_per_node=100, concurrency=1)
    strategy = SamplingStrategy("GRID_CENTER", 100)
    algo = make_tiling_algorithm(TilingStrategy.Fast, strategy, persistence,
                                 meta)
    algo.level_of_start_nodes = 1
    algo._start_nodes_used = {(0, 1), (4, 1)}
    algo.finalize(BOUNDS)

    # Oracle twin: retrieve children in octant order, concat, index from
    # root, FULL stable sort, sample AlwaysAdhere, keep the selected prefix.
    bufs = [persistence.retrieve_points(f"r{o}").positions for o in (0, 4)]
    data = np.concatenate([b for b in bufs if b.size])
    keys, clamped = indexing.index_points(data, BOUNDS.min, BOUNDS.max)
    order = np.argsort(keys, kind="stable")
    keys, clamped = keys[order], clamped[order]
    res = strategy.sample(keys, clamped, 0, -1, BOUNDS.min, BOUNDS.max, 8.0,
                          SamplingBehaviour.AlwaysAdhereToMinSpacing)
    want = res.apply(clamped)[:res.selected_count]
    # compare through the same lossy roundtrip the persisted root took
    want_q = persistence.simulate_retrieve(PointBuffer(want.copy()),
                                           BOUNDS).positions
    got = persistence.retrieve_points("r").positions
    np.testing.assert_array_equal(got, want_q)


def test_random_grid_density_bound(rng):
    """Interior nodes keep at most one point per candidate-level cell."""
    buf = make_cloud(rng, 9000)
    spacing = 8.0
    persistence, _ = run_tiler([buf], spacing=spacing, max_points=100)
    names = persistence.node_names()
    parents = {n_[:-1] for n_ in names if len(n_) > 1}
    for name in names:
        if name not in parents:
            continue  # leaves may hold take-all sets
        level = len(name) - 2  # 'r' prefix; root = -1
        pts = persistence.retrieve_points(name).positions
        keys, _ = indexing.index_points(pts, BOUNDS.min, BOUNDS.max)
        cand = sampling.candidate_level_in_octree(
            64.0, sampling.spacing_at_node_level(spacing, level))
        if cand < 0:
            continue
        cells = morton.truncate_to_level(keys, cand)
        assert np.unique(cells).size == cells.size, name


def test_multi_batch_revisit_keeps_density(rng):
    """Re-visited nodes merge cached points and re-sample (AlwaysAdhere)."""
    spacing = 8.0
    b1 = make_cloud(rng, 4000)
    b2 = make_cloud(rng, 4000)
    persistence, _ = run_tiler([b1, b2], spacing=spacing, max_points=300)
    # start nodes are at level >= 3: cells at candidate level must be unique
    for name in persistence.node_names():
        if len(name) - 1 != 3:
            continue
        level = len(name) - 2
        pts = persistence.retrieve_points(name).positions
        keys, _ = indexing.index_points(pts, BOUNDS.min, BOUNDS.max)
        cand = sampling.candidate_level_in_octree(
            64.0, sampling.spacing_at_node_level(spacing, level))
        cells = morton.truncate_to_level(keys, cand)
        assert np.unique(cells).size == cells.size


def test_start_level_estimation_small_batch():
    """Tiny first batches produce few large ranges -> default MAX_LEVEL=6."""
    rng = np.random.default_rng(1)
    buf = make_cloud(rng, 1000)
    persistence = MemoryPersistence()
    meta = TilerMetaParameters(spacing_at_root=8.0, max_points_per_node=100,
                               concurrency=4)
    algo = make_tiling_algorithm(TilingStrategy.Fast,
                                 SamplingStrategy("RANDOM_GRID", 100),
                                 persistence, meta)
    algo.process_batch(buf, BOUNDS)
    assert algo.level_of_start_nodes == 6


def test_start_level_estimation_large_uniform(rng):
    """A large uniform batch saturates level 1 (8 large ranges >= 100k)."""
    buf = make_cloud(rng, 1_000_000)
    persistence = MemoryPersistence()
    meta = TilerMetaParameters(spacing_at_root=8.0, max_points_per_node=20000,
                               concurrency=4)
    algo = make_tiling_algorithm(TilingStrategy.Fast,
                                 SamplingStrategy("RANDOM_GRID", 20000),
                                 persistence, meta)
    keys = algo.index_batch(buf, BOUNDS)
    order = indexing.sort_by_key(keys)
    level = algo._estimate_start_node_level(keys[order])
    assert level == 3  # max(0+1, MIN_LEVEL=3)


def test_terminal_node_takes_all(rng):
    """max_depth clamps the tree; deepest nodes persist everything."""
    buf = make_cloud(rng, 5000)
    persistence, _ = run_tiler([buf], spacing=8.0, max_points=50, max_depth=4,
                               strategy=TilingStrategy.Accurate)
    names = persistence.node_names()
    assert max(len(n_) - 1 for n_ in names) <= 4
    total = sum(persistence.retrieve_points(n_).count for n_ in names)
    assert total == 5000


def test_adaptive_strategy_v2(rng):
    """TilingAlgorithmV2 equivalent: adaptive start nodes per batch,
    ancestors reconstructed only where no tiled node exists."""
    b1 = make_cloud(rng, 5000)
    b2 = make_cloud(rng, 5000)
    persistence, algo = run_tiler([b1, b2], strategy=TilingStrategy.Adaptive,
                                  spacing=8.0, max_points=300, concurrency=4)
    names = set(persistence.node_names())
    assert "r" in names
    for name in names:
        while len(name) > 1:
            name = name[:-1]
            assert name in names, f"missing ancestor {name}"
    # conservation at-or-below start nodes: every input point persisted
    # exactly once there (reconstructed ancestors duplicate, but only at
    # nodes that were never genuinely tiled)
    start_names = {"r" + morton.node_name_simple(k, lv) if lv else "r"
                   for k, lv in algo._start_nodes_used}
    at_or_below = [n for n in names
                   if any(n.startswith(s) for s in start_names)]
    assert at_or_below
    total = sum(persistence.retrieve_points(n).count for n in at_or_below)
    assert total == 10000


def test_deep_tree_rerooting_conserves_points(rng):
    """Clustered points force candidate levels past the 21-level Morton
    capacity (re-rooting, TilingAlgorithms.cpp:444-483): the engine must
    re-derive keys below the node and keep every point exactly once."""
    n = 3000
    # all points inside one tiny cell so grid sampling recurses deep
    center = np.array([10.0, 20.0, 30.0])
    pos = center + rng.uniform(0, 1e-4, (n, 3))
    buf = PointBuffer(pos.copy())
    spacing = 64.0 / 2 ** 18  # cand(l) = 18 + l -> reroot from level 3
    persistence, _ = run_tiler([buf], strategy=TilingStrategy.Accurate,
                               sampling_name="RANDOM_GRID", spacing=spacing,
                               max_points=100)
    names = persistence.node_names()
    total = sum(persistence.retrieve_points(n_).count for n_ in names)
    assert total == n
    assert max(len(n_) - 1 for n_ in names) <= 20
    # deep nodes exist (recursion went past the re-root level)
    assert max(len(n_) - 1 for n_ in names) > 3
    got = np.concatenate([persistence.retrieve_points(n_).positions
                          for n_ in names])
    np.testing.assert_array_equal(got[np.lexsort(got.T)],
                                  pos[np.lexsort(pos.T)])


def test_multi_batch_rerooting(rng):
    """Re-rooted nodes re-read cached points across batches without losing
    or duplicating them."""
    center = np.array([10.0, 20.0, 30.0])
    spacing = 64.0 / 2 ** 18
    p1 = center + rng.uniform(0, 1e-4, (1500, 3))
    p2 = center + rng.uniform(0, 1e-4, (1500, 3))
    persistence, _ = run_tiler(
        [PointBuffer(p1.copy()), PointBuffer(p2.copy())],
        strategy=TilingStrategy.Accurate, sampling_name="RANDOM_GRID",
        spacing=spacing, max_points=100)
    names = persistence.node_names()
    total = sum(persistence.retrieve_points(n_).count for n_ in names)
    assert total == 3000


def test_spacing_too_small_raises(rng):
    from schwarzwald_tpu.core.metadata import DatasetMetadata
    from schwarzwald_tpu.process.tiler import Tiler

    meta_params = TilerMetaParameters(spacing_at_root=64.0 / 2 ** 22)
    md = DatasetMetadata()
    md.add_file_metadata("f", 10, BOUNDS)
    with pytest.raises(RuntimeError, match="spacing at root"):
        Tiler(md, meta_params, SamplingStrategy("RANDOM_GRID"), None,
              None, None, set())


@pytest.mark.parametrize("sampling",
                         ["RANDOM_GRID", "GRID_CENTER", "MIN_DISTANCE"])
def test_node_cache_identical_results(rng, sampling):
    """--cache-size node cache must not change any output: multi-batch runs
    with and without the cache produce identical node contents, while the
    cached run skips persistence re-reads. Covers the root-key memo
    (cache-resident buffers carry global-root Morton keys that finalize
    reconstruction reuses) for key-only and positions-dependent
    samplers."""
    batches_pos = [rng.uniform(BOUNDS.min, BOUNDS.max, (3000, 3))
                   for _ in range(3)]

    class CountingMemory(MemoryPersistence):
        retrievals = 0

        def retrieve_points(self, name):
            CountingMemory.retrievals += 1
            return super().retrieve_points(name)

    def run(cache_bytes):
        CountingMemory.retrievals = 0
        persistence = CountingMemory()
        meta = TilerMetaParameters(spacing_at_root=8.0,
                                   max_points_per_node=300,
                                   cache_size_bytes=cache_bytes,
                                   concurrency=4)
        algo = make_tiling_algorithm(TilingStrategy.Fast,
                                     SamplingStrategy(sampling, 300),
                                     persistence, meta)
        for pos in batches_pos:
            algo.process_batch(PointBuffer(pos.copy()), BOUNDS)
        algo.finalize(BOUNDS)
        return persistence, CountingMemory.retrievals

    plain, n_plain = run(0)
    cached, n_cached = run(512 << 20)
    assert set(plain.node_names()) == set(cached.node_names())
    for name in plain.node_names():
        np.testing.assert_array_equal(cached.retrieve_points(name).positions,
                                      plain.retrieve_points(name).positions,
                                      err_msg=name)
    assert n_cached < n_plain  # the cache actually absorbed re-reads


def test_accurate_broken_node_dump(tmp_path, rng):
    """The <1%-take forensic dump must work under ACCURATE too
    (_dump_broken_node lives on the base class; it used to be defined only
    on TilingAlgorithmFast and crashed with AttributeError)."""
    from schwarzwald_tpu.core.node import NodeStructure
    from schwarzwald_tpu.tiling.arena import PointArena
    from schwarzwald_tpu.util.config import configure

    configure(str(tmp_path), False)
    persistence = MemoryPersistence()
    meta = TilerMetaParameters(spacing_at_root=4.0, max_points_per_node=100,
                               concurrency=1)
    algo = make_tiling_algorithm(TilingStrategy.Accurate,
                                 SamplingStrategy("RANDOM_GRID", 100),
                                 persistence, meta)
    # 300 identical points at a deep node: the grid sampler takes 1 (<1%)
    n = 300
    buf = PointBuffer(np.tile(np.array([[1.0, 1.0, 1.0]]), (n, 1)))
    arena = PointArena()
    ids = arena.append(buf)
    keys = np.zeros(n, dtype=np.uint64)
    root = algo._make_root(BOUNDS)
    name = "r" + "0" * 17
    bounds = BOUNDS
    for _ in range(17):
        bounds = octant_bounds(0, bounds)
    node = NodeStructure(name=name, morton_key=0, bounds=bounds, level=16,
                         max_spacing=4.0 / 2 ** 17, max_depth=100)
    algo._tile_internal_node(arena, keys, ids, node, root, 0)
    assert (tmp_path / f"broken_{name}.txt").exists()


def test_fast_finalize_at_level_six(rng):
    """finalize at the estimator's MAX_LEVEL must reconstruct ancestors from
    the start nodes actually used (not probe 8**6 possible names)."""
    persistence = MemoryPersistence()
    meta = TilerMetaParameters(spacing_at_root=1.0, max_points_per_node=100,
                               concurrency=4)
    algo = make_tiling_algorithm(TilingStrategy.Fast,
                                 SamplingStrategy("RANDOM_GRID", 100),
                                 persistence, meta)
    algo.level_of_start_nodes = 6
    pos = rng.uniform(BOUNDS.min, BOUNDS.max, (4000, 3))
    algo.process_batch(PointBuffer(pos), BOUNDS)
    assert algo._start_nodes_used
    assert all(lv == 6 for _, lv in algo._start_nodes_used)
    algo.finalize(BOUNDS)
    # every ancestor level of every used start node now exists
    for key, lv in algo._start_nodes_used:
        while lv > 0:
            key >>= 3
            lv -= 1
            name = ("r" + morton.node_name_simple(key, lv)) if lv else "r"
            assert persistence.node_exists(name), name
    # point conservation: nodes at the start level and deeper hold all points
    deep = [n for n in persistence.node_names() if len(n) - 1 >= 6]
    total = sum(persistence.retrieve_points(n).count for n in deep)
    assert total == 4000


def test_accurate_device_path_gated_on_existing_output(rng):
    """--use-device + pre-populated output (resume): the device fast path
    must NOT run — it would overwrite previously persisted nodes with
    contents computed from the new batch alone."""
    persistence = MemoryPersistence()
    meta = TilerMetaParameters(spacing_at_root=8.0, max_points_per_node=300,
                               concurrency=1, use_device="cpu")
    algo = make_tiling_algorithm(TilingStrategy.Accurate,
                                 SamplingStrategy("RANDOM_GRID", 300),
                                 persistence, meta)
    # simulate a previous run's root node
    prior = PointBuffer(rng.uniform(BOUNDS.min, BOUNDS.max, (50, 3)))
    persistence.persist_points(prior, BOUNDS, "r")

    calls = []
    algo._device_batch = lambda *a, **k: calls.append(1) or True
    algo.process_batch(PointBuffer(
        rng.uniform(BOUNDS.min, BOUNDS.max, (2000, 3))), BOUNDS)
    assert not calls  # fell back to the host merge path
    # prior points were merged, not overwritten: r holds >= 50 positions
    assert persistence.retrieve_points("r").count >= 50


def test_rerooting_deviation_quantified(rng):
    """Quantifies the documented re-rooting deviation (module docstring of
    tiling/engine.py): when a deep node re-roots its Morton keys, the
    reference reads octant digits at the ABSOLUTE key level on re-derived
    keys (TilingAlgorithms.cpp:116-124 after :444-483) — i.e. meaningless
    bits — while this engine splits at the level relative to the new key
    root. This test measures how many points the two rules route
    differently on a deep cloud, so 'documented deviation' comes with a
    number instead of hand-waving."""
    from schwarzwald_tpu.ops import indexing as idx

    # a level-16 node's bounds containing a deep cluster
    node_level = 16
    node_extent = BOUNDS.extent() / (2.0 ** (node_level + 1))
    node_min = np.array([1.0, 1.0, 1.0])
    pos = node_min + rng.uniform(0, 1, (2000, 3)) * node_extent

    # re-rooting re-derives keys RELATIVE to the node
    # (TilingAlgorithms.cpp:444-483 / engine._tile_node)
    rel_keys = morton.encode(pos, node_min, node_extent)
    order = idx.sort_by_key(rel_keys)
    rel_keys = rel_keys[order]

    # our rule reads the child octant at the level relative to the new key
    # root (digit 0); the reference's code reads the ABSOLUTE child level
    # (digit 17) of the same re-derived keys
    ours = morton.octant_at_level(rel_keys, 0)
    reference_rule = morton.octant_at_level(rel_keys, node_level + 1)
    diverging = int(np.sum(ours != reference_rule))
    # the rules route most points to different children on a deep cloud
    # (7/8 expected by chance) — the deviation is real and large, which is
    # exactly why the engine documents fixing it rather than copying it
    assert diverging / rel_keys.size > 0.5


def test_reconstruct_keys_only_path(rng):
    """The RANDOM_GRID keys-only reconstruction (per-child indexing +
    selected-rows-only gather) is byte-identical to the generic
    concat-everything path, which is forced by making the strategy claim
    it needs positions."""
    batches_pos = [rng.uniform(BOUNDS.min, BOUNDS.max, (4000, 3))
                   for _ in range(2)]

    def run(force_generic):
        persistence = MemoryPersistence()
        strategy = SamplingStrategy("RANDOM_GRID", 250)
        if force_generic:
            strategy.needs_positions = lambda n, behaviour: True
        meta = TilerMetaParameters(spacing_at_root=8.0,
                                   max_points_per_node=250,
                                   cache_size_bytes=64 << 20)
        algo = make_tiling_algorithm(TilingStrategy.Fast, strategy,
                                     persistence, meta)
        for pos in batches_pos:
            algo.process_batch(PointBuffer(pos.copy()), BOUNDS)
        algo.finalize(BOUNDS)
        return persistence

    fast = run(False)
    oracle = run(True)
    assert set(fast.node_names()) == set(oracle.node_names())
    for name in oracle.node_names():
        np.testing.assert_array_equal(
            fast.retrieve_points(name).positions,
            oracle.retrieve_points(name).positions, err_msg=name)


@pytest.mark.parametrize("sampling", ["GRID_CENTER", "JITTERED",
                                      "MIN_DISTANCE"])
@pytest.mark.parametrize("lossy", [False, True])
def test_reconstruct_scratch_path_matches_generic(rng, sampling, lossy,
                                                  tmp_path):
    """The scratch reconstruction (positions clamped in a reused buffer,
    columns gathered for selected rows only) is byte-identical to the
    concat-everything generic path, for lossless and lossy (quantizing,
    attribute-carrying) sinks."""
    from schwarzwald_tpu.core.attributes import PointAttribute as A
    from schwarzwald_tpu.io.las_persistence import LASPersistence
    from schwarzwald_tpu.tiling.engine import TilingAlgorithmFast

    n = 6000
    pos = rng.uniform(BOUNDS.min, BOUNDS.max, (n, 3))
    rgb = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    intensity = rng.integers(0, 65536, n, dtype=np.uint16)

    def make_buf(sl):
        buf = PointBuffer(pos[sl].copy())
        buf.set_column(A.RGB, rgb[sl].copy())
        buf.set_column(A.Intensity, intensity[sl].copy())
        return buf

    def run(force_generic, out_dir):
        persistence = (LASPersistence(str(out_dir)) if lossy
                       else MemoryPersistence())
        # spacing 2.0 keeps every reconstruction level's jitter grid
        # >= 16^3 (JITTERED raises below that, matching the reference)
        meta = TilerMetaParameters(spacing_at_root=2.0,
                                   max_points_per_node=250,
                                   cache_size_bytes=64 << 20)
        algo = make_tiling_algorithm(TilingStrategy.Fast,
                                     SamplingStrategy(sampling, 250),
                                     persistence, meta)
        if force_generic:
            algo._reconstruct_node_scratch = \
                lambda *a, **k: False
        for sl in (slice(0, 3000), slice(3000, 6000)):
            if lossy:
                persistence.begin_batch()
            algo.process_batch(make_buf(sl), BOUNDS)
            if lossy:
                persistence.commit_batch()
        if lossy:
            persistence.begin_batch()
        algo.finalize(BOUNDS)
        if lossy:
            persistence.commit_batch()
        return persistence

    fast = run(False, tmp_path / "fast")
    oracle = run(True, tmp_path / "oracle")
    assert set(fast.node_names()) == set(oracle.node_names())
    for name in oracle.node_names():
        a = fast.retrieve_points(name)
        b = oracle.retrieve_points(name)
        np.testing.assert_array_equal(a.positions, b.positions,
                                      err_msg=name)
        assert set(a.columns) == set(b.columns)
        for attr in b.columns:
            np.testing.assert_array_equal(a.columns[attr], b.columns[attr],
                                          err_msg=f"{name}/{attr}")
