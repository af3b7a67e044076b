"""Host level-synchronous sweep (native octree_sweep) vs the per-node
recursion: the one-native-call-per-batch assignment must reproduce the
recursion byte-for-byte — node set, point content AND in-node order — for
fresh batches and out-of-core revisits, across the Poisson and grid
samplers. (The device-sweep twin of this battery is
tests/test_device_tiling.py.)"""
import numpy as np
import pytest

import schwarzwald_tpu  # noqa: F401
from schwarzwald_tpu import native
from schwarzwald_tpu.core.aabb import AABB
from schwarzwald_tpu.core.pointbuffer import PointBuffer
from schwarzwald_tpu.io.memory import MemoryPersistence
from schwarzwald_tpu.ops.sampling import SamplingStrategy
from schwarzwald_tpu.tiling import (TilerMetaParameters, TilingStrategy,
                                    make_tiling_algorithm)

BOUNDS = AABB([0.0] * 3, [64.0] * 3)

pytestmark = pytest.mark.skipif(
    native._lib() is None, reason="native library unavailable")


def _run(batches, strategy, sampling, meta, monkeypatch, sweep: bool,
         pin_level=None, finalize=True):
    monkeypatch.setenv("SCHWARZWALD_NO_HOST_SWEEP", "" if sweep else "1")
    sink = MemoryPersistence()
    algo = make_tiling_algorithm(
        strategy, SamplingStrategy(sampling, meta.max_points_per_node),
        sink, meta)
    if pin_level is not None:
        algo.level_of_start_nodes = pin_level
    # make every revisit qualify for the sweep
    algo.HOST_REVISIT_MIN_INCOMING = 1
    algo.HOST_REVISIT_MAX_CACHE_RATIO = 1e9
    for pos in batches:
        algo.process_batch(PointBuffer(pos.copy()), BOUNDS)
    if finalize:
        algo.finalize(BOUNDS)
    return sink, algo


def _assert_identical(host_sink, sweep_sink, label):
    assert set(host_sink.node_names()) == set(sweep_sink.node_names()), label
    for name in host_sink.node_names():
        np.testing.assert_array_equal(
            sweep_sink.retrieve_points(name).positions,
            host_sink.retrieve_points(name).positions,
            err_msg=f"{label}: node {name} differs (order or content)")


@pytest.mark.parametrize("sampling", ["MIN_DISTANCE", "MIN_DISTANCE_FAST",
                                      "RANDOM_GRID", "GRID_CENTER"])
@pytest.mark.parametrize("strategy", [TilingStrategy.Fast,
                                      TilingStrategy.Accurate])
def test_host_sweep_multi_batch_identical(rng, monkeypatch, strategy,
                                          sampling):
    """3 uniform batches: batch 1 runs the fresh sweep, batches 2-3 the
    revisit sweep — byte-identical to the recursion throughout."""
    batches = [rng.uniform(BOUNDS.min, BOUNDS.max, (9000, 3))
               for _ in range(3)]
    meta = TilerMetaParameters(spacing_at_root=6.0, max_points_per_node=200,
                               concurrency=4)
    pin = 3 if strategy is TilingStrategy.Fast else None
    host, _ = _run(batches, strategy, sampling, meta, monkeypatch,
                   sweep=False, pin_level=pin)
    swept, algo = _run(batches, strategy, sampling, meta, monkeypatch,
                       sweep=True, pin_level=pin)
    _assert_identical(host, swept, f"{strategy}/{sampling}")


@pytest.mark.parametrize("strategy", [TilingStrategy.Fast,
                                      TilingStrategy.Accurate])
def test_host_sweep_jittered_identical(rng, monkeypatch, strategy):
    """JITTERED needs root_extent/spacing >= 16 (16x16 minimum grid);
    permutation-table targets + argmin selection must match the
    recursion byte-for-byte across fresh and revisit batches."""
    batches = [rng.uniform(BOUNDS.min, BOUNDS.max, (9000, 3))
               for _ in range(3)]
    meta = TilerMetaParameters(spacing_at_root=3.0, max_points_per_node=200,
                               concurrency=4)
    pin = 2 if strategy is TilingStrategy.Fast else None
    host, _ = _run(batches, strategy, "JITTERED", meta, monkeypatch,
                   sweep=False, pin_level=pin)
    swept, _ = _run(batches, strategy, "JITTERED", meta, monkeypatch,
                    sweep=True, pin_level=pin)
    _assert_identical(host, swept, f"{strategy}/JITTERED")


def test_host_sweep_jittered_small_grid_raises_like_recursion(rng,
                                                              monkeypatch):
    """root_extent/spacing < 16: the recursion raises the reference's
    'Grids smaller than 16x16' error; the sweep must abort into the
    recursion and surface the SAME error, not silently mis-sample."""
    batches = [rng.uniform(BOUNDS.min, BOUNDS.max, (3000, 3))]
    meta = TilerMetaParameters(spacing_at_root=8.0,
                               max_points_per_node=100, concurrency=4)
    with pytest.raises(RuntimeError, match="16x16"):
        _run(batches, TilingStrategy.Accurate, "JITTERED", meta,
             monkeypatch, sweep=False)
    with pytest.raises(RuntimeError, match="16x16"):
        _run(batches, TilingStrategy.Accurate, "JITTERED", meta,
             monkeypatch, sweep=True)


def test_host_sweep_terminal_nodes(rng, monkeypatch):
    """max_depth forces terminal nodes whose persist order is a concat
    (incoming stream, then cached file order) — reproduced exactly."""
    batches = [rng.uniform(BOUNDS.min, BOUNDS.max, (6000, 3))
               for _ in range(3)]
    meta = TilerMetaParameters(spacing_at_root=4.0, max_points_per_node=50,
                               max_depth=5, concurrency=4)
    host, _ = _run(batches, TilingStrategy.Fast, "MIN_DISTANCE", meta,
                   monkeypatch, sweep=False, pin_level=3)
    swept, _ = _run(batches, TilingStrategy.Fast, "MIN_DISTANCE", meta,
                    monkeypatch, sweep=True, pin_level=3)
    _assert_identical(host, swept, "MIN_DISTANCE/terminal")


def test_host_sweep_take_all_and_sparse(rng, monkeypatch):
    """Tiny batches: take-all everywhere on batch 1 (no own cache), then
    AlwaysAdhere + untouched-node rules on the revisits."""
    batches = [rng.uniform(BOUNDS.min, BOUNDS.max, (700, 3))
               for _ in range(3)]
    meta = TilerMetaParameters(spacing_at_root=6.0,
                               max_points_per_node=20000, concurrency=4)
    host, _ = _run(batches, TilingStrategy.Accurate, "MIN_DISTANCE", meta,
                   monkeypatch, sweep=False)
    swept, _ = _run(batches, TilingStrategy.Accurate, "MIN_DISTANCE", meta,
                    monkeypatch, sweep=True)
    _assert_identical(host, swept, "MIN_DISTANCE/take-all")


def test_host_sweep_actually_ran(rng, monkeypatch):
    """Guard against silent fallback: the sweep path must genuinely handle
    the batches (fresh sweep + revisit sweep), not recurse."""
    from schwarzwald_tpu.tiling import engine as eng

    calls = {"fresh": 0, "revisit": 0}
    orig_levels = eng.TilingAlgorithmBase._host_sweep_levels
    orig_revisit = eng.TilingAlgorithmBase._host_revisit_start_nodes

    def spy_levels(self, *a, **kw):
        out = orig_levels(self, *a, **kw)
        if out is not None and kw.get("tiers") is None:
            calls["fresh"] += 1
        return out

    def spy_revisit(self, *a, **kw):
        handled = orig_revisit(self, *a, **kw)
        calls["revisit"] += len(handled)
        return handled

    monkeypatch.setattr(eng.TilingAlgorithmBase, "_host_sweep_levels",
                        spy_levels)
    monkeypatch.setattr(eng.TilingAlgorithmBase,
                        "_host_revisit_start_nodes", spy_revisit)
    batches = [rng.uniform(BOUNDS.min, BOUNDS.max, (9000, 3))
               for _ in range(2)]
    meta = TilerMetaParameters(spacing_at_root=6.0, max_points_per_node=200,
                               concurrency=4)
    _run(batches, TilingStrategy.Fast, "MIN_DISTANCE", meta, monkeypatch,
         sweep=True, pin_level=3)
    assert calls["fresh"] > 0 and calls["revisit"] > 0


def test_host_sweep_falls_back_on_rerooting_depths(rng, monkeypatch):
    """RANDOM_GRID at depths past the 21-level Morton range: the sweep
    leaves points unassigned and the engine must recurse instead — output
    identical to the pure recursion, and the sweep disables itself for
    the run instead of re-attempting every batch."""
    n = 3000
    center = np.array([10.0, 20.0, 30.0])
    batches = [center + rng.uniform(0, 1e-4, (n, 3)) for _ in range(2)]
    spacing = 64.0 / 2 ** 18
    meta = TilerMetaParameters(spacing_at_root=spacing,
                               max_points_per_node=100, concurrency=4)
    host, _ = _run(batches, TilingStrategy.Accurate, "RANDOM_GRID", meta,
                   monkeypatch, sweep=False)
    swept, algo = _run(batches, TilingStrategy.Accurate, "RANDOM_GRID",
                       meta, monkeypatch, sweep=True)
    _assert_identical(host, swept, "RANDOM_GRID/re-root")
    assert getattr(algo, "_host_sweep_broken", False)


def test_host_sweep_lossy_sink_quantized_reread(rng, monkeypatch, tmp_path):
    """LAS persistence quantizes positions; the revisit sweep must merge
    the QUANTIZED re-read (re-sorted keys) exactly like the recursion."""
    from schwarzwald_tpu.io.las_persistence import LASPersistence

    batches = [rng.uniform(BOUNDS.min, BOUNDS.max, (5000, 3))
               for _ in range(3)]
    meta = TilerMetaParameters(spacing_at_root=6.0, max_points_per_node=200,
                               concurrency=4)

    def run(sweep, sub):
        monkeypatch.setenv("SCHWARZWALD_NO_HOST_SWEEP",
                           "" if sweep else "1")
        sink = LASPersistence(str(tmp_path / sub))
        algo = make_tiling_algorithm(
            TilingStrategy.Fast,
            SamplingStrategy("MIN_DISTANCE", 200), sink, meta)
        algo.level_of_start_nodes = 3
        algo.HOST_REVISIT_MIN_INCOMING = 1
        algo.HOST_REVISIT_MAX_CACHE_RATIO = 1e9
        for pos in batches:
            algo.process_batch(PointBuffer(pos.copy()), BOUNDS)
        algo.finalize(BOUNDS)
        return sink

    host = run(False, "host")
    swept = run(True, "swept")
    assert set(host.node_names()) == set(swept.node_names())
    for name in host.node_names():
        np.testing.assert_array_equal(
            swept.retrieve_points(name).positions,
            host.retrieve_points(name).positions, err_msg=name)
