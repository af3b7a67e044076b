"""Device MIN_DISTANCE (Poisson-disk) parity tests — SURVEY hard-part #1.

The bounded-Morton-window relaxation (ops/device_poisson) must reproduce
the sequential greedy acceptance point for point. The oracle is the
scalar reference implementation (ops.sampling._poisson_accept_mask, exact
SparseGrid::add semantics, itself oracle-tested against the native C++
kernel in test_native.py). Parity runs on the cpu backend where f64 is
real; on TPU the emulated f64 can round ~0.004% of boundary distances
differently (documented divergence, ARCHITECTURE.md).
"""
import numpy as np
import pytest

from schwarzwald_tpu.core import morton
from schwarzwald_tpu.core.aabb import AABB
from schwarzwald_tpu.ops import indexing, sampling
from schwarzwald_tpu.ops.device_poisson import poisson_accept_mask_device

BOUNDS = AABB([0.0, 0.0, 0.0], [64.0, 64.0, 64.0])


def sorted_cloud(rng, n, lo=None, hi=None):
    lo = BOUNDS.min if lo is None else np.asarray(lo, float)
    hi = BOUNDS.max if hi is None else np.asarray(hi, float)
    pos = rng.uniform(lo, hi, (n, 3))
    keys, pos = indexing.index_points(pos, BOUNDS.min, BOUNDS.max)
    order = indexing.sort_by_key(keys)
    return keys[order], pos[order]


def oracle(positions, spacing, analyze=None):
    return sampling._poisson_accept_mask(positions, BOUNDS.min, BOUNDS.max,
                                         spacing, analyze)


@pytest.mark.parametrize("spacing,n", [
    (8.0, 5000),    # sparse: most points accepted
    (2.0, 20000),   # saturated: dense rejections, long dependency chains
    (0.5, 8000),    # deep cells
])
def test_device_matches_oracle(rng, on_cpu, spacing, n):
    keys, pos = sorted_cloud(rng, n)
    got = poisson_accept_mask_device(keys, pos, 64.0, spacing, backend="cpu")
    assert got is not None
    want = oracle(pos, spacing)
    np.testing.assert_array_equal(got, want)
    assert 0 < got.sum() < n  # the case actually exercises both outcomes


def test_device_matches_oracle_clustered(rng, on_cpu):
    """Tight clusters straddling cell boundaries: the worst case for a
    windowed neighborhood (neighbors in different Morton branches)."""
    centers = rng.uniform(1.0, 63.0, (40, 3))
    pos = np.concatenate([c + rng.normal(0, 0.8, (120, 3)) for c in centers])
    pos = np.clip(pos, 0.0, 64.0 - 1e-9)
    keys, pos = indexing.index_points(pos, BOUNDS.min, BOUNDS.max)
    order = indexing.sort_by_key(keys)
    keys, pos = keys[order], pos[order]
    # spacing small enough that max_seg isn't exceeded for these clusters
    got = poisson_accept_mask_device(keys, pos, 64.0, 0.6, backend="cpu")
    assert got is not None
    np.testing.assert_array_equal(got, oracle(pos, 0.6))


def test_device_analyze_mask_matches_oracle(rng, on_cpu):
    """MIN_DISTANCE_FAST: only every Nth point analyzed."""
    keys, pos = sorted_cloud(rng, 12000)
    analyze = np.zeros(12000, dtype=bool)
    analyze[::4] = True
    got = poisson_accept_mask_device(keys, pos, 64.0, 2.0, analyze,
                                     backend="cpu")
    assert got is not None
    np.testing.assert_array_equal(got, oracle(pos, 2.0, analyze))


def test_device_overflow_falls_back(rng, on_cpu):
    """Pathologically dense single cell -> None (host kernel handles it)."""
    pos = np.full((6000, 3), 10.0) + rng.normal(0, 1e-4, (6000, 3))
    keys, pos = indexing.index_points(pos, BOUNDS.min, BOUNDS.max)
    order = indexing.sort_by_key(keys)
    got = poisson_accept_mask_device(keys[order], pos[order], 64.0, 2.0,
                                     backend="cpu")
    assert got is None


def test_engine_min_distance_device_equals_host(rng, on_cpu):
    """ACCURATE + MIN_DISTANCE with use_device == pure host run."""
    from schwarzwald_tpu.core.pointbuffer import PointBuffer
    from schwarzwald_tpu.io.memory import MemoryPersistence
    from schwarzwald_tpu.ops.sampling import SamplingStrategy
    from schwarzwald_tpu.tiling import (TilerMetaParameters, TilingStrategy,
                                        make_tiling_algorithm)

    pos = rng.uniform(BOUNDS.min, BOUNDS.max, (20000, 3))

    def run(use_device):
        persistence = MemoryPersistence()
        meta = TilerMetaParameters(spacing_at_root=4.0,
                                   max_points_per_node=500,
                                   concurrency=4, use_device=use_device)
        algo = make_tiling_algorithm(TilingStrategy.Accurate,
                                     SamplingStrategy("MIN_DISTANCE", 500),
                                     persistence, meta)
        algo.process_batch(PointBuffer(pos.copy()), BOUNDS)
        algo.finalize(BOUNDS)
        return persistence

    host = run(None)
    dev = run("cpu")
    assert set(host.node_names()) == set(dev.node_names())
    for name in host.node_names():
        np.testing.assert_array_equal(dev.retrieve_points(name).positions,
                                      host.retrieve_points(name).positions,
                                      err_msg=name)
